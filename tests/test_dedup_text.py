# -*- coding: utf-8 -*-
"""Training-data operators: dedup finds the planted duplicates, simhash is
stable under small mutation, ANN-LSH recall vs brute force, media plumbing."""

import pytest

from conftest import SF_SMALL


def test_exact_dedup_finds_planted_copies(spark):
    from serbian_osm_lint_spark.operators import dedup

    rows = dedup.dedup_exact_df(spark, SF_SMALL).collect()
    dups = {r.doc_id: r.canonical_id for r in rows if r.is_dup}
    # every exact copy (doc_id%7==0, offset +1_000_000) dedups to its source
    assert len(dups) > 0
    for copy_id, canon in dups.items():
        assert copy_id >= 1000000
        assert canon == copy_id - 1000000


def test_minhash_finds_mutated_near_dups(spark):
    from serbian_osm_lint_spark.operators import dedup

    pairs = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in dedup.minhash_lsh_pairs_df(spark, SF_SMALL).collect()
    }
    assert len(pairs) > 0
    # mutated copies (one appended token) should be found with high jaccard
    mutated_found = [(a, b) for (a, b) in pairs if b == a + 2000000]
    assert len(mutated_found) > 0
    for a, b in mutated_found:
        assert pairs[(a, b)] > 0.8


def test_simhash_stability_under_mutation(spark):
    from serbian_osm_lint_spark.operators import dedup

    sig = {r.doc_id: r.simhash for r in dedup.simhash_df(spark, SF_SMALL).collect()}
    checked = 0
    for doc_id, s in sig.items():
        if doc_id < 2000000 and doc_id % 10 == 0 and (doc_id + 2000000) in sig:
            ham = bin((s ^ sig[doc_id + 2000000]) & ((1 << 64) - 1)).count("1")
            assert ham <= 12, (doc_id, ham)
            checked += 1
    assert checked > 0
    # exact copies hash identically
    for doc_id, s in sig.items():
        if doc_id < 1000000 and doc_id % 7 == 0 and (doc_id + 1000000) in sig:
            assert s == sig[doc_id + 1000000]


def test_ann_lsh_recall_vs_brute_force(spark):
    from serbian_osm_lint_spark.operators import similarity

    brute = {}
    for r in similarity.ann_cosine_topk_df(spark, SF_SMALL).collect():
        brute.setdefault(r.query_id, set()).add(r.neighbor_id)
    lsh = {}
    for r in similarity.ann_lsh_topk_df(spark, SF_SMALL).collect():
        lsh.setdefault(r.query_id, set()).add(r.neighbor_id)
    # LSH is approximate: every LSH hit shares the query's bucket; recall
    # must be nonzero overall and rankings must be internally consistent.
    overlap = sum(len(brute.get(q, set()) & s) for q, s in lsh.items())
    total = sum(len(s) for s in brute.values())
    assert total > 0
    assert overlap / total > 0.1


def test_ann_ivf_recall_vs_brute_force(spark):
    from serbian_osm_lint_spark.operators import similarity

    brute = {}
    for r in similarity.ann_cosine_topk_df(spark, SF_SMALL).collect():
        brute.setdefault(r.query_id, set()).add(r.neighbor_id)
    ivf = {}
    for r in similarity.ann_ivf_topk_df(spark, SF_SMALL).collect():
        ivf.setdefault(r.query_id, set()).add(r.neighbor_id)
    overlap = sum(len(brute.get(q, set()) & s) for q, s in ivf.items())
    total = sum(len(s) for s in brute.values())
    assert total > 0
    # multi-probe IVF should beat the single-bucket LSH recall floor
    assert overlap / total > 0.2


def test_media_feature_plumbing(spark):
    from serbian_osm_lint_spark import synth
    from serbian_osm_lint_spark.operators import media

    docs = synth.docs_df(spark, SF_SMALL)
    feats = media.extract_media_features_df(spark, docs).collect()
    n_docs = docs.count()
    assert len(feats) == n_docs  # one media span per doc in the corpus
    for r in feats[:20]:
        assert r.media_ref.startswith("img/")
        assert r.byte_len == len(r.media_ref.encode())
        assert 64 <= r.width < 256 and 64 <= r.height < 256
        feat = [getattr(r, f"feature_{j}") for j in range(media.FEATURE_DIM)]
        assert all(0.0 <= x <= 1.0 for x in feat)


def test_media_decode_stub_gates_real_path():
    from serbian_osm_lint_spark.operators import media

    with pytest.raises(NotImplementedError):
        media.try_real_decode(b"payload")


def test_text_profile_lang_and_tokens(spark):
    from pyspark.sql import functions as F

    from serbian_osm_lint_spark.functions import text as ftext

    df = spark.createDataFrame(
        [
            ("the cat and the dog is here",),
            ("der hund und die katze ist da",),
            ("Београд је град",),
            ("xyz qqq zzz",),
        ],
        "text string",
    )
    ws, bpe = ftext.token_count_cols(F.col("text"))
    rows = df.select(
        "text", ws, bpe, ftext.lang_id_col(F.col("text")).alias("lang")
    ).collect()
    assert rows[0].lang == "en" and rows[0].n_tokens_ws == 7
    assert rows[1].lang == "de"
    assert rows[2].lang == "sr"
    assert rows[3].lang == "unknown"
