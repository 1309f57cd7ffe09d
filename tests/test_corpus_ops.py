# -*- coding: utf-8 -*-
"""Corpus-prep ops: redaction actually scrubs the injected PII, and the
content-hash split is deterministic and ~80/10/10."""

from conftest import SF_SMALL


def test_pii_redaction_scrubs_injected(spark):
    from serbian_osm_lint_spark.operators import corpus

    rows = corpus.pii_redact_df(spark, SF_SMALL).collect()
    assert len(rows) > 0
    hit_email = hit_phone = 0
    for r in rows:
        assert "@example.com" not in r.clean_text
        if r.n_emails:
            hit_email += 1
            assert "[EMAIL]" in r.clean_text
        if r.n_phones:
            hit_phone += 1
            assert "[PHONE]" in r.clean_text
    assert hit_email > 0 and hit_phone > 0


def test_training_shard_keep_gate(spark):
    """The composed shard pipeline rejects planted exact copies (dup
    gate), planted MUTATED copies (near-dup component gate — r4 verdict
    item 2) and planted two-token stubs (length gate), and keeps the
    originals."""
    from serbian_osm_lint_spark.operators import corpus

    rows = {r.doc_id: r for r in corpus.training_shard_df(spark, SF_SMALL).collect()}
    originals = [r for k, r in rows.items() if k < 1000000]
    copies = [r for k, r in rows.items() if 1000000 <= k < 2000000]
    mutated = [r for k, r in rows.items() if 2000000 <= k < 3000000]
    shorts = [r for k, r in rows.items() if k >= 3000000]
    assert originals and copies and mutated and shorts
    assert all(not r.is_dup for r in originals)
    # originals outside any near-dup component are kept; the driver corpus
    # HAS natural near-dups among originals (template-generated texts with
    # jaccard >= 0.5) and those correctly keep only the canonical member
    assert all(r.keep for r in originals if not r.is_near_dup)
    assert any(r.keep for r in originals)
    assert all(r.is_dup for r in copies)  # exact copies dedup to originals
    # mutated copies are NOT exact dups — only the near-dup gate rejects them
    assert all(not r.is_dup for r in mutated)
    assert all(r.is_near_dup and not r.keep for r in mutated)
    # a source is canonical (kept) unless it is itself a natural near-dup
    # of a smaller original; at least some sources must survive
    kept_sources = [
        r for r in mutated if rows[r.doc_id - 2000000].keep
    ]
    assert kept_sources
    for r in mutated:
        src = rows[r.doc_id - 2000000]
        assert src.keep or src.is_near_dup, src
    assert all(not r.keep for r in shorts if r.n_tokens_ws < corpus.MIN_TOKENS)
    assert all(r.split in ("train", "val", "test") for r in rows.values())
    # ADVICE r5: LSH pairs run over fp-canonical reps only, so the
    # identical-stub group is ONE rep (no m-clique): stubs are exact
    # dups of the first stub, not a near-dup component, and every stub
    # is still rejected (dup gate or length gate)
    assert all(not r.is_near_dup for r in shorts)
    assert sum(not r.is_dup for r in shorts) == 1
    assert all(not r.keep for r in shorts)


def test_corpus_split_deterministic_and_proportional(spark):
    from serbian_osm_lint_spark.operators import corpus

    a = {r.doc_id: r.split for r in corpus.corpus_split_df(spark, SF_SMALL).collect()}
    b = {r.doc_id: r.split for r in corpus.corpus_split_df(spark, SF_SMALL).collect()}
    assert a == b  # no RNG anywhere
    n = len(a)
    frac_train = sum(1 for s in a.values() if s == "train") / n
    assert 0.7 < frac_train < 0.9
    assert set(a.values()) <= {"train", "val", "test"}


def test_repetition_ratio(spark):
    """Duplicate word-3-gram fraction: 0 for unique text and short docs,
    high for looped boilerplate; cross-engine equal on crafted cases."""
    import duckdb

    from pyspark.sql import functions as F

    from serbian_osm_lint_spark.functions import text as ftext

    cases = [
        ("unique words only here now",),         # 3 grams, all distinct -> 0
        ("spam ham spam ham spam ham spam ham",),  # heavy repetition
        ("two words",),                          # < 3 tokens -> 0
        ("",),
        ("Spam HAM spam ham SPAM ham spam ham",),  # case-folded == case above
    ]
    df = spark.createDataFrame(cases, "text string")
    got = [
        r.rep_3gram_ratio
        for r in df.select(ftext.repetition_cols(F.col("text"))).collect()
    ]
    assert got[0] == 0.0 and got[2] == 0.0 and got[3] == 0.0
    assert got[1] > 0.5
    assert got[4] == got[1]

    con = duckdb.connect()
    con.execute("CREATE TABLE t(text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", cases)
    du = [
        r[0]
        for r in con.execute(
            f"SELECT {ftext.sql_repetition('text')} FROM t"
        ).fetchall()
    ]
    con.close()
    assert [round(float(x), 6) for x in du] == [round(float(x), 6) for x in got]


def test_vocab_topk_stats(spark):
    """r5 vocabulary pass: rank is total over (tf desc, token), df <= tf,
    df bounded by the corpus size, and the tokenizer is the shared
    WS_SPLIT_RE contract (no empty tokens)."""
    from serbian_osm_lint_spark.operators import corpus

    rows = corpus.vocab_topk_df(spark, SF_SMALL, k=50).collect()
    # the synthetic doc corpus has a small fixed template vocabulary
    # (~31 tokens), so top-50 returns the whole vocab
    assert 0 < len(rows) <= 50
    n_docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    tfs = [r.tf for r in rows]
    assert tfs == sorted(tfs, reverse=True)
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r.token != ""
        assert 1 <= r.df <= r.tf
        assert r.df <= n_docs


def test_decontamination_flags_planted_13gram_leak(spark):
    """VERDICT r4 item 1: a train doc containing a test doc's 13-gram
    verbatim is flagged; clean train docs are not; short docs cannot
    leak (no 13-gram exists)."""
    from pyspark.sql import functions as F

    from serbian_osm_lint_spark.operators import corpus

    base = " ".join(f"w{i}" for i in range(13))  # exactly one 13-gram
    rows = [
        (1, "prefix tokens here then " + base + " and a suffix", "train"),  # leaked
        (2, " ".join(f"clean{i}" for i in range(20)), "train"),             # clean
        (3, base, "test"),                                                  # the source
        (4, "short doc " + base[:20], "train"),                             # <13 tokens
        (5, base + " trailing", "val"),                                     # holdout twin
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, split string")
    out = {r.doc_id: r for r in corpus.decontaminate_from(docs).collect()}
    assert set(out) == {1, 2, 4}  # one row per TRAIN doc only
    assert out[1].is_contaminated and out[1].n_contaminated_grams >= 1
    assert not out[2].is_contaminated and out[2].n_contaminated_grams == 0
    assert not out[4].is_contaminated  # too short to contain any 13-gram


def test_decontamination_corpus_has_live_positives(spark):
    """The planted-copy corpus yields contaminated train docs at driver
    scale, and every flagged doc really shares a 13-gram cross-split."""
    from serbian_osm_lint_spark.operators import corpus

    out = corpus.decontaminate_df(spark, SF_SMALL).collect()
    flagged = [r for r in out if r.is_contaminated]
    clean = [r for r in out if not r.is_contaminated]
    assert len(flagged) > 0 and len(clean) > 0
    # a plant and its source are verbatim copies: whenever they straddle
    # the train/holdout boundary AND are long enough to carry a 13-gram,
    # the train-side one must be flagged
    import hashlib
    import re

    from serbian_osm_lint_spark.functions.text import WS_SPLIT_RE
    from serbian_osm_lint_spark.operators.corpus import N_CONTAM_GRAM, TRAIN_PCT

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()
    ntok = {r.doc_id: len(re.split(WS_SPLIT_RE, r.text.strip())) for r in docs}

    def bucket(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100

    checked = 0
    for r in out:
        if r.doc_id >= 4000000:  # a plant that landed in train
            src = r.doc_id - 4000000
            if bucket(src) >= TRAIN_PCT and ntok[src] >= N_CONTAM_GRAM:
                assert r.is_contaminated, r
                checked += 1
    assert checked > 0
