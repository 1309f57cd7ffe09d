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
    """The composed shard pipeline rejects planted copies (dup gate) and
    planted two-token stubs (length gate), and keeps the originals."""
    from serbian_osm_lint_spark.operators import corpus

    rows = {r.doc_id: r for r in corpus.training_shard_df(spark, SF_SMALL).collect()}
    originals = [r for k, r in rows.items() if k < 1000000]
    copies = [r for k, r in rows.items() if 1000000 <= k < 3000000]
    shorts = [r for k, r in rows.items() if k >= 3000000]
    assert originals and copies and shorts
    assert all(not r.is_dup and r.keep for r in originals)
    assert any(r.is_dup for r in copies)  # copies dedup to their originals
    assert all(not r.keep for r in shorts if r.n_tokens_ws < corpus.MIN_TOKENS)
    assert all(r.split in ("train", "val", "test") for r in rows.values())


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
