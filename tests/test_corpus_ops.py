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


def test_corpus_split_deterministic_and_proportional(spark):
    from serbian_osm_lint_spark.operators import corpus

    a = {r.doc_id: r.split for r in corpus.corpus_split_df(spark, SF_SMALL).collect()}
    b = {r.doc_id: r.split for r in corpus.corpus_split_df(spark, SF_SMALL).collect()}
    assert a == b  # no RNG anywhere
    n = len(a)
    frac_train = sum(1 for s in a.values() if s == "train") / n
    assert 0.7 < frac_train < 0.9
    assert set(a.values()) <= {"train", "val", "test"}
