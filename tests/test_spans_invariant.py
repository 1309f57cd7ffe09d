# -*- coding: utf-8 -*-
"""Per-row invariant: span-sequence (kind, text, media_ref, order) is
preserved through every transform (BASELINE.json input_hint)."""

from conftest import SF_SMALL


def test_projection_preserves_spans(spark):
    from serbian_osm_lint_spark import synth
    from serbian_osm_lint_spark.operators.spans import canonical_spans, with_entity_projection

    docs = synth.docs_df(spark, SF_SMALL)
    before = {r.doc_id: r.span_seq for r in canonical_spans(docs).collect()}
    projected = with_entity_projection(docs).select("doc_id", "spans")
    after = {r.doc_id: r.span_seq for r in canonical_spans(projected).collect()}
    assert before == after
    assert len(before) > 0


def test_span_offsets_contiguous(spark):
    from pyspark.sql import functions as F

    from serbian_osm_lint_spark import synth

    docs = synth.docs_df(spark, SF_SMALL)
    bad = docs.select(
        F.filter(
            F.transform(
                F.array_sort(F.col("spans"), lambda a, b: a["offset"] - b["offset"]),
                lambda s, i: s["offset"] == i.cast("int"),
            ),
            lambda ok: ~ok,
        ).alias("bad")
    ).filter(F.size("bad") > 0)
    assert bad.count() == 0


def test_tags_roundtrip_matches_scalar_synth(spark):
    """spans → tags map must reproduce the scalar synthesis exactly
    (encode/decode is lossless for present tags, incl. empty strings)."""
    from pyspark.sql import functions as F

    from serbian_osm_lint_spark import synth
    from serbian_osm_lint_spark.operators.spans import with_entity_projection

    scal = synth.scalar_tags_df(spark, SF_SMALL)
    decoded = with_entity_projection(synth.docs_df(spark, SF_SMALL))
    got = {
        r.doc_id: (r.tags, round(r.lat, 9), round(r.lon, 9))
        for r in decoded.select("doc_id", "tags", "lat", "lon").collect()
    }
    for r in scal.collect():
        tags = {
            key: r[key]
            for key in synth.TAG_KEYS
            if r[key] is not None
        }
        assert got[r.doc_id][0] == tags, r.doc_id
        assert got[r.doc_id][1] == round(r.lat, 9)
        assert got[r.doc_id][2] == round(r.lon, 9)
