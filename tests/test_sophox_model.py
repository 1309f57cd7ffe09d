# -*- coding: utf-8 -*-
"""C13 suggestion/metadata model: the #defaultView:Editor header parses
into a typed struct, positional tag_N/val_N families become the
suggestions array with RDF-boolean-false ⇒ delete, and the per-row
stop-at-first-missing-tag contract holds (reference
src/sources/sophox_source.py:29-44, src/checks.py:730-780)."""

from conftest import SF_SMALL


def test_metadata_header_parses_to_struct(spark):
    from pyspark.sql import functions as F

    from serbian_osm_lint_spark.operators import queries as q29

    row = (
        spark.range(1)
        .select(q29.metadata_col(F.lit(q29.MULTI_SUGGESTION_QUERY)).alias("metadata"))
        .collect()[0]
    )
    assert row.metadata.comment == q29.MULTI_SUGGESTION_COMMENT
    assert row.metadata.check_description == q29.MULTI_SUGGESTION_DESC
    assert row.metadata.vote is False


def test_suggestions_boolean_false_is_delete_and_gap_stops(spark):
    from pyspark.sql import functions as F

    from serbian_osm_lint_spark.operators import queries as q29

    df = spark.createDataFrame(
        [
            # (tag_1, val_1, dt_1, tag_2, val_2, dt_2)
            ("a", "x", q29.XSD_STRING, "b", "false", q29.XSD_BOOLEAN),  # add + delete
            ("a", "false", q29.XSD_STRING, None, None, None),  # literal 'false' string ≠ delete
            (None, None, None, "b", "y", q29.XSD_STRING),  # gap at 1 ⇒ NO suggestions
        ],
        "tag_1 string, val_1 string, dt_1 string, tag_2 string, val_2 string, dt_2 string",
    )
    out = df.select(
        q29.suggestions_col(
            [
                (F.col("tag_1"), F.col("val_1"), F.col("dt_1")),
                (F.col("tag_2"), F.col("val_2"), F.col("dt_2")),
            ]
        ).alias("s")
    ).collect()
    s0 = out[0].s
    assert [x.tag for x in s0] == ["a", "b"]
    assert s0[0].is_delete is False and s0[0].val == "x"
    assert s0[1].is_delete is True and s0[1].val is None  # RDF false ⇒ delete
    s1 = out[1].s
    assert len(s1) == 1 and s1[0].val == "false" and s1[0].is_delete is False
    assert out[2].s == []  # positional stop at the first missing tag_N


def test_multi_suggestion_pipeline_shapes(spark):
    from serbian_osm_lint_spark.operators import queries as q29
    from serbian_osm_lint_spark.sources import catalog

    docs = catalog.docs_table(spark, SF_SMALL)
    rows = q29.multi_suggestion_df(spark, docs).collect()
    assert len(rows) > 0
    two_sugg = [r for r in rows if len(r.suggestions) == 2]
    one_sugg = [r for r in rows if len(r.suggestions) == 1]
    assert two_sugg and one_sugg  # both arities live in the corpus
    for r in rows:
        assert r.metadata.vote is False
        assert r.suggestions[0].tag == "name:sr-Latn"
        assert r.suggestions[0].is_delete is False
        assert r.message == q29.MULTI_SUGGESTION_DESC.replace(
            "{0}", r.name if r.name is not None else r.doc_id[1:]
        )
        if len(r.suggestions) == 2:
            s = r.suggestions[1]
            assert s.tag == "int_name" and s.is_delete is True and s.val is None


def test_multi_suggestion_auto_applicable_from_vote(spark):
    """VERDICT r2 item 6: vote=false in the query metadata means the
    suggestions need no community vote -> auto_applicable=true."""
    from serbian_osm_lint_spark.operators import queries as q29
    from serbian_osm_lint_spark.sources import catalog

    docs = catalog.docs_table(spark, SF_SMALL)
    rows = q29.multi_suggestion_df(spark, docs).select(
        "auto_applicable", "metadata"
    ).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.auto_applicable is (not r.metadata.vote)
