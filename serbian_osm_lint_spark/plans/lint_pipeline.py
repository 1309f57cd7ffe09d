# -*- coding: utf-8 -*-
"""End-to-end lint pipeline assembly (the reference's ``src/main.py``
lifecycle as one lazy DataFrame DAG: scan → project → check-select →
aggregate; SURVEY §3.1)."""

from __future__ import annotations

from .. import synth
from ..operators import checks
from ..sources import catalog


def build_verdicts(spark, sf_dir: str):
    """stored docs + dims + checks → long verdict table (lazy scan-based)."""
    docs = catalog.docs_table(spark, sf_dir)
    wiki, wd = catalog.dims_tables(spark, sf_dir)
    return checks.lint_verdicts_df(spark, docs, wiki, wd)


def sql_verdicts() -> str:
    return checks.sql_lint_verdicts(
        synth.sql_scalar_tags(), synth.sql_wiki_pages(), synth.sql_wikidata_items()
    )


def build_verdicts_with_metrics(spark, sf_dir: str):
    """S9: run metrics via ``observe()`` — the Spark-native replacement for
    the reference's every-100k progress counter (``src/sources/
    osm_source.py:28-30``): zero-cost accumulator-style counters collected
    with the action. Returns (df, observation); read
    ``observation.get`` after an action."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation("lint_metrics")
    v = build_verdicts(spark, sf_dir)
    v = v.observe(
        obs,
        F.count(F.lit(1)).alias("n_verdicts"),
        F.sum((F.col("result") == "CHECKED_ERROR").cast("long")).alias("n_errors"),
        F.sum((F.col("fixable")).cast("long")).alias("n_fixable"),
        F.approx_count_distinct("doc_id").alias("approx_docs"),
    )
    return v, obs
