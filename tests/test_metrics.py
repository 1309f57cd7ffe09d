# -*- coding: utf-8 -*-
"""S9 run metrics: observe() counters collected with the action."""

from conftest import SF_SMALL


def test_observation_metrics(spark):
    from serbian_osm_lint_spark.plans import lint_pipeline

    df, obs = lint_pipeline.build_verdicts_with_metrics(spark, SF_SMALL)
    rows = df.collect()
    m = obs.get
    assert m["n_verdicts"] == len(rows)
    assert m["n_errors"] == sum(1 for r in rows if r.result == "CHECKED_ERROR")
    assert m["n_fixable"] == sum(1 for r in rows if r.fixable)
    assert m["approx_docs"] > 0
