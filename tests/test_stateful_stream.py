# -*- coding: utf-8 -*-
"""applyInPandasWithState sessionization: state must carry sessions across
micro-batches (two file arrivals), final counts equal the batch face."""

import os

from conftest import SF_SMALL


def test_stateful_sessionize_across_batches(spark, tmp_path):
    from pyspark.sql import functions as F

    from serbian_osm_lint_spark.operators import events
    from serbian_osm_lint_spark.streaming import stateful

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    cutoff = "2024-01-15"
    src = str(tmp_path / "events")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # arrival 1: first half of the month
    ev.filter(F.col("ts") < cutoff).write.mode("append").parquet(src)
    n1 = stateful.stream_sessionize(spark, src, out, ckpt)
    assert n1 >= 1

    # arrival 2: the rest — state must continue, not restart, sessions
    ev.filter(F.col("ts") >= cutoff).write.mode("append").parquet(src)
    n2 = stateful.stream_sessionize(spark, src, out, ckpt)
    assert n2 >= 1

    streamed = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in stateful.read_latest(spark, out).collect()
    }
    batch = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in events.sessionize_df(spark, SF_SMALL).collect()
    }
    assert streamed == batch
