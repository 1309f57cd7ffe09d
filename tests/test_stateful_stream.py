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


def test_stateful_asof_join_across_batches(spark, tmp_path):
    """VERDICT r4 item 7: the streaming as-of face must equal the batch
    window-merge exactly when arrivals are event-time ordered — including
    a left event in arrival 2 whose as-of right event arrived in batch 1
    (the cross-batch state carry)."""
    import os

    from pyspark.sql import functions as F

    from serbian_osm_lint_spark.operators import events
    from serbian_osm_lint_spark.streaming import stateful

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    cutoff = "2024-01-15"
    src = str(tmp_path / "events")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # one file per arrival: each invocation is one time-ordered micro-batch
    ev.filter(F.col("ts") < cutoff).coalesce(1).write.mode("append").parquet(src)
    assert stateful.stream_asof_join(spark, src, out, ckpt) >= 1
    ev.filter(F.col("ts") >= cutoff).coalesce(1).write.mode("append").parquet(src)
    assert stateful.stream_asof_join(spark, src, out, ckpt) >= 1

    streamed = {
        r.event_id: (r.user_id, r.ts_us, r.value, r.asof_event_id, r.asof_ts_us, r.asof_value)
        for r in spark.read.parquet(os.path.join(out, "enriched")).collect()
    }
    batch = {
        r.event_id: (
            r.user_id,
            r.us,
            r.value,
            r.asof_event_id,
            r.asof_us,
            r.asof_value,
        )
        for r in events.asof_join_df(spark, SF_SMALL)
        .withColumn("us", F.unix_micros(F.col("ts").cast("timestamp")))
        .withColumn("asof_us", F.unix_micros(F.col("asof_ts").cast("timestamp")))
        .collect()
    }
    assert len(streamed) == len(batch) > 0
    assert streamed == batch
    # the cross-batch carry actually fired: some arrival-2 left event's
    # as-of partner has an arrival-1 timestamp
    cut_us = int(
        spark.sql(f"SELECT unix_micros(timestamp'{cutoff} 00:00:00')").collect()[0][0]
    )
    assert any(
        ts >= cut_us and a_ts is not None and a_ts < cut_us
        for (_, ts, _, _, a_ts, _) in streamed.values()
    )


def test_stateful_sessionize_contract_needs_ordered_arrivals(spark, tmp_path):
    """VERDICT r6 item 7 — the sessionize face's ordering contract,
    stated negatively: arrivals violating event-time order (newer slice
    first) replay each user's events out of global time order, so session
    BOUNDARIES diverge from the batch face — but events are never lost or
    duplicated (per-user n_events still matches batch exactly; only the
    gap structure is wrong). Production enforces the contract with
    watermark + sorted ingest, like the as-of face."""
    from pyspark.sql import functions as F

    from serbian_osm_lint_spark.operators import events
    from serbian_osm_lint_spark.streaming import stateful

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    cutoff = "2024-01-15"
    src = str(tmp_path / "events")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # REVERSED arrival order: second half first
    ev.filter(F.col("ts") >= cutoff).coalesce(1).write.mode("append").parquet(src)
    stateful.stream_sessionize(spark, src, out, ckpt)
    ev.filter(F.col("ts") < cutoff).coalesce(1).write.mode("append").parquet(src)
    stateful.stream_sessionize(spark, src, out, ckpt)

    streamed = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in stateful.read_latest(spark, out).collect()
    }
    batch = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in events.sessionize_df(spark, SF_SMALL).collect()
    }
    assert set(streamed) == set(batch)
    # events conserved per user...
    assert all(streamed[u][1] == batch[u][1] for u in batch)
    # ...but disorder is visible: some user's session count diverges
    assert any(streamed[u][0] != batch[u][0] for u in batch)


def test_stateful_asof_contract_needs_ordered_arrivals(spark, tmp_path):
    """The documented contract, negatively: when arrivals violate
    event-time order (newer slice first), the latest-right state is
    already ahead of the older batch's left events and the streamed
    output DIVERGES from batch — the operator requires ordered ingest
    (production: watermark + sorted arrival), it does not silently
    absorb disorder. With the r6 guard, disorder is DETECTABLE: the
    affected left rows carry NULL asof fields rather than an enrichment
    from the future (asof_ts_us > ts_us is impossible in the output)."""
    import os

    from pyspark.sql import functions as F

    from serbian_osm_lint_spark.operators import events
    from serbian_osm_lint_spark.streaming import stateful

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    cutoff = "2024-01-15"
    src = str(tmp_path / "events")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # REVERSED arrival order: second half first
    ev.filter(F.col("ts") >= cutoff).coalesce(1).write.mode("append").parquet(src)
    stateful.stream_asof_join(spark, src, out, ckpt)
    ev.filter(F.col("ts") < cutoff).coalesce(1).write.mode("append").parquet(src)
    stateful.stream_asof_join(spark, src, out, ckpt)

    enriched_rows = spark.read.parquet(os.path.join(out, "enriched")).collect()
    streamed = {r.event_id: r.asof_event_id for r in enriched_rows}
    batch = {
        r.event_id: r.asof_event_id for r in events.asof_join_df(spark, SF_SMALL).collect()
    }
    assert set(streamed) == set(batch)  # same left events either way
    assert any(streamed[e] != batch[e] for e in batch)  # but disorder visible
    # the guard: every divergence is a NULL-ed enrichment, never a match
    # from the future
    assert all(
        r.asof_ts_us is None or r.asof_ts_us <= r.ts_us for r in enriched_rows
    )
    assert any(
        r.asof_event_id is None and batch[r.event_id] is not None
        for r in enriched_rows
    )
