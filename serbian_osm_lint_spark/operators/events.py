# -*- coding: utf-8 -*-
"""Event-stream operators: tumbling-window aggregation and sessionization.

No reference analogue (the reference is batch-only; SURVEY §2.10) — these
are the streaming-adjacent operators a 100 TB pipeline needs, expressed
so the *same* aggregation runs in batch (oracle-checked) and under
Structured Streaming with a watermark (tests/test_events_stream.py).

Scale shape: windowed agg shuffles on (window, event_type) — bounded
cardinality; sessionization shuffles on user_id (well-distributed) and
is one pass with a lag window, no self-join.
"""

from __future__ import annotations

SESSION_GAP_SEC = 1800


def events_windowed_df(spark, sf_dir: str):
    """1-hour tumbling window × event_type: count, sum, avg(value)."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # avg derives from the ROUNDED sum (not F.avg): the raw sums differ
    # between engines by an ulp (summation order), which flips
    # round-half ties — caught by an sf0.1 parity sweep (r4) on a group
    # whose avg landed exactly on ...5 at the 7th decimal.
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .withColumn("avg_value", F.round(F.col("sum_value") / F.col("n_events"), 6))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def sql_events_windowed() -> str:
    return (
        "SELECT window_start, event_type, n_events, sum_value, "
        "round(sum_value / n_events, 6) AS avg_value FROM ("
        "SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type, "
        "count(*) AS n_events, round(sum(value), 6) AS sum_value "
        "FROM events GROUP BY 1, 2)"
    )


def sessionize_df(spark, sf_dir: str):
    """Per-user session stats with a 30-min inactivity gap.

    lag(ts) over (user order by ts) → gap > 1800s starts a session;
    running sum of starts = session index.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts arrives as TIMESTAMP_NTZ (no direct cast to long) — hop via
    # TIMESTAMP (session TZ pinned UTC, value-preserving) to epoch seconds.
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    sess = ev.withColumn(
        "new_session", F.when(gap.isNull() | (gap > SESSION_GAP_SEC), 1).otherwise(0)
    )
    return sess.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


def sql_sessionize() -> str:
    return f"""
    WITH g AS (
      SELECT user_id,
             CASE WHEN lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  OR epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > {SESSION_GAP_SEC}
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM g GROUP BY user_id
    """


def stream_events_windowed(spark, events_path: str, out_dir: str, checkpoint_dir: str):
    """The same windowed agg under Structured Streaming with a 1-hour
    watermark, AvailableNow trigger, append mode (closed windows only)."""
    from pyspark.sql import functions as F

    schema = spark.read.parquet(events_path).schema
    ev = spark.readStream.schema(schema).parquet(events_path)
    # parquet reads ts as TIMESTAMP_NTZ; watermarks need TIMESTAMP (session
    # TZ is pinned UTC, so the cast is value-preserving).
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def asof_join_df(spark, sf_dir: str, left_type: str = "click", right_type: str = "view"):
    """As-of join — the canonical operator Spark's DataFrame API lacks:
    each ``left_type`` event enriched with the MOST RECENT ``right_type``
    event of the same user at-or-before its timestamp (NULLs when none).

    Spark-first shape: instead of a range join (which Catalyst executes
    as a per-user cross product — quadratic in events/user), both sides
    are UNIONED and merged by one window pass: shuffle on user_id, sort
    by (ts, side, event_id) with the right side first at equal ts
    (inclusive as-of), then ``last(value, ignorenulls=True)`` over the
    unbounded-preceding frame carries the latest right-event attributes
    forward onto every left row. One shuffle, linear per-user work — the
    same merge an ASOF-JOIN-native engine performs. The right side is
    first deduped to one row per (user_id, ts) (max event_id wins) so
    both engines are deterministic under timestamp ties; the DuckDB twin
    is the engine-native ``ASOF LEFT JOIN``.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    wdup = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    right = (
        ev.filter(F.col("event_type") == right_type)
        .withColumn("rn", F.row_number().over(wdup))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "ts",
            F.lit(0).alias("side"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("double").alias("value"),
            F.col("event_id").alias("r_event_id"),
            F.col("ts").alias("r_ts"),
            F.col("value").alias("r_value"),
        )
    )
    left = ev.filter(F.col("event_type") == left_type).select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        "event_id",
        "value",
        F.lit(None).cast("long").alias("r_event_id"),
        F.lit(None).cast("timestamp").alias("r_ts"),
        F.lit(None).cast("double").alias("r_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", F.coalesce("r_event_id", "event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = left.unionByName(right).select(
        "user_id",
        "ts",
        "side",
        "event_id",
        "value",
        F.last("r_event_id", ignorenulls=True).over(w).alias("asof_event_id"),
        F.last("r_ts", ignorenulls=True).over(w).alias("asof_ts"),
        F.last("r_value", ignorenulls=True).over(w).alias("asof_value"),
    )
    return merged.filter(F.col("side") == 1).select(
        "event_id", "user_id", "ts", "value", "asof_event_id", "asof_ts", "asof_value"
    )


def sql_asof_join(left_type: str = "click", right_type: str = "view") -> str:
    """DuckDB twin of :func:`asof_join_df`: the engine-native ASOF LEFT
    JOIN over the identically-deduped right side — a fully independent
    implementation of the same spec."""
    return f"""
    WITH r AS (
      SELECT user_id, ts, event_id, value FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = '{right_type}'
      ) WHERE rn = 1
    ),
    l AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = '{left_type}')
    SELECT l.event_id, l.user_id, l.ts, l.value,
           r.event_id AS asof_event_id, r.ts AS asof_ts, r.value AS asof_value
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    """


def range_join_df(spark, sf_dir: str, delta_s: int = 300,
                  left_type: str = "click", right_type: str = "error"):
    """Time-range join — the second operator family Spark's optimizer
    punts on: all (``left_type``, ``right_type``) event pairs of the same
    user within ``delta_s`` seconds of each other.

    Spark-first shape: a raw ``|ts_l - ts_r| <= delta`` theta join plans
    as a per-user cross product (BroadcastNestedLoop / quadratic). The
    same trick as the spatial neighbor ring (J8) applies in time: bin
    both sides at ``delta_s`` granularity, explode the LEFT side into
    its 3 adjacent bins, equi-join on (user_id, bin) — every qualifying
    pair shares one of those bins exactly once, so no distinct is
    needed — then the exact range predicate filters inside the bin pair.
    One well-distributed shuffle; pair work bounded by events/user/Δ.
    Output: (event_id_l, event_id_r, user_id, dt_s) with dt_s =
    seconds from left to right (signed, exact microseconds rounded to
    6)."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # ts arrives TIMESTAMP_NTZ — hop via TIMESTAMP (session TZ pinned
    # UTC, value-preserving) for unix_micros, as sessionize_df does.
    usec = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    left = ev.filter(F.col("event_type") == left_type).select(
        F.col("event_id").alias("event_id_l"),
        "user_id",
        usec("ts").alias("us_l"),
        F.explode(
            F.array(
                F.floor(usec("ts") / (delta_s * 1_000_000)) - 1,
                F.floor(usec("ts") / (delta_s * 1_000_000)),
                F.floor(usec("ts") / (delta_s * 1_000_000)) + 1,
            )
        ).alias("bin"),
    )
    right = ev.filter(F.col("event_type") == right_type).select(
        F.col("event_id").alias("event_id_r"),
        "user_id",
        usec("ts").alias("us_r"),
        F.floor(usec("ts") / (delta_s * 1_000_000)).alias("bin"),
    )
    pairs = left.join(right, ["user_id", "bin"]).filter(
        F.abs(F.col("us_r") - F.col("us_l")) <= delta_s * 1_000_000
    )
    return pairs.select(
        "event_id_l",
        "event_id_r",
        "user_id",
        F.round((F.col("us_r") - F.col("us_l")) / 1_000_000.0, 6).alias("dt_s"),
    )


def sql_range_join(delta_s: int = 300, left_type: str = "click",
                   right_type: str = "error") -> str:
    """DuckDB twin of :func:`range_join_df`: the straight range-predicate
    join (DuckDB's IEJoin executes it without a cross product — an
    independent dataflow arriving at the same pairs)."""
    return f"""
    WITH l AS (
      SELECT event_id AS event_id_l, user_id, epoch_us(ts) AS us_l
      FROM events WHERE event_type = '{left_type}'
    ),
    r AS (
      SELECT event_id AS event_id_r, user_id, epoch_us(ts) AS us_r
      FROM events WHERE event_type = '{right_type}'
    )
    SELECT l.event_id_l, r.event_id_r, l.user_id,
           round((r.us_r - l.us_l) / 1000000.0, 6) AS dt_s
    FROM l JOIN r ON l.user_id = r.user_id
     AND abs(r.us_r - l.us_l) <= {delta_s} * 1000000
    """
