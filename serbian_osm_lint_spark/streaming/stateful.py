# -*- coding: utf-8 -*-
"""Custom stateful streaming operator: cross-batch sessionization via
``applyInPandasWithState``.

The batch face (``operators/events.sessionize_df``) needs the whole
history; the streaming face keeps exactly the state a 100 TB event stream
needs per user — (last event epoch, session count, event count) — and
keeps counting sessions across micro-batches. State schema and the
pandas-batched update function are the pattern for any custom stateful
operator the engine grows later (SURVEY §2.10 UDx surface).
"""

from __future__ import annotations

import os

import pandas as pd

SESSION_GAP_SEC = 1800

OUTPUT_SCHEMA = "user_id long, n_sessions long, n_events long"
STATE_SCHEMA = "last_epoch long, n_sessions long, n_events long"


def _update_user(key, pdf_iter, state):
    """Per-user state update: replay this batch's events in time order,
    opening a session whenever the gap from the previous event exceeds
    the threshold (matching operators/events.sessionize_df exactly)."""
    (user_id,) = key
    if state.exists:
        last_epoch, n_sessions, n_events = state.get
    else:
        last_epoch, n_sessions, n_events = None, 0, 0
    # materialize ALL Arrow chunks before sorting: a user whose batch rows
    # span multiple chunks must be replayed in global time order, or the
    # session count diverges from the batch sessionize_df (round-1 ADVICE).
    chunks = list(pdf_iter)
    if chunks:
        pdf = pd.concat(chunks).sort_values(["epoch", "event_id"])
        for e in pdf["epoch"]:
            e = int(e)
            if last_epoch is None or e - last_epoch > SESSION_GAP_SEC:
                n_sessions += 1
            last_epoch = e
            n_events += 1
    state.update((last_epoch, n_sessions, n_events))
    yield pd.DataFrame(
        [{"user_id": user_id, "n_sessions": n_sessions, "n_events": n_events}]
    )


def stream_sessionize(spark, events_path: str, out_dir: str, checkpoint_dir: str) -> int:
    """Run one AvailableNow pass; state persists in the checkpoint, so a
    later pass over newly arrived files continues the same sessions.
    Writes the latest per-user counts to ``out_dir`` (overwritten per
    batch). Returns number of micro-batches executed."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    schema = spark.read.parquet(events_path).schema
    ev = (
        spark.readStream.schema(schema)
        .parquet(events_path)
        .withColumn("epoch", F.col("ts").cast("timestamp").cast("long"))
        .select("user_id", "event_id", "epoch")
    )
    counts = ev.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    batches = []

    def sink(batch_df, batch_id):
        # Update-mode batches carry only the users touched in that batch —
        # append with the batch id; read_latest() takes each user's newest
        # row (an overwrite of "latest" would drop untouched users).
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            os.path.join(out_dir, "updates")
        )
        batches.append(batch_id)

    q = (
        counts.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return len(batches)


def read_latest(spark, out_dir: str):
    """Newest per-user state from the update log."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.read.parquet(os.path.join(out_dir, "updates"))
    w = Window.partitionBy("user_id").orderBy(F.desc("batch_id"))
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_sessions", "n_events")
    )
