# -*- coding: utf-8 -*-
"""Structured Streaming execution mode (optional per SURVEY §2.10).

``Trigger.AvailableNow`` over the stored doc table: the engine's batch
pipelines run unchanged inside ``foreachBatch``; Spark's streaming
checkpoint gives exactly-once file-source progress tracking, which is
the second (engine-native) resume mechanism next to the bucket manifest
in :mod:`.resume`. At cluster scale the same topology tails an Iceberg
table's appended snapshots.
"""

from __future__ import annotations

import os


def stream_lint_verdicts(spark, docs_path: str, out_dir: str, checkpoint_dir: str, wiki, wd):
    """Run the lint pipeline incrementally over ``docs_path`` (parquet dir).

    Returns the number of batches executed in this invocation (0 when the
    checkpoint says everything was already processed).
    """
    from ..operators.checks import lint_verdicts_df
    from ..schema import DOCS_SCHEMA

    batches = []

    def process_batch(batch_df, batch_id):
        out = lint_verdicts_df(batch_df.sparkSession, batch_df, wiki, wd)
        out.write.mode("append").parquet(os.path.join(out_dir, "verdicts"))
        batches.append(batch_id)

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .parquet(docs_path)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination()
    return len(batches)


def stream_dedup_exact(spark, texts_path: str, out_dir: str, checkpoint_dir: str):
    """Streaming exact dedup: engine-native ``dropDuplicates`` on the
    content fingerprint over an incrementally arriving (doc_id, text)
    corpus. First arrival of a fingerprint wins; later copies (same batch
    or any later batch — the dedup state lives in the streaming
    checkpoint) are dropped. Returns batches executed this invocation.

    Scale note: fingerprint state is 16 bytes/unique doc in the state
    store; production would add a watermark on an event-time column to
    bound it — the corpus here is static, so state is exactly the
    distinct-fingerprint count.
    """
    from pyspark.sql import functions as F

    from ..functions.text import fingerprint_col

    schema = "doc_id long, text string"
    batches = []

    def process_batch(batch_df, batch_id):
        batch_df.write.mode("append").parquet(os.path.join(out_dir, "canonical"))
        batches.append(batch_id)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")  # several micro-batches per pass
        .parquet(texts_path)
        .withColumn("fp", fingerprint_col(F.col("text")))
        .dropDuplicates(["fp"])
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination()
    return len(batches)


def stream_decontaminate(spark, train_path: str, holdout_grams, out_dir: str, checkpoint_dir: str):
    """Incremental test-set decontamination — the stream-static shape a
    continuously-ingesting pretraining pipeline runs: newly ARRIVED train
    shards are checked against a FROZEN holdout (val/test) gram set.

    ``holdout_grams`` is a static ``(gh)`` frame
    (``operators.corpus.holdout_grams_df``), computed once before the
    stream starts; each micro-batch explodes its docs' hashed 13-grams
    and equi-joins the static set — per-doc results are exact because a
    doc's grams never span micro-batches (file-granular arrivals), so
    streamed flags are row-identical to the batch pass over the same
    docs (tested). Returns micro-batches executed."""
    from ..operators.corpus import contamination_flags_from

    schema = "doc_id long, text string"
    batches = []

    def process_batch(batch_df, batch_id):
        flagged = contamination_flags_from(batch_df, holdout_grams)
        flagged.write.mode("append").parquet(os.path.join(out_dir, "flags"))
        batches.append(batch_id)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")  # several micro-batches per pass
        .parquet(train_path)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination()
    return len(batches)


def stream_near_dup_pairs(
    spark, texts_path: str, sig_table, out_dir: str, checkpoint_dir: str, threshold=None
):
    """Streaming MinHash near-dup dedup (VERDICT r5 item 4): arriving
    docs' band keys are joined STREAM-STATIC against the frozen stored
    signature table (:func:`..operators.dedup.minhash_sig_table`) — the
    decontamination shape applied to LSH bands, completing the streaming
    story for the dedup family (exact dedup already streams).

    Each micro-batch computes its arrivals' signatures per-row (no
    stream-side shuffle) and runs the shared two-sided skinny-fetch
    verified-pair join (r6: the static side's band shuffle carries only
    (band_key, doc_id); its fat shingle sets move only for the few
    candidate pairs — the stored table is re-scanned with column
    pruning instead of shuffling its arrays every micro-batch).
    The ``doc_id_a < doc_id_b`` filter makes emission exactly-once by
    construction: a pair appears only in the micro-batch where its
    larger id arrives (the smaller id is always present in the frozen
    table), so the union over batches equals the batch face with NO
    cross-batch dedup state — unlike ``dropDuplicates``, nothing
    accumulates in the state store. Returns batches executed."""
    from ..operators import dedup

    thr = dedup.JACCARD_THRESHOLD if threshold is None else threshold

    schema = "doc_id long, text string"
    batches = []

    def process_batch(batch_df, batch_id):
        arrivals = dedup._shingled_sig_from(batch_df)
        pairs = dedup.verified_pairs_skinny_fetch(sig_table, thr, sig_b=arrivals)
        pairs.write.mode("append").parquet(os.path.join(out_dir, "pairs"))
        batches.append(batch_id)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")  # several micro-batches per pass
        .parquet(texts_path)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination()
    return len(batches)


def stream_media_features(spark, payloads_path: str, out_dir: str, checkpoint_dir: str):
    """Streaming modality stage: the SAME Arrow ``mapInPandas`` feature
    extractor (:func:`..operators.media.media_features_from`) applied to
    an incrementally arriving payload table — mapInPandas composes with
    streaming sources unchanged, so the batch and streaming faces share
    one implementation. Returns batches executed this invocation.

    At cluster scale this is the ingest-side modality topology: media
    blobs land in an Iceberg table, the stream tails its snapshots, and
    the shuffle-free extractor keeps up with arrival rate by fan-out
    alone (scaling row in BENCH/BASELINE.md)."""
    from ..operators.media import media_features_from

    schema = "doc_id string, media_ref string, payload binary"
    batches = []

    def process_batch(batch_df, batch_id):
        batch_df.write.mode("append").parquet(os.path.join(out_dir, "features"))
        batches.append(batch_id)

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")  # several micro-batches per pass
        .parquet(payloads_path)
    )
    stream = (
        media_features_from(src)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination()
    return len(batches)
