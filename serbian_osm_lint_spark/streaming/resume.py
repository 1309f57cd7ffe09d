# -*- coding: utf-8 -*-
"""Checkpointed, resumable batch processing with per-partition lineage.

North-rule requirement: runs resume from checkpoints with per-partition
lineage + metrics. The unit of work is a deterministic hash bucket of
``doc_id`` (the parquet stand-in for Iceberg's ``bucket(doc_id)``
partition transform; with Iceberg jars the manifest maps 1:1 onto
snapshot ids). A manifest directory records one marker file per
completed bucket with its row count (lineage + metrics); a resumed run
anti-joins the manifest — only missing buckets are recomputed, and
re-writing a bucket is idempotent (``overwrite`` of that bucket's
subdirectory).

Determinism contract (SURVEY §7.3): the salt/bucket derives from
``doc_id`` content hash, never RNG or wall-clock, so a resume computes
byte-identical partitions.
"""

from __future__ import annotations

import json
import os


class BucketManifest:
    """Marker-file manifest: ``<dir>/bucket_<i>.done`` with JSON metrics."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def done_buckets(self) -> dict[int, dict]:
        out = {}
        for name in os.listdir(self.path):
            if name.startswith("bucket_") and name.endswith(".done"):
                b = int(name[len("bucket_") : -len(".done")])
                with open(os.path.join(self.path, name)) as fh:
                    out[b] = json.load(fh)
        return out

    def mark_done(self, bucket: int, metrics: dict) -> None:
        tmp = os.path.join(self.path, f".bucket_{bucket}.tmp")
        with open(tmp, "w") as fh:
            json.dump(metrics, fh)
        os.replace(tmp, os.path.join(self.path, f"bucket_{bucket}.done"))


def run_resumable(
    spark,
    docs,
    process_fn,
    out_dir: str,
    n_buckets: int = 8,
    fail_after: int | None = None,
):
    """Process ``docs`` bucket-by-bucket with resume.

    ``process_fn(spark, docs_subset) -> DataFrame`` is the per-bucket
    pipeline (e.g. lint verdicts). Completed buckets are skipped on
    re-run. ``fail_after=k`` aborts after k buckets (test hook for
    kill/resume). Returns the number of buckets processed this run.

    Pruning: when ``docs`` carries the stored ``bucket_id`` partition
    column (``catalog.docs_table`` lays the table out that way), the
    per-bucket filter is a PARTITION filter — each bucket's run reads
    only that bucket's files instead of re-scanning the whole table
    (n_buckets× read amplification otherwise). The ad-hoc hash fallback
    remains for un-partitioned inputs; the derivation is identical
    (``pmod(xxhash64(doc_id), n_buckets)``), content-hash, never RNG.
    """
    from pyspark.sql import functions as F

    manifest = BucketManifest(os.path.join(out_dir, "_manifest"))
    done = set(manifest.done_buckets())
    bucket_col = "bucket_id" if "bucket_id" in docs.columns else "_bucket"
    if bucket_col == "_bucket":
        bucketed = docs.withColumn(
            "_bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets))
        )
    else:
        bucketed = docs
    processed = 0
    for b in range(n_buckets):
        if b in done:
            continue
        subset = bucketed.filter(F.col(bucket_col) == b).drop(bucket_col)
        result = process_fn(spark, subset)
        path = os.path.join(out_dir, f"bucket={b}")
        result.write.mode("overwrite").parquet(path)
        n = spark.read.parquet(path).count()
        manifest.mark_done(b, {"rows": n, "bucket": b})
        processed += 1
        if fail_after is not None and processed >= fail_after:
            raise RuntimeError(f"injected failure after {processed} buckets")
    return processed


def read_result(spark, out_dir: str, n_buckets: int = 8):
    """Union of all completed bucket outputs."""
    paths = [
        os.path.join(out_dir, f"bucket={b}")
        for b in range(n_buckets)
        if os.path.exists(os.path.join(out_dir, f"bucket={b}", "_SUCCESS"))
    ]
    return spark.read.parquet(*paths)
