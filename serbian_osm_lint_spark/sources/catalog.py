# -*- coding: utf-8 -*-
"""Table IO: Iceberg-first with parquet fallback.

The north rule stores the doc table as Iceberg (snapshots double as
resume checkpoints). The sandbox image has no Iceberg jars, so the
catalog probes once and falls back to parquet transparently — the rest of
the engine only ever calls :func:`read_table` / :func:`write_table`.

This replaces the reference's source dispatch
(``src/sources/source_factory.py:15-25``): format selection by
capability/config instead of by filename suffix; PBF/Sophox ingest are
out-of-band (SURVEY §2.1 S1-S5) — the engine scans the doc table.
"""

from __future__ import annotations

import functools


@functools.lru_cache(maxsize=1)
def iceberg_available(_spark_id: int = 0) -> bool:
    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        jvm = spark._jvm  # noqa: SLF001
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def write_table(df, path: str, mode: str = "overwrite", partition_by=None):
    """Write a table (Iceberg if jars present, else parquet)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if iceberg_available():
        writer.format("iceberg").save(path)
    else:
        writer.parquet(path)
    return path


def read_table(spark, path: str):
    if iceberg_available():
        try:
            return spark.read.format("iceberg").load(path)
        except Exception:
            pass
    return spark.read.parquet(path)


def load_tpch(spark, sf_dir: str, name: str):
    """Load one of the driver-provided synthetic tables."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
