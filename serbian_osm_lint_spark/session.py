# -*- coding: utf-8 -*-
"""SparkSession factory with scale-oriented defaults.

AQE on (runtime re-plan + skew-join splitting), shuffle partitions sized
to cores for local mode (a 1000-executor cluster would set this to
~2-3× total cores or rely on AQE coalescing), UTC session TZ (oracle
comparability), Arrow enabled for the pandas-UDF geometry paths.
"""

from __future__ import annotations

import os


def get_spark(
    app_name: str = "serbian-osm-lint-spark",
    cpus: int | None = None,
    emulate_executors: bool = False,
):
    """Local session. ``emulate_executors=True`` makes local[N] a faithful
    proxy for an N-core *cluster slice*: the JVM is told it has exactly N
    processors (GC/JIT/common-pool threads otherwise use all machine cores,
    inflating low-parallelism throughput) and the heap scales with N (each
    simulated executor brings its own memory)."""
    from pyspark.sql import SparkSession

    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # FAIR scheduling so concurrent jobs (resume buckets, ad-hoc
        # queries) share executors instead of a large early job starving
        # the rest under FIFO; threads opt in via a per-thread pool
        # (streaming/resume.py). Single-job workloads are unaffected.
        .config("spark.scheduler.mode", "FAIR")
    )
    if emulate_executors:
        builder = builder.config(
            "spark.driver.memory", f"{max(2, int(1.25 * cpus))}g"
        ).config(
            "spark.driver.extraJavaOptions", f"-XX:ActiveProcessorCount={cpus}"
        )
    else:
        builder = builder.config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g")
        )
    return builder.getOrCreate()
