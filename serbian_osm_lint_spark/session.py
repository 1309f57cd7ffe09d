# -*- coding: utf-8 -*-
"""SparkSession factory with scale-oriented defaults.

AQE on (runtime re-plan + skew-join splitting), shuffle partitions sized
to cores for local mode (a 1000-executor cluster would set this to
~2-3× total cores or rely on AQE coalescing), UTC session TZ (oracle
comparability), Arrow enabled for the pandas-UDF geometry paths.
"""

from __future__ import annotations

import os


def get_spark(app_name: str = "serbian-osm-lint-spark", cpus: int | None = None):
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
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
