#!/usr/bin/env python
"""spark-submit entry point: full lint pipeline with metrics + resume.

Usage:
  scripts/package.sh   # builds dist/serbian_osm_lint_spark.zip
  spark-submit --py-files dist/serbian_osm_lint_spark.zip jobs/run_lint.py \
      --sf-dir /root/testdata/sf0.01 --out /tmp/lint_out [--resume] [--report]

The job writes the long verdict table (bucket-partitioned, resumable via
the manifest in <out>/_manifest) and prints run metrics (S9: the Spark
equivalent of the reference's every-100k progress counter —
``src/sources/osm_source.py:28-30`` — is the observe() row/error count
plus per-bucket lineage rows).
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True)
    # the stored doc table fixes its bucket domain at write time; passing a
    # different count is rejected by run_resumable (silent skip = data loss)
    ap.add_argument("--n-buckets", type=int, default=None)
    ap.add_argument("--report", action="store_true", help="print report aggregates")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("serbian-osm-lint-spark").getOrCreate()

    from serbian_osm_lint_spark.operators import report
    from serbian_osm_lint_spark.operators.checks import lint_verdicts_df
    from serbian_osm_lint_spark.sources import catalog
    from serbian_osm_lint_spark.streaming import resume

    wiki, wd = catalog.dims_tables(spark, args.sf_dir)

    def process(s, docs_subset):
        return lint_verdicts_df(s, docs_subset, wiki, wd)

    docs = catalog.docs_table(spark, args.sf_dir)
    processed = resume.run_resumable(
        spark, docs, process, args.out, n_buckets=args.n_buckets
    )
    manifest = resume.BucketManifest(f"{args.out}/_manifest")
    lineage = manifest.done_buckets()
    verdicts = resume.read_result(spark, args.out)
    metrics = {
        "buckets_processed_this_run": processed,
        "buckets_total": len(lineage),
        "rows_per_bucket": {str(b): m["rows"] for b, m in sorted(lineage.items())},
        "total_verdicts": sum(m["rows"] for m in lineage.values()),
    }
    print(json.dumps(metrics))

    if args.report:
        for row in report.per_map_report_df(verdicts).collect():
            print(json.dumps(row.asDict()))
        print(json.dumps(report.summary_report_df(verdicts).collect()[0].asDict()))
    spark.stop()


if __name__ == "__main__":
    main()
