#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <dir>, "docs_per_sec": ...}

Each query is timed end-to-end (action = count) after a warm-up of the
input file listing; the lint pipeline is the headline (verdicts +
tile assignments, the BASELINE.json metric).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    from serbian_osm_lint_spark.session import get_spark
    from serbian_osm_lint_spark.operators import dedup, similarity, spatial
    from serbian_osm_lint_spark.plans import lint_pipeline
    from serbian_osm_lint_spark.sources import catalog

    spark = get_spark("bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    docs = catalog.docs_table(spark, SF_DIR)  # untimed data prep/scan warm-up
    n_docs = docs.count()

    def q_lint():
        return lint_pipeline.build_verdicts(spark, SF_DIR)

    def q_pip():
        return spatial.point_in_serbia_df(spark, docs)

    def q_knn():
        return spatial.knn_dup_names_df(spark, docs)

    def q_tiles():
        return spatial.tile_assignment_df(spark, docs)

    def q_cells():
        return spatial.cell_counts_salted_df(spark, docs)

    def q_minhash():
        return dedup.minhash_lsh_pairs_df(spark, SF_DIR)

    def q_ann():
        return similarity.ann_cosine_topk_df(spark, SF_DIR)

    benches = {
        "lint_verdicts": q_lint,
        "point_in_serbia": q_pip,
        "knn_dup_names": q_knn,
        "tile_assignment": q_tiles,
        "cell_counts_salted": q_cells,
        "minhash_lsh_pairs": q_minhash,
        "ann_cosine_topk": q_ann,
    }

    timings = {}
    for name, fn in benches.items():
        t0 = time.perf_counter()
        fn().count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    # headline throughput: docs fully linted+tiled per second
    lint_tile_sec = timings["lint_verdicts"] + timings["tile_assignment"]
    print(
        json.dumps(
            {
                "metric": "lint-verdicts + tile-assignments throughput",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR,
                "cpus": CPUS,
                "n_docs": n_docs,
                "docs_per_sec": round(n_docs / lint_tile_sec, 1) if lint_tile_sec else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
