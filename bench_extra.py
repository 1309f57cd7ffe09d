#!/usr/bin/env python
"""Per-query isolation harness (guide §1.4): noop-sink timing + formatted
plans for the bench queries, WITHOUT touching the frozen bench.py.

Usage:
  python bench_extra.py [query ...]            # default: all
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py simhash_stored

Per query: writes plans/r08/<name>_<TAG>.txt (explain formatted), times a
warm-up + N noop-sink runs, prints one JSON line with medians. The noop
sink materializes every column of every row (unlike a pruned count), so
it times the computation, not the collect/sink.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
TAG = os.environ.get("PLAN_TAG", "before")
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r08")


def main():
    from serbian_osm_lint_spark.session import get_spark
    from serbian_osm_lint_spark.operators import (
        corpus,
        dedup,
        events,
        media,
        similarity,
        spatial,
    )
    from serbian_osm_lint_spark.plans import lint_pipeline
    from serbian_osm_lint_spark.sources import catalog

    spark = get_spark("bench_extra", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    docs = catalog.docs_table(spark, SF_DIR)
    docs.count()
    dedup.simhash_sig_table(spark, SF_DIR)
    dedup.minhash_sig_table(spark, SF_DIR)
    similarity.ivf_assignment_table(spark, SF_DIR)
    similarity.pq_code_table(spark, SF_DIR)

    benches = {
        "lint_verdicts": lambda: lint_pipeline.build_verdicts(spark, SF_DIR),
        "point_in_serbia": lambda: spatial.point_in_serbia_df(spark, docs),
        "knn_dup_names": lambda: spatial.knn_dup_names_df(spark, docs),
        "tile_assignment": lambda: spatial.tile_assignment_df(spark, docs),
        "cell_counts_salted": lambda: spatial.cell_counts_salted_df(spark, docs),
        "minhash_lsh_pairs": lambda: dedup.minhash_lsh_pairs_df(spark, SF_DIR),
        "minhash_pairs_stored": lambda: dedup.minhash_lsh_pairs_stored_df(spark, SF_DIR),
        "ann_cosine_topk": lambda: similarity.ann_cosine_topk_df(spark, SF_DIR),
        "ann_ivf_topk": lambda: similarity.ann_ivf_topk_df(spark, SF_DIR),
        "ann_ivf_topk_stored": lambda: similarity.ann_ivf_topk_stored_df(spark, SF_DIR),
        "ann_pq_topk_stored": lambda: similarity.ann_pq_topk_stored_df(spark, SF_DIR),
        "simhash_near_dups": lambda: dedup.simhash_near_dups_df(spark, SF_DIR),
        "simhash_stored": lambda: dedup.simhash_near_dups_stored_df(spark, SF_DIR),
        "media_features": lambda: media.extract_media_features_df(spark, docs),
        "asof_join": lambda: events.asof_join_df(spark, SF_DIR),
        "range_join": lambda: events.range_join_df(spark, SF_DIR),
        "decontaminate": lambda: corpus.decontaminate_df(spark, SF_DIR),
        "vocab_topk": lambda: corpus.vocab_topk_df(spark, SF_DIR),
    }

    names = sys.argv[1:] or list(benches)
    os.makedirs(PLAN_DIR, exist_ok=True)
    out = {}
    for name in names:
        fn = benches[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        df = fn()
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(PLAN_DIR, f"{name}_{TAG}.txt"), "w") as fh:
            fh.write(plan)
        df.write.format("noop").mode("overwrite").save()  # warm-up
        runs = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {"median": round(statistics.median(runs), 3), "runs": runs}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf": SF_DIR, "tag": TAG, "noop_medians": {k: v["median"] for k, v in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
