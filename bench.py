#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <dir>, "docs_per_sec": ...}

Measurement protocol (round-4 hardening; VERDICT r3 "What's wrong" #1):

* Action = a CONSUMING aggregate (`count(*)` + `bit_xor(xxhash64(all cols))`),
  not a bare `.count()`. A bare count lets Catalyst prune every computed
  column nothing consumes (check messages, fix values, tile ids), so the
  old harness partially measured a narrower plan than the one users run.
  Hashing every output column forces full materialization of the query's
  semantics while keeping the reduce itself trivial.
* Per query: ONE warm-up run (JIT + page cache + broadcast warm), then
  THREE timed runs, reporting the MEDIAN. Round 3 showed a single-shot
  harness can read +5.4% when two quiet-box runs measured -9% — median-
  of-3 with a warm-up bounds that noise.
* Every run builds a FRESH plan (calls the query fn again): re-collecting
  the same DataFrame silently reuses shuffle map outputs and would time
  only the final reduce (see BENCH/BASELINE.md).

`queries` holds the per-query medians; `runs` holds all three samples so
the artifact itself shows the spread.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def consume(df):
    """Force full materialization: hash every output column into one row."""
    from pyspark.sql import functions as F

    return df.agg(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64(*df.columns)).alias("h"),  # overflow-free under ANSI
    ).collect()[0]


#: calibration reference, seconds: the fixed micro-task's quiet-box time
#: (measured on this box, idle). A measured calibration ≫ this means the
#: box is running something else (e.g. the driver benches right after its
#: 50-query oracle sweep — the r5 artifact read 2.5× high for exactly
#: that reason).
CALIB_QUIET_S = 0.35
CONTENDED_FACTOR = 2.0
SPREAD_FACTOR = 2.0  # max/min within a query's runs that triggers a re-run
#: a run spread above this triggers an INTERLEAVED calibration probe
#: right after the query (VERDICT r6 item 2: the bracketing before/after
#: probes missed contention transients that hit one query mid-sweep —
#: two documented false negatives labeled "quiet" in r6)
SPREAD_PROBE_FACTOR = 1.5
#: an interleaved probe above this × quiet_ref marks the query — and the
#: whole artifact — contended
PROBE_CONTENDED_FACTOR = 1.3


def calibrate(spark) -> float:
    """Fixed CPU-bound micro-task (VERDICT r5 item 2): time a constant
    32M-row xxhash64 reduce. Pure compute, no IO, plan fully codegen'd —
    its runtime varies only with box contention."""
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    spark.range(32_000_000).agg(F.bit_xor(F.xxhash64("id"))).collect()
    return round(time.perf_counter() - t0, 3)


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

    # round-5 additions (VERDICT r4 item 4): track the r4 operator
    # families round-over-round under the stable warm-median protocol
    def q_simhash_near():
        return dedup.simhash_near_dups_df(spark, SF_DIR)

    dedup.simhash_sig_table(spark, SF_DIR)  # untimed write, like minhash

    def q_simhash_stored():
        return dedup.simhash_near_dups_stored_df(spark, SF_DIR)

    def q_media():
        return media.extract_media_features_df(spark, docs)

    def q_asof():
        return events.asof_join_df(spark, SF_DIR)

    def q_range():
        return events.range_join_df(spark, SF_DIR)

    def q_decontam():
        return corpus.decontaminate_df(spark, SF_DIR)

    def q_vocab():
        return corpus.vocab_topk_df(spark, SF_DIR)

    # r6: the stored-signature-table topology vs the recompute face (the
    # signature table itself is materialized untimed, like docs_table —
    # at 100 TB it's written once at ingest)
    dedup.minhash_sig_table(spark, SF_DIR)

    def q_minhash_stored():
        return dedup.minhash_lsh_pairs_stored_df(spark, SF_DIR)

    # r6: the ANN scale path — brute-force cosine is the linear baseline
    # (7.3× at the 100× proxy); IVF is what a large corpus actually runs
    def q_ann_ivf():
        return similarity.ann_ivf_topk_df(spark, SF_DIR)

    # r7: the stored-assignment IVF face — cells materialized at ingest
    # (untimed, like the signature tables); per-query cost is probe +
    # re-rank over the cell-pruned stored scan
    similarity.ivf_assignment_table(spark, SF_DIR)

    def q_ann_ivf_stored():
        return similarity.ann_ivf_topk_stored_df(spark, SF_DIR)

    # r7: PQ/ADC — codes materialized at ingest (untimed); the timed pass
    # is the skinny (id, 8 codes, norm) ADC scan + 50-candidate re-rank
    similarity.pq_code_table(spark, SF_DIR)

    def q_ann_pq_stored():
        return similarity.ann_pq_topk_stored_df(spark, SF_DIR)

    benches = {
        "lint_verdicts": q_lint,
        "point_in_serbia": q_pip,
        "knn_dup_names": q_knn,
        "tile_assignment": q_tiles,
        "cell_counts_salted": q_cells,
        "minhash_lsh_pairs": q_minhash,
        "minhash_pairs_stored": q_minhash_stored,
        "ann_cosine_topk": q_ann,
        "ann_ivf_topk": q_ann_ivf,
        "ann_ivf_topk_stored": q_ann_ivf_stored,
        "ann_pq_topk_stored": q_ann_pq_stored,
        "simhash_near_dups": q_simhash_near,
        "simhash_stored": q_simhash_stored,
        "media_features": q_media,
        "asof_join": q_asof,
        "range_join": q_range,
        "decontaminate": q_decontam,
        "vocab_topk": q_vocab,
    }

    # box-state calibration (VERDICT r5 item 2: BENCH_r05 shipped 2.5×
    # high because the driver benched minutes after its oracle sweep)
    calibrate(spark)  # untimed: JIT/codegen warm-up for the micro-task
    calib_before = calibrate(spark)

    timings = {}
    samples = {}
    reruns = []
    box_state = {}
    for name, fn in benches.items():
        consume(fn())  # warm-up: fresh plan, result discarded
        runs = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            consume(fn())  # fresh plan each run — no shuffle-output reuse
            runs.append(round(time.perf_counter() - t0, 3))
        spread = max(runs) / min(runs)
        probe = calibrate(spark) if spread > SPREAD_PROBE_FACTOR else None
        probed_contended = (
            probe is not None and probe > PROBE_CONTENDED_FACTOR * CALIB_QUIET_S
        )
        if spread > SPREAD_FACTOR or probed_contended:
            # a wide spread / contended probe is a box transient, not the
            # query: take one more sample so the median can't land on the
            # inflated outlier
            reruns.append(name)
            t0 = time.perf_counter()
            consume(fn())
            runs.append(round(time.perf_counter() - t0, 3))
        timings[name] = round(statistics.median(runs), 3)
        samples[name] = runs
        # per-query box-state label (VERDICT r6 item 2): "steady" = spread
        # small, no probe needed; otherwise the interleaved probe decides
        box_state[name] = {
            "spread": round(spread, 3),
            "calib": probe,
            "state": "steady"
            if probe is None
            else ("contended" if probed_contended else "quiet"),
        }

    calib_after = calibrate(spark)
    contended = max(calib_before, calib_after) > CONTENDED_FACTOR * CALIB_QUIET_S or any(
        q["state"] == "contended" for q in box_state.values()
    )

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
                "runs": samples,
                "protocol": "median-of-%d, warmed, consuming xxhash64 agg" % N_RUNS,
                "regime": "contended" if contended else "quiet",
                "calibration_s": {
                    "before": calib_before,
                    "after": calib_after,
                    "quiet_ref": CALIB_QUIET_S,
                },
                "loadavg": [round(x, 2) for x in os.getloadavg()],
                "box_state_per_query": box_state,
                "respread_reruns": reruns,
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
