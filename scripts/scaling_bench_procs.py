"""Multi-process scaling evidence: N vs 4N *executors* on one box.

The truthful sandbox proxy for a cluster scale-up: each simulated executor
is its own JVM process (own heap, own GC, own task threads — exactly the
isolation a real executor has), pinned to EXEC_CORES cores via
local[EXEC_CORES] + -XX:ActiveProcessorCount. The corpus (pre-sharded
parquet files) is split across executors like a cluster would split
partitions. lo level = N executors, hi = 4N, same per-executor shape.

Each worker: warm-up pass over its shard (lint) or a JIT-priming pass
over one shard file (minhash — a full warm pass over 16 M texts/worker
would double an already-long run; the timed pass then includes a few
seconds of residual JIT ramp, which only UNDERSTATES throughput),
signal ready, wait for the barrier, run the measured pass, report
seconds. Wall time = max worker seconds (the straggler defines the job,
as on a real cluster).

Usage: python scripts/scaling_bench_procs.py [n_docs] [lo] [hi] [workload]
  workload: lint (default, /tmp/scaling_docs_N) or minhash
  (/tmp/scaling_texts_N — the shuffle-bearing LSH pipeline per shard)
"""

import glob
import json
import os
import subprocess
import sys
import tempfile
import time

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
LO = int(sys.argv[2]) if len(sys.argv) > 2 else 2
HI = int(sys.argv[3]) if len(sys.argv) > 3 else 8
WORKLOAD = sys.argv[4] if len(sys.argv) > 4 else "lint"
EXEC_CORES = 4
_default_data = (
    f"/tmp/scaling_docs_{N_DOCS}" if WORKLOAD == "lint" else f"/tmp/scaling_texts_{N_DOCS}"
)
DATA = os.environ.get("SCALING_DATA", _default_data)

WORKER_LINT = r'''
import glob, json, os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
shard_files = json.load(open(sys.argv[1]))
barrier_dir, wid = sys.argv[2], sys.argv[3]
cores = int(sys.argv[4])
spark = (SparkSession.builder.appName(f"exec-{wid}")
    .master(f"local[{cores}]")
    .config("spark.sql.shuffle.partitions", str(cores))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", f"{int(1.25*cores)}g")
    .config("spark.driver.extraJavaOptions", f"-XX:ActiveProcessorCount={cores}")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from serbian_osm_lint_spark.operators import checks, spatial
docs = spark.read.parquet(*shard_files)
wiki = spark.read.parquet("WIKIPATH")
wd = spark.read.parquet("WDPATH")

def build():
    v = checks.lint_verdicts_df(spark, docs, wiki, wd).agg(
        F.count("*").alias("n"), F.sum(F.length("message")).alias("mb"))
    t = spatial.tile_assignment_df(spark, docs).agg(
        F.count("*").alias("n"), F.sum(F.length("tile_id")).alias("tb"))
    return v, t
wv, wt = build(); wv.collect(); wt.collect()          # warm-up pass
open(os.path.join(barrier_dir, f"ready_{wid}"), "w").write("1")
while not os.path.exists(os.path.join(barrier_dir, "go")):
    time.sleep(0.05)
v, t = build()
t0 = time.perf_counter()
vr = v.collect()[0]; tr = t.collect()[0]
dt = time.perf_counter() - t0
print(json.dumps({"wid": wid, "sec": round(dt, 2), "verdicts": vr["n"], "tiles": tr["n"]}))
'''

WORKER_MINHASH = r'''
import glob, json, os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
shard_files = json.load(open(sys.argv[1]))
barrier_dir, wid = sys.argv[2], sys.argv[3]
cores = int(sys.argv[4])
spark = (SparkSession.builder.appName(f"exec-{wid}")
    .master(f"local[{cores}]")
    .config("spark.sql.shuffle.partitions", str(cores))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", f"{int(1.25*cores)}g")
    .config("spark.driver.extraJavaOptions", f"-XX:ActiveProcessorCount={cores}")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from serbian_osm_lint_spark.operators import dedup
texts = spark.read.parquet(*shard_files)

def build(df):
    # signatures -> band explode -> band-bucket self-join (shuffle) ->
    # exact-Jaccard verify -> distinct: the full shuffle-bearing pipeline
    return dedup.lsh_verified_pairs_from(df).agg(
        F.count("*").alias("n"), F.sum("jaccard").alias("js"))
# JIT-prime on ONE shard file (identical plan shape, small data)
build(spark.read.parquet(shard_files[0])).collect()
open(os.path.join(barrier_dir, f"ready_{wid}"), "w").write("1")
while not os.path.exists(os.path.join(barrier_dir, "go")):
    time.sleep(0.05)
mh = build(texts)
t0 = time.perf_counter()
mr = mh.collect()[0]
dt = time.perf_counter() - t0
print(json.dumps({"wid": wid, "sec": round(dt, 2), "verdicts": 0, "tiles": 0, "pairs": mr["n"]}))
'''

WORKER = WORKER_LINT if WORKLOAD == "lint" else WORKER_MINHASH


def run_level(n_execs: int) -> dict:
    files = sorted(glob.glob(os.path.join(DATA, "*.parquet")))
    assert len(files) >= n_execs, "not enough input files to shard"
    shards = [files[i::n_execs] for i in range(n_execs)]
    bdir = tempfile.mkdtemp(prefix="barrier_")
    worker_code = WORKER.replace("WIKIPATH", f"{DATA}_wiki").replace("WDPATH", f"{DATA}_wd")
    procs = []
    for i, shard in enumerate(shards):
        sf = os.path.join(bdir, f"shard_{i}.json")
        json.dump(shard, open(sf, "w"))
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", worker_code, sf, bdir, str(i), str(EXEC_CORES)],
                stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL,
                text=True,
            )
        )
    while sum(os.path.exists(os.path.join(bdir, f"ready_{i}")) for i in range(n_execs)) < n_execs:
        time.sleep(0.2)
        for p in procs:
            if p.poll() not in (None,):
                raise RuntimeError("worker died before barrier")
    open(os.path.join(bdir, "go"), "w").write("1")
    t0 = time.perf_counter()
    results = []
    for p in procs:
        out, _ = p.communicate()
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))
    wall = time.perf_counter() - t0
    total_verdicts = sum(r["verdicts"] for r in results)
    return {
        "executors": n_execs,
        "cores": n_execs * EXEC_CORES,
        "wall_sec": round(wall, 2),
        "max_worker_sec": max(r["sec"] for r in results),
        "docs_per_sec": round(N_DOCS / wall, 1),
        "verdicts": total_verdicts,
        "pairs": sum(r.get("pairs", 0) for r in results),
    }


def main():
    if not os.path.exists(os.path.join(DATA, "_SUCCESS")):
        raise SystemExit(f"corpus missing: run scripts/scaling_bench.py once first ({DATA})")
    lo = run_level(LO)
    hi = run_level(HI)
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (HI / LO)
    print(
        json.dumps(
            {
                "mode": "multi-process executors",
                "workload": WORKLOAD,
                "n_docs": N_DOCS,
                "exec_cores": EXEC_CORES,
                "lo": lo,
                "hi": hi,
                "scaling_factor": HI / LO,
                "efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
