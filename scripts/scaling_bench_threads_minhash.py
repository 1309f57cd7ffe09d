"""Same-input thread-scaling for the shuffle-bearing MinHash workload.

The north-rule two-parallelism evidence on ONE input: the identical
MinHash-LSH job (signatures → band explode → global band-bucket
self-join → exact-Jaccard verify → distinct) over the SAME text corpus
at local[lo] and local[hi], executor-emulated JVMs
(-XX:ActiveProcessorCount + proportional heap) — unlike the
multi-process harness there is no per-executor sharding, so both levels
do byte-identical work (same global shuffle, same pair count).

Warm-up = a JIT-priming pass over the first 8 of the corpus' 128 files
(a full warm pass would double an hour-long lo level); the timed pass
carries a few seconds of residual JIT ramp. That fixed ramp is a larger
FRACTION of the short hi run than of the long lo run, so it understates
hi throughput more — the reported efficiency is conservative. Page
cache is primed by the corpus write/prior runs.

Usage: python scripts/scaling_bench_threads_minhash.py [n_texts] [lo] [hi]
"""

import json
import os
import subprocess
import sys

N_TEXTS = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
LO = int(sys.argv[2]) if len(sys.argv) > 2 else 4
HI = int(sys.argv[3]) if len(sys.argv) > 3 else 16
TEXTS = f"/tmp/scaling_texts_{N_TEXTS}"

RUN = """
import glob, json, sys, time; sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from serbian_osm_lint_spark.session import get_spark
from serbian_osm_lint_spark.operators import dedup
spark = get_spark("scale-mh", cpus=CPUS, emulate_executors=True)
spark.sparkContext.setLogLevel("ERROR")

def build(df):
    return dedup.lsh_verified_pairs_from(df).agg(
        F.count("*").alias("n"), F.sum("jaccard").alias("js"))

files = sorted(glob.glob("TEXTSPATH/*.parquet"))
build(spark.read.parquet(*files[:8])).collect()   # JIT-prime subset
mh = build(spark.read.parquet("TEXTSPATH"))       # fresh full plan
t0 = time.perf_counter()
mr = mh.collect()[0]
sec = time.perf_counter() - t0
print(json.dumps({"cpus": CPUS, "sec": round(sec, 2),
    "docs_per_sec": round(NTEXTS / sec, 1), "pairs": mr["n"]}))
"""


def run_level(cpus: int) -> dict:
    code = RUN.replace("CPUS", str(cpus)).replace("TEXTSPATH", TEXTS).replace(
        "NTEXTS", str(N_TEXTS)
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"level cpus={cpus} failed (rc={out.returncode})")
    return json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])


def main():
    if not os.path.exists(os.path.join(TEXTS, "_SUCCESS")):
        raise SystemExit(f"corpus missing: {TEXTS}")
    lo = run_level(LO)
    hi = run_level(HI)
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (HI / LO)
    print(
        json.dumps(
            {
                "mode": "single-JVM threads (same input, identical work)",
                "workload": "minhash",
                "n_texts": N_TEXTS,
                "lo": lo,
                "hi": hi,
                "scaling_factor": HI / LO,
                "efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
