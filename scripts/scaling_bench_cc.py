"""Two-parallelism scaling evidence for the ITERATIVE workload class:
connected components (hook + pointer-jump), ~O(log n) rounds each doing
one edges⋈labels shuffle + one labels self-join + an eager checkpoint.

This is the workload shape the lint/minhash pairs don't cover: per-round
driver-coordinated jobs whose fixed costs (scheduling, convergence
count) do NOT parallelize — the honest question is whether per-round
WORK dominates enough at realistic graph sizes for efficiency ≥0.8.

Input graph (deterministic, spark.range): N nodes in clusters of 8
(star edges root→member), cluster roots chained in blocks of
CHAIN=512 → components of 4,096 nodes with diameter ~1,024, forcing
the full O(log n) round count (~12) instead of the shallow 2-3 rounds
of a near-dup corpus. Edge count ≈ N.

Usage: python scripts/scaling_bench_cc.py [n_nodes] [lo] [hi]
Same-input thread pair in executor-emulated JVMs; prints one JSON line.
"""

import json
import os
import subprocess
import sys

N_NODES = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
LO = int(sys.argv[2]) if len(sys.argv) > 2 else 4
HI = int(sys.argv[3]) if len(sys.argv) > 3 else 16
CHAIN = 512
DATA = f"/tmp/scaling_cc_{N_NODES}"

PREP = f"""
import sys; sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from serbian_osm_lint_spark.session import get_spark
spark = get_spark("prep-cc", cpus={HI})
spark.sparkContext.setLogLevel("ERROR")
import os
if not os.path.exists("{DATA}/_SUCCESS"):
    nodes = spark.range({N_NODES}).select(F.col("id"))
    stars = nodes.filter(F.col("id") % 8 != 0).select(
        (F.col("id") - F.col("id") % 8).alias("doc_id_a"), F.col("id").alias("doc_id_b"))
    roots = nodes.filter(F.col("id") % 8 == 0).select((F.col("id") / 8).cast("long").alias("k"))
    chains = roots.filter(F.col("k") % {CHAIN} != 0).select(
        ((F.col("k") - 1) * 8).alias("doc_id_a"), (F.col("k") * 8).alias("doc_id_b"))
    stars.unionByName(chains).repartition(128).write.mode("overwrite").parquet("{DATA}")
print("prep done", spark.read.parquet("{DATA}").count())
"""

RUN = """
import sys, time, json; sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from serbian_osm_lint_spark.session import get_spark
from serbian_osm_lint_spark.operators import dedup
spark = get_spark("scale-cc", cpus=CPUS, emulate_executors=True)
spark.sparkContext.setLogLevel("ERROR")
pairs = spark.read.parquet("DATA")
n_edges = pairs.count()  # also warms scan/page cache

def run_once():
    out, rounds = dedup._components_with_rounds(pairs)
    row = out.agg(F.count("*").alias("n"),
                  F.bit_xor(F.xxhash64("doc_id", "component_id")).alias("h")).collect()[0]
    return rounds, row["n"], row["h"]

run_once()  # warm-up: JIT + shuffle paths
t0 = time.perf_counter()
rounds, n, h = run_once()
sec = time.perf_counter() - t0
print(json.dumps({"cpus": CPUS, "sec": round(sec, 2), "rounds": rounds,
                  "edges_per_sec": round(n_edges / sec, 1), "nodes": n, "hash": h}))
"""


def run_level(cpus: int) -> dict:
    code = RUN.replace("CPUS", str(cpus)).replace("DATA", DATA)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"level cpus={cpus} failed (rc={out.returncode})")
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    subprocess.run([sys.executable, "-c", PREP], check=True)
    lo = run_level(LO)
    hi = run_level(HI)
    assert lo["hash"] == hi["hash"] and lo["nodes"] == hi["nodes"], "level outputs differ"
    eff = (hi["edges_per_sec"] / lo["edges_per_sec"]) / (HI / LO)
    print(json.dumps({
        "workload": "connected_components(hook+jump)",
        "n_nodes": N_NODES, "lo": lo, "hi": hi,
        "efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
