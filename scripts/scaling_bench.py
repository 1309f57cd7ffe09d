"""Two-parallelism scaling evidence (sandbox proxy for N vs 4N executors).

Materializes an N_DOCS corpus once (untimed), then runs the headline
workload (lint verdicts + tile assignments over the stored table) in a
fresh JVM per parallelism level and reports docs/sec at each plus
efficiency = (docs_per_sec_hi / docs_per_sec_lo) / (hi / lo).

Usage: python scripts/scaling_bench.py [n_docs] [lo] [hi]
Appends a machine-readable line to stdout; BENCH/BASELINE.md is written
by hand from the output.
"""

import json
import os
import subprocess
import sys

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
LO = int(sys.argv[2]) if len(sys.argv) > 2 else 8
HI = int(sys.argv[3]) if len(sys.argv) > 3 else 32
DATA = os.environ.get("SCALING_DATA", f"/tmp/scaling_docs_{N_DOCS}")

PREP = f"""
import sys; sys.path.insert(0, "/root/repo")
from serbian_osm_lint_spark.session import get_spark
from serbian_osm_lint_spark import synth
spark = get_spark("prep", cpus={HI})
spark.sparkContext.setLogLevel("ERROR")
synth.docs_range_df(spark, {N_DOCS}, 128).write.mode("overwrite").parquet("{DATA}")
synth.wiki_pages_df(spark, "/root/testdata/sf0.01").write.mode("overwrite").parquet("{DATA}_wiki")
synth.wikidata_items_df(spark, "/root/testdata/sf0.01").write.mode("overwrite").parquet("{DATA}_wd")
print("prep done", spark.read.parquet("{DATA}").count())
"""

RUN = """
import sys, time, json; sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from serbian_osm_lint_spark.session import get_spark
from serbian_osm_lint_spark.operators import checks, spatial
spark = get_spark("scale", cpus=CPUS, emulate_executors=True)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet("DATA")
wiki = spark.read.parquet("DATA_wiki")
wd = spark.read.parquet("DATA_wd")
docs.limit(10).count()  # JVM warm-up

# Forcing full verdict / message / tile materialization via consuming
# aggregates. Warm-up uses a FRESH identical plan (JIT + page cache warm)
# — re-collecting the same DataFrame would silently reuse its shuffle map
# outputs and time only the final reduce. The timed run pays planning
# once too; corpus is sized so execution dominates (planning amortizes to
# zero over a 10^12-doc run).
def build():
    v = checks.lint_verdicts_df(spark, docs, wiki, wd).agg(
        F.count("*").alias("n"), F.sum(F.length("message")).alias("mb"),
        F.sum(F.length("check_name")).alias("cb"))
    t = spatial.tile_assignment_df(spark, docs).agg(
        F.count("*").alias("n"), F.sum(F.length("tile_id")).alias("tb"))
    return v, t
wv, wt = build()
wv.collect(); wt.collect()  # warm-up
v, t = build()
t0 = time.perf_counter()
vr = v.collect()[0]
tr = t.collect()[0]
dt = time.perf_counter() - t0
n_docs = NDOCS
print(json.dumps({"cpus": CPUS, "sec": round(dt, 2),
                  "docs_per_sec": round(n_docs / dt, 1),
                  "verdicts": vr["n"], "tiles": tr["n"]}))
"""


def run_level(cpus: int) -> dict:
    code = (
        RUN.replace("CPUS", str(cpus))
        .replace("DATA_wiki", f"{DATA}_wiki")
        .replace("DATA_wd", f"{DATA}_wd")
        .replace("DATA", DATA)
        .replace("NDOCS", str(N_DOCS))
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    if not os.path.exists(os.path.join(DATA, "_SUCCESS")):
        subprocess.run([sys.executable, "-c", PREP], check=True)
    lo = run_level(LO)
    hi = run_level(HI)
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (HI / LO)
    print(
        json.dumps(
            {
                "n_docs": N_DOCS,
                "lo": lo,
                "hi": hi,
                "scaling_factor": HI / LO,
                "efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
