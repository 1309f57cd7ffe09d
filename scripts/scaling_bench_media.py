"""Same-input thread-scaling for the mapInPandas (Arrow) media workload.

Completes the scaling portfolio's dataflow classes: broadcast-only
(lint), one-shuffle (minhash banding), iterative multi-round (CC), and
now Arrow-batched Python workers (mapInPandas media feature extraction —
the modality-stage shape for a 100 TB corpus). The job is shuffle-free
by construction (plan-asserted in tests/test_plan_shape.py), so scaling
is bounded only by Python-worker fan-out — the class where local[N]
thread scaling is the most cluster-faithful, because each Spark task
gets its own Python worker process exactly as it would per executor
core on a real cluster.

Corpus: (doc_id, media_ref, payload) rows, generated natively; every
4th payload is a REAL 16x16 PNG (exercising the header-parse decode
path), the rest are utf-8 refs on the md5 stub path. Identical input
files and byte-identical output at both levels.

Usage: python scripts/scaling_bench_media.py [n_rows] [lo] [hi]
"""

import json
import os
import subprocess
import sys

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
LO = int(sys.argv[2]) if len(sys.argv) > 2 else 4
HI = int(sys.argv[3]) if len(sys.argv) > 3 else 16
CORPUS = f"/tmp/scaling_media_{N_ROWS}"

GEN = """
import sys; sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from serbian_osm_lint_spark.session import get_spark
sys.path.insert(0, "/root/repo/tests")
from test_dedup_text import _make_png
spark = get_spark("gen-media", cpus=16)
spark.sparkContext.setLogLevel("ERROR")
png = _make_png(16, 16)
df = (
    spark.range(NROWS)
    .withColumn("doc_id", F.concat(F.lit("d"), F.col("id").cast("string")))
    .withColumn("media_ref", F.concat(F.lit("img/n"), F.col("id").cast("string")))
    .withColumn(
        "payload",
        F.when(F.col("id") % 4 == 0, F.lit(bytearray(png)))
        .otherwise(F.encode(F.col("media_ref"), "utf-8")),
    )
    .drop("id")
)
df.repartition(128).write.mode("overwrite").parquet("CORPUSPATH")
print("wrote CORPUSPATH")
"""

RUN = """
import glob, json, sys, time; sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from serbian_osm_lint_spark.session import get_spark
from serbian_osm_lint_spark.operators import media
spark = get_spark("scale-media", cpus=CPUS, emulate_executors=True)
spark.sparkContext.setLogLevel("ERROR")

def build(df):
    return media.media_features_from(df).agg(
        F.count("*").alias("n"), F.sum("width").alias("ws"),
        F.sum(F.round(F.col("feature_0") * 1e6).cast("long")).alias("fs"))

files = sorted(glob.glob("CORPUSPATH/*.parquet"))
build(spark.read.parquet(*files[:8])).collect()   # JIT/worker-pool prime subset
job = build(spark.read.parquet("CORPUSPATH"))     # fresh full plan
t0 = time.perf_counter()
r = job.collect()[0]
sec = time.perf_counter() - t0
print(json.dumps({"cpus": CPUS, "sec": round(sec, 2),
    "rows_per_sec": round(NROWS / sec, 1),
    "n": r["n"], "width_sum": r["ws"], "feat_sum": r["fs"]}))
"""


def run_level(cpus: int) -> dict:
    code = RUN.replace("CPUS", str(cpus)).replace("CORPUSPATH", CORPUS).replace(
        "NROWS", str(N_ROWS)
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"level cpus={cpus} failed (rc={out.returncode})")
    return json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])


def main():
    if not os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        code = GEN.replace("NROWS", str(N_ROWS)).replace("CORPUSPATH", CORPUS)
        out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-4000:])
            raise SystemExit("corpus generation failed")
    lo = run_level(LO)
    hi = run_level(HI)
    assert (lo["n"], lo["width_sum"], lo["feat_sum"]) == (
        hi["n"], hi["width_sum"], hi["feat_sum"]
    ), "outputs differ between levels"
    eff = (hi["rows_per_sec"] / lo["rows_per_sec"]) / (HI / LO)
    print(
        json.dumps(
            {
                "mode": "single-JVM threads (same input, identical work)",
                "workload": "media mapInPandas (Arrow python workers, 1/4 real PNG decode)",
                "n_rows": N_ROWS,
                "lo": lo,
                "hi": hi,
                "scaling_factor": HI / LO,
                "efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
