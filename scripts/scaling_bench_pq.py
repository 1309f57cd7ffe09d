"""Same-input thread-scaling for the STORED-code PQ/ADC ANN pass (round 7).

The r7 topology: corpus vectors are product-quantized ONCE at ingest
(`similarity.pq_code_table` shape: vec_id, codes[8], vnorm — no vector
column) and the per-query-set pass is: skinny code-table scan → ADC
scoring against 20 broadcast per-query LUTs (8 array lookups/row, zero
vector math) → per-query top-50 window → by-id vector fetch → exact
cosine re-rank. The dataflow a 10^10-vector ANN service runs per query
batch: scan-bandwidth + broadcast + window, no shuffle of vectors.

Prep (untimed, once per corpus size): synthesize the embeddings corpus
(same xxhash64 generator as scripts/bench_100x.py) and encode its code
table. Both levels then read the SAME stored files and do byte-identical
work (asserted on the result checksum).

Usage: python scripts/scaling_bench_pq.py [n_vecs] [lo] [hi]
"""

import json
import os
import subprocess
import sys

N_VECS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
LO = int(sys.argv[2]) if len(sys.argv) > 2 else 8
HI = int(sys.argv[3]) if len(sys.argv) > 3 else 32
DIR = f"/tmp/scaling_pq_{N_VECS}"

GEN = """
import sys; sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from serbian_osm_lint_spark.operators import similarity
from serbian_osm_lint_spark.session import get_spark
spark = get_spark("gen-pq", cpus=16)
spark.sparkContext.setLogLevel("ERROR")
emb = spark.range(0, NVECS, 1, 64).select(
    F.col("id").alias("vec_id"),
    F.transform(
        F.sequence(F.lit(1), F.lit(similarity.EMB_DIM)),
        lambda i: (
            (F.pmod(F.xxhash64(F.col("id") * 131 + i.cast("long")), F.lit(2000)) - 1000)
            / 1000.0
        ).cast("float"),
    ).alias("embedding"),
    F.pmod(F.col("id"), F.lit(10)).cast("int").alias("label"),
)
emb.write.mode("overwrite").parquet("DIRPATH/embeddings.parquet")
similarity.pq_code_table(spark, "DIRPATH")  # encode once, untimed
print("wrote DIRPATH")
"""

RUN = """
import json, sys, time; sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from serbian_osm_lint_spark.operators import similarity
from serbian_osm_lint_spark.session import get_spark
spark = get_spark("scale-pq", cpus=CPUS, emulate_executors=True)
spark.sparkContext.setLogLevel("ERROR")

def build():
    topk = similarity.ann_pq_topk_stored_df(spark, "DIRPATH")
    return topk.agg(
        F.count("*").alias("n"), F.round(F.sum("cosine"), 6).alias("cs")
    )

build().collect()          # FULL warm pass (JIT + codebook memo + cache)
job = build()              # fresh full plan
t0 = time.perf_counter()
r = job.collect()[0]
sec = time.perf_counter() - t0
print(json.dumps({"cpus": CPUS, "sec": round(sec, 2),
    "vecs_per_sec": round(NVECS / sec, 1), "rows": r["n"], "checksum": r["cs"]}))
"""


def run_level(cpus: int) -> dict:
    subprocess.run(["sync"], check=False)  # see scaling_bench_stored_pairs
    code = RUN.replace("CPUS", str(cpus)).replace("DIRPATH", DIR).replace(
        "NVECS", str(N_VECS)
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"level cpus={cpus} failed (rc={out.returncode})")
    return json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])


def main():
    if not os.path.exists(os.path.join(DIR, "embeddings.parquet", "_SUCCESS")):
        code = GEN.replace("NVECS", str(N_VECS)).replace("DIRPATH", DIR)
        out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-4000:])
            raise SystemExit("PQ corpus/code-table prep failed")
    lo = run_level(LO)
    hi = run_level(HI)
    assert (lo["rows"], lo["checksum"]) == (hi["rows"], hi["checksum"]), (lo, hi)
    eff = (hi["vecs_per_sec"] / lo["vecs_per_sec"]) / (HI / LO)
    print(
        json.dumps(
            {
                "mode": "single-JVM threads (same stored input, identical work)",
                "workload": "stored-code PQ/ADC top-k (20-query batch)",
                "n_vecs": N_VECS,
                "lo": lo,
                "hi": hi,
                "scaling_factor": HI / LO,
                "efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
