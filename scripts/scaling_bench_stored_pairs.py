"""Same-input thread-scaling for the STORED-signature pair-generation
dataflow (round 6).

The r6 topology: MinHash signatures are written ONCE at ingest
(`dedup.minhash_sig_table` shape: doc_id, shingles_h, sig_0..7) and
pair generation reads the stored table — scan → per-row band-key md5 →
explode ×4 → ONE global band-key shuffle self-join → inline exact
hashed-shingle Jaccard → distinct. Distinct from the recompute minhash
class because there is NO text column and NO shingle derivation: the
dataflow is scan-bandwidth + shuffle + integer set intersection, i.e.
the steady-state shape a 100 TB dedup service actually runs per pass.

Prep (untimed, once per corpus size): synthesize the text corpus
(`synth.texts_range_df` — planted exact dups every 5th doc, mutated
every 7th, linear pair counts) and write its signature table. Both
levels then read the SAME stored files and do byte-identical work.

Usage: python scripts/scaling_bench_stored_pairs.py [n_docs] [lo] [hi]
"""

import json
import os
import subprocess
import sys

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
LO = int(sys.argv[2]) if len(sys.argv) > 2 else 4
HI = int(sys.argv[3]) if len(sys.argv) > 3 else 16
SIGS = f"/tmp/scaling_stored_sigs_{N_DOCS}"

GEN = """
import sys; sys.path.insert(0, "/root/repo")
from serbian_osm_lint_spark import synth
from serbian_osm_lint_spark.operators import dedup
from serbian_osm_lint_spark.session import get_spark
spark = get_spark("gen-sigs", cpus=16)
spark.sparkContext.setLogLevel("ERROR")
texts = synth.texts_range_df(spark, NDOCS, partitions=128)
dedup._shingled_sig_from(texts).write.mode("overwrite").parquet("SIGSPATH")
print("wrote SIGSPATH")
"""

RUN = """
import json, sys, time; sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from serbian_osm_lint_spark.operators import dedup
from serbian_osm_lint_spark.session import get_spark
spark = get_spark("scale-stored", cpus=CPUS, emulate_executors=True)
spark.sparkContext.setLogLevel("ERROR")

def build(df):
    pairs = dedup.verified_pairs_skinny_fetch(df, dedup.JACCARD_THRESHOLD)
    return pairs.agg(F.count("*").alias("n"), F.sum("jaccard").alias("js"))

build(spark.read.parquet("SIGSPATH")).collect()   # FULL warm pass (JIT + cache)
job = build(spark.read.parquet("SIGSPATH"))       # fresh full plan
t0 = time.perf_counter()
r = job.collect()[0]
sec = time.perf_counter() - t0
print(json.dumps({"cpus": CPUS, "sec": round(sec, 2),
    "docs_per_sec": round(NDOCS / sec, 1), "pairs": r["n"]}))
"""


def run_level(cpus: int) -> dict:
    # flush dirty pages first: a prior corpus write still flushing from
    # the page cache stalls this level's shuffle writes (measured: the
    # same hi level read 14.7 s on a settled box and 100 s mid-writeback)
    subprocess.run(["sync"], check=False)
    code = RUN.replace("CPUS", str(cpus)).replace("SIGSPATH", SIGS).replace(
        "NDOCS", str(N_DOCS)
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"level cpus={cpus} failed (rc={out.returncode})")
    return json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])


def main():
    if not os.path.exists(os.path.join(SIGS, "_SUCCESS")):
        code = GEN.replace("NDOCS", str(N_DOCS)).replace("SIGSPATH", SIGS)
        out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-4000:])
            raise SystemExit("signature-table prep failed")
    lo = run_level(LO)
    hi = run_level(HI)
    assert lo["pairs"] == hi["pairs"], (lo, hi)  # byte-identical work
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (HI / LO)
    print(
        json.dumps(
            {
                "mode": "single-JVM threads (same stored input, identical work)",
                "workload": "stored-signature pair generation",
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
