"""Same-input thread-scaling for the decontamination (gram-join) workload.

Round-5 dataflow: per-row gram hashing (native md5 exprs, no UDF) →
explode → a DISTINCT over the holdout gram set → one equi-join on the
8-byte gram hash → per-doc count → left join back
(`operators/corpus.decontaminate_from`). Distinct from the minhash class
because the candidate side is produced by an aggregation (distinct)
feeding a join rather than a band-bucket self-join.

Corpus: `synth.texts_range_df` (24-word docs → 12 distinct 13-grams
each; every 5th doc repeats its predecessor, so the md5 content-hash
split yields real train↔holdout gram hits at every scale). Identical
input files and byte-identical consuming aggregates at both levels.

Usage: python scripts/scaling_bench_decontam.py [n_docs] [lo] [hi]
"""

import json
import os
import subprocess
import sys

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
LO = int(sys.argv[2]) if len(sys.argv) > 2 else 4
HI = int(sys.argv[3]) if len(sys.argv) > 3 else 16
CORPUS = f"/tmp/scaling_decontam_{N_DOCS}"

GEN = """
import sys; sys.path.insert(0, "/root/repo")
from serbian_osm_lint_spark import synth
from serbian_osm_lint_spark.session import get_spark
spark = get_spark("gen-decontam", cpus=16)
spark.sparkContext.setLogLevel("ERROR")
synth.texts_range_df(spark, NDOCS, partitions=128).write.mode(
    "overwrite").parquet("CORPUSPATH/texts.parquet")
print("wrote CORPUSPATH")
"""

RUN = """
import json, sys, time; sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from serbian_osm_lint_spark.operators import corpus
from serbian_osm_lint_spark.session import get_spark
spark = get_spark("scale-decontam", cpus=CPUS, emulate_executors=True)
spark.sparkContext.setLogLevel("ERROR")

def build():
    docs = spark.read.parquet("CORPUSPATH/texts.parquet")
    p = corpus.split_col(F.col("doc_id"))
    split = (F.when(p < corpus.TRAIN_PCT, F.lit("train"))
             .when(p < corpus.VAL_PCT, F.lit("val")).otherwise(F.lit("test")))
    flagged = corpus.decontaminate_from(
        docs.select("doc_id", "text", split.alias("split")))
    return flagged.agg(
        F.count("*").alias("n"),
        F.sum("n_contaminated_grams").alias("s"),
        F.bit_xor(F.xxhash64("doc_id", "n_contaminated_grams", "is_contaminated")).alias("h"))

build().collect()  # warm pass: JIT + page cache
job = build()      # fresh plan — no shuffle-output reuse
t0 = time.perf_counter()
r = job.collect()[0]
sec = time.perf_counter() - t0
print(json.dumps({"cpus": CPUS, "sec": round(sec, 2),
    "docs_per_sec": round(NDOCS / sec, 1),
    "n": r["n"], "s": r["s"], "h": r["h"]}))
"""


def run_level(cpus: int) -> dict:
    code = RUN.replace("CPUS", str(cpus)).replace("CORPUSPATH", CORPUS).replace(
        "NDOCS", str(N_DOCS)
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"level cpus={cpus} failed (rc={out.returncode})")
    return json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])


def main():
    if not os.path.exists(os.path.join(CORPUS, "texts.parquet", "_SUCCESS")):
        code = GEN.replace("NDOCS", str(N_DOCS)).replace("CORPUSPATH", CORPUS)
        out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-4000:])
            raise SystemExit("corpus generation failed")
    lo = run_level(LO)
    hi = run_level(HI)
    assert (lo["n"], lo["s"], lo["h"]) == (hi["n"], hi["s"], hi["h"]), (
        "outputs differ between levels"
    )
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (HI / LO)
    print(
        json.dumps(
            {
                "mode": "single-JVM threads (same input, identical work)",
                "workload": "decontamination (gram explode + distinct + equi-join + agg)",
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
