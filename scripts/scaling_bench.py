"""Two-parallelism scaling evidence (sandbox proxy for N vs 4N executors).

Materializes corpora once (untimed), then runs TWO workloads in a fresh
executor-emulated JVM per parallelism level and reports docs/sec at each
plus efficiency = (docs_per_sec_hi / docs_per_sec_lo) / (hi / lo):

  * lint    — the BASELINE.json headline (verdicts + tile assignments):
              broadcast-joins only, no shuffle before the final agg;
  * minhash — MinHash-LSH near-dup pairs end-to-end (signatures, band
              explode, band-bucket self-join, exact-Jaccard verify,
              distinct): a genuinely shuffle-bearing workload, so the
              scaling claim covers data motion, not only map-side work.

Usage: python scripts/scaling_bench.py [n_docs] [lo] [hi] [n_texts]
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
N_TEXTS = int(sys.argv[4]) if len(sys.argv) > 4 else max(N_DOCS // 4, 1_000_000)
DATA = os.environ.get("SCALING_DATA", f"/tmp/scaling_docs_{N_DOCS}")
TEXTS = f"/tmp/scaling_texts_{N_TEXTS}"

PREP = f"""
import sys; sys.path.insert(0, "/root/repo")
from serbian_osm_lint_spark.session import get_spark
from serbian_osm_lint_spark import synth
spark = get_spark("prep", cpus={HI})
spark.sparkContext.setLogLevel("ERROR")
import os
if not os.path.exists("{DATA}/_SUCCESS"):
    synth.docs_range_df(spark, {N_DOCS}, 128).write.mode("overwrite").parquet("{DATA}")
# dims are tiny and schema-coupled to the engine — always regenerate
synth.wiki_pages_df(spark, "/root/testdata/sf0.01").write.mode("overwrite").parquet("{DATA}_wiki")
synth.wikidata_items_df(spark, "/root/testdata/sf0.01").write.mode("overwrite").parquet("{DATA}_wd")
if not os.path.exists("{TEXTS}/_SUCCESS"):
    synth.texts_range_df(spark, {N_TEXTS}, 128).write.mode("overwrite").parquet("{TEXTS}")
print("prep done", spark.read.parquet("{DATA}").count(), spark.read.parquet("{TEXTS}").count())
"""

RUN = """
import sys, time, json; sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from serbian_osm_lint_spark.session import get_spark
from serbian_osm_lint_spark.operators import checks, dedup, spatial
spark = get_spark("scale", cpus=CPUS, emulate_executors=True)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet("DATA")
wiki = spark.read.parquet("DATA_wiki")
wd = spark.read.parquet("DATA_wd")
texts = spark.read.parquet("TEXTSPATH")
docs.limit(10).count()  # JVM warm-up

# Forcing full materialization via consuming aggregates. Warm-up uses a
# FRESH identical plan (JIT + page cache warm) — re-collecting the same
# DataFrame would silently reuse its shuffle map outputs and time only
# the final reduce. The timed run pays planning once too; corpora are
# sized so execution dominates.
def build_lint():
    v = checks.lint_verdicts_df(spark, docs, wiki, wd).agg(
        F.count("*").alias("n"), F.sum(F.length("message")).alias("mb"),
        F.sum(F.length("check_name")).alias("cb"))
    t = spatial.tile_assignment_df(spark, docs).agg(
        F.count("*").alias("n"), F.sum(F.length("tile_id")).alias("tb"))
    return v, t

def build_minhash():
    return dedup.lsh_verified_pairs_from(texts).agg(
        F.count("*").alias("n"), F.sum("jaccard").alias("js"))

wv, wt = build_lint(); wv.collect(); wt.collect()  # warm-up
v, t = build_lint()
t0 = time.perf_counter()
vr = v.collect()[0]; tr = t.collect()[0]
lint_sec = time.perf_counter() - t0

build_minhash().collect()  # warm-up
mh = build_minhash()
t0 = time.perf_counter()
mr = mh.collect()[0]
mh_sec = time.perf_counter() - t0

print(json.dumps({"cpus": CPUS,
    "lint": {"sec": round(lint_sec, 2), "docs_per_sec": round(NDOCS / lint_sec, 1),
             "verdicts": vr["n"], "tiles": tr["n"]},
    "minhash": {"sec": round(mh_sec, 2), "docs_per_sec": round(NTEXTS / mh_sec, 1),
                "pairs": mr["n"]}}))
"""


def run_level(cpus: int) -> dict:
    code = (
        RUN.replace("CPUS", str(cpus))
        .replace("DATA_wiki", f"{DATA}_wiki")
        .replace("DATA_wd", f"{DATA}_wd")
        .replace("DATA", DATA)
        .replace("TEXTSPATH", TEXTS)
        .replace("NDOCS", str(N_DOCS))
        .replace("NTEXTS", str(N_TEXTS))
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"level cpus={cpus} failed (rc={out.returncode})")
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    # PREP always runs: it skips existing heavy corpora itself, and
    # regenerates the tiny engine-schema-coupled dims unconditionally.
    subprocess.run([sys.executable, "-c", PREP], check=True)
    lo = run_level(LO)
    hi = run_level(HI)

    def eff(w):
        return round((hi[w]["docs_per_sec"] / lo[w]["docs_per_sec"]) / (HI / LO), 3)

    print(
        json.dumps(
            {
                "n_docs": N_DOCS,
                "n_texts": N_TEXTS,
                "lo": lo,
                "hi": hi,
                "scaling_factor": HI / LO,
                "efficiency": {"lint": eff("lint"), "minhash": eff("minhash")},
            }
        )
    )


if __name__ == "__main__":
    main()
