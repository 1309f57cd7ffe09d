"""Thread-scaling for Structured Streaming over a CPU-BOUND workload.

Companion to `scaling_bench_stream.py`: the windowed-agg streaming row is
scan-bandwidth-bound on this box (a 2-column agg over ~100 groups — adding
cores cannot speed a saturated parquet scan), so it measures memory
bandwidth, not the streaming machinery. This harness streams the LINT
pipeline (the BASELINE headline workload, 13 checks × 2 maps, proven
1.092-efficient in batch at the same corpus/levels) through
`streaming/stream.stream_lint_verdicts` — if the micro-batch layer
(checkpoint commits, sink file commits, planning) added a scaling
pathology, it would show against the known-good batch number.

Corpus: `synth.docs_range_df` at /tmp/scaling_docs_<N> (reused if
present; dims regenerated — they are tiny and schema-coupled).

Usage: python scripts/scaling_bench_stream_lint.py [n_docs] [lo] [hi]
"""

import json
import os
import subprocess
import sys

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
LO = int(sys.argv[2]) if len(sys.argv) > 2 else 4
HI = int(sys.argv[3]) if len(sys.argv) > 3 else 16
DATA = f"/tmp/scaling_docs_{N_DOCS}"

PREP = f"""
import sys; sys.path.insert(0, "/root/repo")
from serbian_osm_lint_spark.session import get_spark
from serbian_osm_lint_spark import synth
spark = get_spark("prep", cpus={HI})
spark.sparkContext.setLogLevel("ERROR")
import os
if not os.path.exists("{DATA}/_SUCCESS"):
    synth.docs_range_df(spark, {N_DOCS}, 128).write.mode("overwrite").parquet("{DATA}")
synth.wiki_pages_df(spark, "/root/testdata/sf0.01").write.mode("overwrite").parquet("{DATA}_wiki")
synth.wikidata_items_df(spark, "/root/testdata/sf0.01").write.mode("overwrite").parquet("{DATA}_wd")
print("prep done")
"""

RUN = """
import json, shutil, sys, time; sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from serbian_osm_lint_spark.session import get_spark
from serbian_osm_lint_spark.streaming import stream
spark = get_spark("scale-stream-lint", cpus=CPUS, emulate_executors=True)
spark.sparkContext.setLogLevel("ERROR")
wiki = spark.read.parquet("DATA_wiki")
wd = spark.read.parquet("DATA_wd")

def one_pass(tag):
    out = f"/tmp/scale_slint_out_{CPUS}_{tag}"
    ckpt = f"/tmp/scale_slint_ckpt_{CPUS}_{tag}"
    for d in (out, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    t0 = time.perf_counter()
    stream.stream_lint_verdicts(spark, "DATA", out, ckpt, wiki, wd)
    sec = time.perf_counter() - t0
    r = spark.read.parquet(out + "/verdicts").agg(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64("doc_id", "map_name", "check_name", "result")).alias("h"),
    ).collect()[0]
    for d in (out, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    return sec, r["n"], r["h"]

one_pass("warm")  # JIT + page cache
sec, n, h = one_pass("timed")
print(json.dumps({"cpus": CPUS, "sec": round(sec, 2),
    "docs_per_sec": round(NDOCS / sec, 1), "n": n, "h": h}))
"""


def run_level(cpus: int) -> dict:
    code = RUN.replace("CPUS", str(cpus)).replace("DATA", DATA).replace(
        "NDOCS", str(N_DOCS)
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"level cpus={cpus} failed (rc={out.returncode})")
    return json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])


def main():
    out = subprocess.run([sys.executable, "-c", PREP], capture_output=True, text=True)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit("corpus prep failed")
    lo = run_level(LO)
    hi = run_level(HI)
    assert (lo["n"], lo["h"]) == (hi["n"], hi["h"]), "outputs differ between levels"
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (HI / LO)
    print(
        json.dumps(
            {
                "mode": "single-JVM threads (same input, identical work)",
                "workload": "Structured Streaming lint pipeline "
                            "(foreachBatch, checkpoint + parquet sink)",
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
