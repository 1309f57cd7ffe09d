"""Same-input thread-scaling for the windowed-merge (as-of join) workload.

Fifth dataflow class in the scaling portfolio: one shuffle on user_id
followed by a per-user SORT + window pass (the union-merge as-of join —
`operators/events.asof_join_df`). Distinct from the minhash class
because the post-shuffle cost is dominated by sorting and running-state
window evaluation rather than hash joins.

Corpus: N synthetic events over N/64 users (clicks/views/errors
interleaved by id, microsecond-spaced timestamps), generated natively.
Identical input files and byte-identical consuming aggregates at both
levels.

Usage: python scripts/scaling_bench_asof.py [n_events] [lo] [hi]
"""

import json
import os
import subprocess
import sys

N_EVENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
LO = int(sys.argv[2]) if len(sys.argv) > 2 else 4
HI = int(sys.argv[3]) if len(sys.argv) > 3 else 16
CORPUS = f"/tmp/scaling_asof_{N_EVENTS}"

GEN = """
import sys; sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from serbian_osm_lint_spark.session import get_spark
spark = get_spark("gen-asof", cpus=16)
spark.sparkContext.setLogLevel("ERROR")
n_users = max(NEVENTS // 64, 1)
df = (
    spark.range(NEVENTS)
    .withColumn("event_id", F.col("id"))
    .withColumn("user_id", F.col("id") % n_users)
    # per-user strictly increasing, globally interleaved timestamps
    .withColumn(
        "ts",
        F.timestamp_micros(
            F.lit(1704067200000000) + F.col("id") * 1357 + (F.col("id") % 97) * 1000003
        ).cast("timestamp_ntz"),
    )
    .withColumn(
        "event_type",
        F.element_at(F.array(F.lit("click"), F.lit("view"), F.lit("error")),
                     (F.col("id") % 3 + 1).cast("int")),
    )
    .withColumn("value", F.round((F.col("id") % 1000) / 10.0, 2))
    .withColumn("props", F.lit("{}"))
    .select("event_id", "ts", "user_id", "event_type", "value", "props")
)
df.repartition(128).write.mode("overwrite").parquet("CORPUSPATH/events.parquet")
print("wrote CORPUSPATH")
"""

RUN = """
import glob, json, sys, time; sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from serbian_osm_lint_spark.session import get_spark
from serbian_osm_lint_spark.operators import events
spark = get_spark("scale-asof", cpus=CPUS, emulate_executors=True)
spark.sparkContext.setLogLevel("ERROR")

def build(sf_dir):
    return events.asof_join_df(spark, sf_dir).agg(
        F.count("*").alias("n"),
        F.sum("asof_event_id").alias("s"),
        F.bit_xor(F.xxhash64("event_id", "asof_event_id")).alias("h"))

# JIT-prime on a subset dir is impractical for a dir-based reader; one
# full warm pass primes JIT + page cache, then a fresh plan is timed.
build("CORPUSPATH").collect()
job = build("CORPUSPATH")
t0 = time.perf_counter()
r = job.collect()[0]
sec = time.perf_counter() - t0
print(json.dumps({"cpus": CPUS, "sec": round(sec, 2),
    "events_per_sec": round(NEVENTS / sec, 1),
    "n": r["n"], "s": r["s"], "h": r["h"]}))
"""


def run_level(cpus: int) -> dict:
    code = RUN.replace("CPUS", str(cpus)).replace("CORPUSPATH", CORPUS).replace(
        "NEVENTS", str(N_EVENTS)
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"level cpus={cpus} failed (rc={out.returncode})")
    return json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])


def main():
    if not os.path.exists(os.path.join(CORPUS, "events.parquet", "_SUCCESS")):
        code = GEN.replace("NEVENTS", str(N_EVENTS)).replace("CORPUSPATH", CORPUS)
        out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-4000:])
            raise SystemExit("corpus generation failed")
    lo = run_level(LO)
    hi = run_level(HI)
    assert (lo["n"], lo["s"], lo["h"]) == (hi["n"], hi["s"], hi["h"]), (
        "outputs differ between levels"
    )
    eff = (hi["events_per_sec"] / lo["events_per_sec"]) / (HI / LO)
    print(
        json.dumps(
            {
                "mode": "single-JVM threads (same input, identical work)",
                "workload": "as-of join (shuffle + per-user sort + window merge)",
                "n_events": N_EVENTS,
                "lo": lo,
                "hi": hi,
                "scaling_factor": HI / LO,
                "efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
