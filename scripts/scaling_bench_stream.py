"""Same-input thread-scaling for the Structured Streaming execution mode.

The portfolio's batch rows prove the dataflow classes scale; this run
proves the STREAMING machinery (micro-batch planning, watermark state,
checkpoint commits, file-sink writes) adds no scaling pathology: the
windowed event aggregation (`operators/events.stream_events_windowed` —
watermark + append mode) runs as one AvailableNow pass over the same
event corpus at two parallelism levels, timed end-to-end including the
checkpoint and parquet sink.

Corpus: the as-of harness's synthetic events (reused if present).
Output equality is asserted via count + an order-insensitive hash over
the emitted windows.

Usage: python scripts/scaling_bench_stream.py [n_events] [lo] [hi]
"""

import json
import os
import shutil
import subprocess
import sys

N_EVENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
LO = int(sys.argv[2]) if len(sys.argv) > 2 else 4
HI = int(sys.argv[3]) if len(sys.argv) > 3 else 16
CORPUS = f"/tmp/scaling_asof_{N_EVENTS}"  # shared with scaling_bench_asof

RUN = """
import json, shutil, sys, time; sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from serbian_osm_lint_spark.operators import events
from serbian_osm_lint_spark.session import get_spark
spark = get_spark("scale-stream", cpus=CPUS, emulate_executors=True)
spark.sparkContext.setLogLevel("ERROR")

def one_pass(tag):
    out = f"/tmp/scale_stream_out_{CPUS}_{tag}"
    ckpt = f"/tmp/scale_stream_ckpt_{CPUS}_{tag}"
    for d in (out, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    t0 = time.perf_counter()
    events.stream_events_windowed(spark, "CORPUSPATH/events.parquet", out, ckpt)
    sec = time.perf_counter() - t0
    r = spark.read.parquet(out).agg(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64("window_start", "event_type", "n_events", "sum_value")).alias("h"),
    ).collect()[0]
    for d in (out, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    return sec, r["n"], r["h"]

one_pass("warm")  # JIT + page cache
sec, n, h = one_pass("timed")
print(json.dumps({"cpus": CPUS, "sec": round(sec, 2),
    "events_per_sec": round(NEVENTS / sec, 1), "n": n, "h": h}))
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
        # generate via the as-of harness's generator
        subprocess.run(
            [sys.executable, "scripts/scaling_bench_asof.py", str(N_EVENTS), "0", "0"],
            capture_output=True,
        )
    if not os.path.exists(os.path.join(CORPUS, "events.parquet", "_SUCCESS")):
        raise SystemExit("corpus generation failed (run scaling_bench_asof.py first)")
    lo = run_level(LO)
    hi = run_level(HI)
    assert (lo["n"], lo["h"]) == (hi["n"], hi["h"]), "outputs differ between levels"
    eff = (hi["events_per_sec"] / lo["events_per_sec"]) / (HI / LO)
    print(
        json.dumps(
            {
                "mode": "single-JVM threads (same input, identical work)",
                "workload": "Structured Streaming AvailableNow windowed agg "
                            "(watermark + checkpoint + parquet sink)",
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
