"""Scaling-efficiency benchmark: the same sketch job at two parallelism
levels (local[8] vs local[32] — the sandbox proxy for N vs 4N executors, per
BASELINE.md), reporting throughput at both and efficiency = speedup / 4.

Run:  python scaling_bench.py [--turns 20000000]
Each measurement runs in a fresh subprocess (own JVM) with one warm-up
execution followed by the median of 3 timed executions over a pre-
materialized parquet table, so JVM/codegen startup never pollutes the
timings.  Results go to stdout (JSON) and are appended to BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))

_RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from sketches_go_spark.plans.session import get_spark
from sketches_go_spark.core.ddsketch import DDSketchConfig
from sketches_go_spark.functions import ddsketch_fns as dd

cores = {cores}
spark = get_spark(cores=cores, shuffle_partitions=2 * cores, app_name=f"sgs-scale-{{cores}}")
spark.sparkContext.setLogLevel("ERROR")
synth = spark.read.parquet({cache!r})
cfg = DDSketchConfig(alpha=0.01)

def job():
    src = synth.select("role", "tool", F.length("text").cast("double").alias("v"))
    return dd.ddsketch_quantiles_relational(
        src, "v", ["role", "tool"], (0.5, 0.95, 0.99), cfg
    ).count()

job()  # warm-up (codegen + page cache)
times = []
for _ in range(3):
    t0 = time.perf_counter()
    job()
    times.append(time.perf_counter() - t0)
print("RESULT " + json.dumps({{"cores": cores, "times": times}}))
spark.stop()
"""


def materialize(turns: int) -> str:
    cache = os.path.join(REPO, ".bench_cache", f"synth_{turns}.parquet")
    if os.path.exists(cache):
        return cache
    code = (
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "from sketches_go_spark.plans.session import get_spark\n"
        "from sketches_go_spark.sources.transcripts import synth_transcripts\n"
        "spark = get_spark(cores=32, shuffle_partitions=64)\n"
        f"synth_transcripts(spark, {turns}, with_text=True).write.mode('overwrite').parquet({cache!r})\n"
        "spark.stop()\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True)
    return cache


def measure(cores: int, cache: str, turns: int) -> dict:
    code = _RUNNER.format(repo=REPO, cores=cores, cache=cache)
    out = subprocess.run(
        [sys.executable, "-c", code], check=True, capture_output=True, text=True
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")][-1]
    rec = json.loads(line[len("RESULT "):])
    med = statistics.median(rec["times"])
    return {
        "cores": cores,
        "times_sec": [round(t, 3) for t in rec["times"]],
        "median_sec": round(med, 3),
        "turns_per_sec": round(turns / med),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=20_000_000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    args = ap.parse_args()

    cache = materialize(args.turns)
    low = measure(args.low, cache, args.turns)
    high = measure(args.high, cache, args.turns)
    speedup = low["median_sec"] / high["median_sec"]
    efficiency = speedup / (args.high / args.low)
    result = {
        "job": "ddsketch_quantiles_relational p50/p95/p99 of length(text) by (role, tool)",
        "turns": args.turns,
        "low": low,
        "high": high,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "target": 0.8,
    }
    print(json.dumps(result))

    stamp = (
        f"\n## Measured scaling run (scaling_bench.py, {args.turns:,} synthetic turns)\n\n"
        f"| parallelism | median sec (of 3, after warm-up) | turns/sec |\n|---|---|---|\n"
        f"| local[{args.low}] | {low['median_sec']} | {low['turns_per_sec']:,} |\n"
        f"| local[{args.high}] | {high['median_sec']} | {high['turns_per_sec']:,} |\n\n"
        f"Speedup {args.low}->{args.high} cores: **{speedup:.2f}x**; scaling efficiency "
        f"(speedup / {args.high // args.low}): **{efficiency:.3f}** (target >= 0.8).\n"
    )
    with open(os.path.join(REPO, "BASELINE.md"), "a") as f:
        f.write(stamp)


if __name__ == "__main__":
    main()
