"""Benchmark harness — prints ONE JSON line with per-query seconds.

Run:  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py

Headline queries: the driver-contract sketch queries at the given sf plus a
large synthetic transcripts sketch-build (the 100-TB proxy: generation is
pure Catalyst, so the measured cost is dominated by the sketch pipeline
itself).  The primary metric is wall seconds; `turns_per_sec` reports
sketch-build+merge throughput on the synthetic table per BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 10M amortizes the ~2s fixed job overhead that dominated at 5M — the
# headline turns_per_sec then reflects pipeline capacity, not job setup
SYNTH_TURNS = int(os.environ.get("SGS_BENCH_SYNTH_TURNS", "10000000"))
# two-parallelism scaling evidence (fresh JVM per level, after the main
# session stops); disable with SGS_BENCH_SCALING=0 for quick local loops.
# 100M turns matches the BASELINE.md protocol — smaller jobs are fixed-
# overhead-dominated and understate scaling
SCALING = os.environ.get("SGS_BENCH_SCALING", "1") == "1"
SCALING_TURNS = int(os.environ.get("SGS_BENCH_SCALING_TURNS", "100000000"))


def _prev_bench() -> dict:
    """Newest BENCH_r*.json in the repo — for machine-checkable per-query
    deltas round over round."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    best: tuple[int, str] | None = None
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            r = int(m.group(1))
            if best is None or r > best[0]:
                best = (r, path)
    if best is None:
        return {}
    try:
        with open(best[1]) as f:
            rec = json.load(f)
        parsed = rec.get("parsed", rec)
        return {"round": best[0], "queries": parsed.get("queries", {})}
    except Exception:
        return {}


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from sketches_go_spark.core.ddsketch import DDSketchConfig
    from sketches_go_spark.functions import ddsketch_fns as dd
    from sketches_go_spark.functions import sketch_fns as sk
    from sketches_go_spark.plans.session import get_spark
    from sketches_go_spark.sources.transcripts import synth_transcripts

    spark = get_spark(cores=CPUS, shuffle_partitions=2 * CPUS, app_name="sgs-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qfns = entry.queries()
    bench_queries = [
        "ddsketch_latency_by_tool",
        "ddsketch_bins_histogram",
        "ddsketch_udaf_textlen_by_role",
        "hll_distinct_convs_by_role",
        "cms_tool_counts",
        "bloom_probe_tools",
        "kll_latency_by_role",
        "tdigest_latency_by_role",
    ]

    def run(df) -> int:
        # count() forces full execution without driver-side materialization
        return df.count()

    timings: dict[str, float] = {}

    # warm-up (JVM + Arrow + Python workers — the UDAF query forks the
    # python worker pool, which otherwise bills its cold start to the first
    # timed mapInPandas stage)
    run(qfns["ddsketch_latency_by_tool"](spark, SF_DIR))
    run(qfns["ddsketch_udaf_textlen_by_role"](spark, SF_DIR))

    for name in bench_queries:
        t0 = time.perf_counter()
        run(qfns[name](spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)

    # ---- synthetic scale proxy: DDSketch build+merge over N turns ----------
    # Materialize the synthetic transcripts table once (generation cost is a
    # fixture concern, not engine throughput — mirrors reading a pre-existing
    # 100 TB table), then benchmark read -> sketch -> merge -> extract.
    cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".bench_cache",
        f"synth_{SYNTH_TURNS}.parquet",
    )
    if not os.path.exists(cache):
        synth_transcripts(spark, SYNTH_TURNS, with_text=True).write.mode(
            "overwrite"
        ).parquet(cache)
    synth = spark.read.parquet(cache)

    # synthetic stages: best of N (3 for the headline relational stage,
    # 2 for the others) — this host shows intermittent multi-x interference
    # and the estimator of uncontended capacity is min (BASELINE.md
    # measurement protocol); interference only slows runs down
    def best_of(n_runs: int, mk) -> float:
        best = float("inf")
        for _ in range(n_runs):
            t0 = time.perf_counter()
            run(mk())
            best = min(best, time.perf_counter() - t0)
        return best

    cfg = DDSketchConfig(alpha=0.01)
    src = synth.select("role", F.length("text").cast("double").alias("v"))
    dt = best_of(
        3,
        lambda: dd.ddsketch_quantiles_relational(
            src, "v", ["role"], (0.5, 0.95, 0.99), cfg
        ),
    )
    timings["synth_ddsketch_relational"] = round(dt, 3)
    turns_per_sec = SYNTH_TURNS / dt

    # the same build through the UDAF (sketch-value) path
    timings["synth_ddsketch_udaf"] = round(
        best_of(
            2,
            lambda: dd.with_quantiles(
                dd.ddsketch_agg(src, "v", ["role"], cfg), (0.5, 0.95, 0.99)
            ),
        ),
        3,
    )

    # UDAF blobs via the relational-bins build (strategy='bins': Arrow ships
    # groups x buckets rows, not raw rows)
    timings["synth_ddsketch_udaf_bins"] = round(
        best_of(
            2,
            lambda: dd.with_quantiles(
                dd.ddsketch_agg(src, "v", ["role"], cfg, strategy="bins"),
                (0.5, 0.95, 0.99),
            ),
        ),
        3,
    )

    # synthetic HLL (distinct convs over N turns)
    timings["synth_hll_relational"] = round(
        best_of(
            2,
            lambda: sk.hll_estimate_relational(
                synth.select("conv_id", "role"), "conv_id", ["role"], p=12
            ),
        ),
        3,
    )

    # high-cardinality companion UDAF: one HLL blob per conv_id (N/10 groups)
    # through the vectorized partial build + streaming merge
    timings["synth_hll_udaf_per_conv"] = round(
        best_of(
            2,
            lambda: sk.hll_agg(
                synth.select("conv_id", "tool"), "tool", ["conv_id"], p=6
            ),
        ),
        3,
    )

    # rank-sketch pipeline without the driver query's oracle-verification
    # join (kll_latency_by_role also pays an exact-rank check by design)
    from sketches_go_spark.core.kll import KLLSketch

    timings["synth_kll_udaf"] = round(
        best_of(
            2,
            lambda: sk.with_sketch_quantiles(
                sk.kll_agg(src, "v", ["role"], k=200),
                KLLSketch.from_bytes,
                [0.5, 0.95, 0.99],
            ),
        ),
        3,
    )

    # composite of per-query best-case timings (min-of-N for the synthetic
    # stages, single-shot for the sf queries) — a best-case estimate, not an
    # actual wall time
    total = round(sum(timings.values()), 3)
    spark.stop()

    prev = _prev_bench()
    delta_vs_prev = None
    if prev:
        delta_vs_prev = {
            name: round(t - prev["queries"][name], 3)
            for name, t in timings.items()
            if name in prev["queries"]
        }

    scaling = None
    if SCALING:
        # fresh JVM per level (the main session above is stopped) — the same
        # relational sketch job at local[8] vs local[32], evidencing the
        # north rule's N -> 4N criterion; full protocol in scaling_bench.py.
        # Each level is tagged with the hypervisor steal%% observed during
        # the run: this box is SHARED and intermittently oversubscribed
        # (see BASELINE.md "host capacity audit"), so any single round's
        # efficiency number must be read against its contamination tags.
        import scaling_bench as sb

        def _ticks():
            parts = open("/proc/stat").readline().split()
            vals = list(map(int, parts[1:]))
            return sum(vals), vals[7]

        def _measure_tagged(cores: int) -> dict:
            t0, s0 = _ticks()
            rec = sb.measure(cores, cache2, SCALING_TURNS, reps=3)
            t1, s1 = _ticks()
            rec["steal_pct"] = round(100.0 * (s1 - s0) / max(t1 - t0, 1), 2)
            return rec

        cache2 = sb.materialize(SCALING_TURNS)
        low = _measure_tagged(8)
        high = _measure_tagged(32)
        speedup = low["best_sec"] / high["best_sec"]
        scaling = {
            "turns": SCALING_TURNS,
            "local8_turns_per_sec": low["turns_per_sec"],
            "local8_steal_pct": low["steal_pct"],
            "local32_turns_per_sec": high["turns_per_sec"],
            "local32_steal_pct": high["steal_pct"],
            "speedup_8_to_32": round(speedup, 3),
            "efficiency": round(speedup / 4.0, 3),
            "target": 0.8,
            "caveat": "shared host; see BASELINE.md host-capacity audit",
        }

    print(
        json.dumps(
            {
                "metric": "headline sketch queries best-case time (sum of per-query minima)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR.rstrip("/").split("sf")[-1],
                "turns_per_sec": round(turns_per_sec),
                "synth_turns": SYNTH_TURNS,
                "cpus": CPUS,
                "delta_vs_prev_round": delta_vs_prev,
                "prev_round": prev.get("round"),
                "scaling": scaling,
            }
        )
    )


if __name__ == "__main__":
    main()
