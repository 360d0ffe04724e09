"""Microbench: does a windowed aggregate's cost grow with the WINDOW
LENGTH at fixed row count? (r11)

Spark's sliding RANGE frame (moving lower bound) cannot decrement an
aggregate, so SlidingWindowFunctionFrame re-aggregates the in-frame
buffer for every output row - O(n x w_rows) per partition. At the
bench's 30 s-2 min windows w_rows is tiny; on a realistic 1 Hz sensor
with `avg(x, 1 day)` the frame is 86,400 rows and the per-row cost is
~86,000x the narrow-window cost. This microbench drives the same
`avg(x, T) > c` pattern through search_incidents at fixed 2M rows /
1 row-per-second keys while T sweeps decades; linear-in-T wall clock
is the O(n x w) signature. Companion: the prefix-difference reformulation in
compile/compiler.py (_compile_aggregate's use_prefix branch, gated by
PREFIX_WINDOW_AGG_MIN_MS), which is O(n) regardless of T.

Usage: python tools/bench_window_frames.py [n_rows] [--frame] [--once]
       [--hz N] [family ...]

``--hz N`` (r13, VERDICT r12 Next #1) raises the per-key event rate —
the frame form's cost is O(rows-in-window) PER ROW, so a 100 Hz source
under a 2-min window (12,000-row frames) hits the same cliff a 1 Hz
source needs a 3-hour window for. The rate-aware gate
(PREFIX_WINDOW_AGG_MIN_ROWS, fed by search_incidents' auto-probe
measurement) must switch these to the O(n) forms even though 2 min is
far below the 5-min wall-clock floor; the default n_rows in --hz mode
is 10M so the probe's plan-stats gate (128 MB) opens and the measured
rate actually reaches the compiler.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from tsp_spark.api import RawPattern, search_incidents

    hz = 1.0
    if "--hz" in sys.argv:
        hz = float(sys.argv[sys.argv.index("--hz") + 1])
    nums = [
        a
        for i, a in enumerate(sys.argv[1:], 1)
        if a.isdigit() and sys.argv[i - 1] != "--hz"
    ]
    n_rows = int(nums[0]) if nums else (10_000_000 if hz > 1 else 2_000_000)
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "100g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base_ms = 1_704_067_200_000
    n_keys = 20  # long keys: n_rows/20 rows per key at `hz` rows/s
    step_ms = max(1, round(1000 / hz))
    raw = F.pmod(F.xxhash64("id"), F.lit(1000))
    ev = spark.range(n_rows).select(
        F.pmod(F.col("id"), F.lit(n_keys)).alias("user_id"),
        F.timestamp_millis(
            F.lit(base_ms) + (F.col("id") / n_keys).cast("long") * step_ms
        ).alias("ts"),
        (raw.cast("double") / 1000).alias("x"),
    )
    ft = {"x": "float64"}
    # window_agg='frame' re-runs the literal sliding-frame form for the
    # cliff comparison; default exercises the shipped 'auto' path.
    window_agg = "frame" if "--frame" in sys.argv else "auto"
    families = {
        "avg": "avg(x, {t}) > 0.6",                    # r11b prefix sum/avg
        "truth_times": "x > 0.6 for {t} > 10 times",   # r12 ForWithInterval
        "truth_time": "x > 0.6 for {t} > 30 sec",      # r12 time kind
        "max": "max(x, {t}) > 0.998",                  # r12 block min/max
        "wait": "wait({t}, x > 0.999)",               # r12 leading max
    }
    only = [a for a in sys.argv[1:] if a in families]
    if only:
        families = {k: families[k] for k in only}
    # high-rate mode sweeps SHORT windows (all under the 5-min
    # wall-clock floor except the last): the rows-in-window gate is
    # what must catch them
    labels = (
        ("30 sec", "2 min", "10 min")
        if hz > 1
        else ("30 sec", "10 min", "2 hr", "24 hr")
    )
    out = {}
    for fam, tmpl in families.items():
        out[fam] = {}
        for label in labels:
            pat = tmpl.format(t=label)
            best, n = float("inf"), 0
            decision: dict = {}
            for _ in range(1 if "--once" in sys.argv else 2):
                t0 = time.perf_counter()
                n = search_incidents(
                    ev, [RawPattern(1, pat)], ["user_id"], "ts",
                    fields_types=ft, max_gap_ms=None, session_gap_ms=10_000,
                    # hz mode runs the real 'auto' path so the probe's
                    # measured rate reaches the compiler's
                    # rows-in-window gate; the 1 Hz legs keep the
                    # explicit ordered path for artifact comparability
                    shard_ms="auto" if hz > 1 else None,
                    window_agg=window_agg,
                    decision_sink=decision,
                ).count()
                best = min(best, time.perf_counter() - t0)
            out[fam][label] = {"sec": round(best, 2), "incidents": n}
            if hz > 1:
                out[fam][label]["hot_rate_hz"] = decision.get("hot_rate_hz")
            print(f"# [{window_agg}] {pat}: {best:.2f}s ({n})", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
