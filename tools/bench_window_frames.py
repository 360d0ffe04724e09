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

Usage: python tools/bench_window_frames.py [n_rows]
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

    nums = [a for a in sys.argv[1:] if a.isdigit()]
    n_rows = int(nums[0]) if nums else 2_000_000
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "100g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base_ms = 1_704_067_200_000
    n_keys = 20  # long keys: n_rows/20 rows per key at 1 row/s
    raw = F.pmod(F.xxhash64("id"), F.lit(1000))
    ev = spark.range(n_rows).select(
        F.pmod(F.col("id"), F.lit(n_keys)).alias("user_id"),
        F.timestamp_millis(
            F.lit(base_ms) + (F.col("id") / n_keys).cast("long") * 1000
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
    out = {}
    for fam, tmpl in families.items():
        out[fam] = {}
        for label in ("30 sec", "10 min", "2 hr", "24 hr"):
            pat = tmpl.format(t=label)
            best, n = float("inf"), 0
            for _ in range(1 if "--once" in sys.argv else 2):
                t0 = time.perf_counter()
                n = search_incidents(
                    ev, [RawPattern(1, pat)], ["user_id"], "ts",
                    fields_types=ft, max_gap_ms=None, session_gap_ms=10_000,
                    shard_ms=None, window_agg=window_agg,
                ).count()
                best = min(best, time.perf_counter() - t0)
            out[fam][label] = {"sec": round(best, 2), "incidents": n}
            print(f"# [{window_agg}] {pat}: {best:.2f}s ({n})", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
