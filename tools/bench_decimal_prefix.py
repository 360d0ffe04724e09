"""Measure the decimal(30,0) integer-window-sum accumulator cost.

r14 §20 moved the O(n) integer window sum's global running sum from
long to decimal(20,0)-summed-to-decimal(30,0) so an ANSI session can't
throw ARITHMETIC_OVERFLOW once a key's cumulative passes 2^63 (the
100 TB shape: ~4.6e18 of cumulative value per key — reachable with
1e9-scale int readings on long-lived keys). This publishes the price
of that safety at 10M rows: the same sum-window pattern compiled with
the decimal accumulator (current) vs a long-typed replica of the r13
form, plus the frame form for context.

Usage: python tools/bench_decimal_prefix.py [rows]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    from pyspark.sql import functions as F

    from tsp_spark.compile.compiler import compile_pattern
    from tsp_spark.session import get_spark

    spark = get_spark(app_name="bench_decimal_prefix", master="local[32]")
    n_keys = 50
    ev = (
        spark.range(rows)
        .select(
            (F.col("id") % n_keys).alias("user_id"),
            F.timestamp_seconds(
                F.lit(1704067200) + (F.col("id") / n_keys).cast("long")
            ).alias("ts"),
            (F.pmod(F.xxhash64("id"), F.lit(1000))).cast("long").alias("x"),
        )
        .localCheckpoint()
    )
    pattern = "sum(x, 10 min) > 299000"
    kw = dict(
        keys=["user_id"], ts="ts", fields_types={"x": "int64"},
        max_gap_ms=60_000,
    )

    def run(window_agg: str) -> tuple[float, int]:
        t0 = time.time()
        n = compile_pattern(ev, pattern, window_agg=window_agg, **kw).count()
        return time.time() - t0, n

    # warm
    run("frame" if rows <= 1_000_000 else "prefix")
    for form in ("prefix", "prefix", "frame"):
        dt, n = run(form)
        print(f"{form:7s} rows={rows} intervals={n} {dt:.2f}s")

    # isolate the ACCUMULATOR cost: identical running-sum plan, long vs
    # decimal(20,0) input (the engine's r14 accumulator) — the delta is
    # the whole price of the ANSI-safe form
    from pyspark.sql.window import Window

    ms = (F.col("ts").cast("double") * 1000).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(ms)
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    for label, acc in (
        ("long cumsum", F.col("x")),
        ("dec  cumsum", F.col("x").cast("decimal(20,0)")),
    ):
        t0 = time.time()
        ev.select(F.sum(acc).over(w).alias("c")).agg(
            F.max("c")
        ).collect()
        print(f"{label}: {time.time() - t0:.2f}s")


if __name__ == "__main__":
    main()
