"""Measure the auto-shard probe's own cost (VERDICT r13 Next #4).

Since r13 the rate probe fires for ANY sub-5-min frame-form window on a
≥128 MB source — including jobs that end up unshardable — so the
always-probe default needs its price tag: one narrow two-level
aggregation (`api.probe_hot_key`: groupBy(keys) partial-agg → one-row
final agg; scan pruned to (keys, ts)). This bench generates skewed
keyed parquet at 10M and 100M rows, times

  * cold probe          — the real Spark job
  * memo hit            — `_cached_auto_shard` served from the LRU
  * full scan baseline  — count() over ALL columns, for scale

and asserts the memo actually absorbs the repeat. Data lands under
.localdata/bench_probe (gitignored) and is removed afterwards.

Usage: python tools/bench_probe.py [--keep] [--rows 10000000,100000000]
"""
from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

OUT = REPO / ".localdata" / "bench_probe"


def gen(spark, n: int, path: str) -> None:
    from pyspark.sql import functions as F

    # 1,000 keys; key 0 owns ~20% of rows (the hot key the probe must
    # find); 1 kHz cadence per key so spans are realistic
    df = (
        spark.range(n)
        .withColumn(
            "user_id",
            F.when(F.col("id") % 5 == 0, F.lit(0)).otherwise(
                F.col("id") % 1000
            ),
        )
        .withColumn(
            "ts", F.timestamp_millis((F.col("id") * 7).cast("long"))
        )
        .withColumn("value", (F.col("id") % 997).cast("double"))
        .withColumn("event_type", F.lit("x"))
        .drop("id")
    )
    df.write.mode("overwrite").parquet(path)


def main() -> int:
    rows = [10_000_000, 100_000_000]
    if "--rows" in sys.argv:
        rows = [
            int(x) for x in sys.argv[sys.argv.index("--rows") + 1].split(",")
        ]
    from tsp_spark import api
    from tsp_spark.session import get_spark

    spark = get_spark("bench_probe")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"{'rows':>12} {'gen':>6} {'cold probe':>10} {'memo hit':>9} "
          f"{'full count':>10}  decision")
    try:
        for n in rows:
            path = str(OUT / f"n{n}")
            t0 = time.time()
            gen(spark, n, path)
            t_gen = time.time() - t0

            src = spark.read.parquet(path).select("user_id", "ts", "value")
            api.clear_auto_probe_cache()
            t0 = time.time()
            decision, stats, cached, _ = api._cached_auto_shard(
                src, ["user_id"], "ts"
            )
            t_cold = time.time() - t0
            assert not cached
            t0 = time.time()
            d2, _, cached2, _ = api._cached_auto_shard(src, ["user_id"], "ts")
            t_hit = time.time() - t0
            assert cached2 and d2 == decision, "memo must absorb the repeat"
            t0 = time.time()
            spark.read.parquet(path).count()
            t_full = time.time() - t0
            print(
                f"{n:>12,} {t_gen:>5.1f}s {t_cold:>9.2f}s {t_hit * 1000:>7.1f}ms "
                f"{t_full:>9.2f}s  shard_ms={decision} "
                f"hot={stats['hot_rows']:,}/{stats['total_rows']:,}"
            )
    finally:
        if "--keep" not in sys.argv:
            shutil.rmtree(OUT, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
