"""Streaming-kernel throughput microbenchmark: drives the PRODUCTION
update fn (`_make_update`, exactly what applyInPandasWithState runs)
offline with a stub GroupState over chunked micro-batches — pure
kernel cost, no Spark query overhead — and reports rows/s per pattern
family. The numbers land in docs/SCALE.md.

Usage: python tools/kernel_throughput.py [--rows N] [--chunk N] [--slow]
  --slow forces the per-row feed path (the pre-r6 baseline) so the
  vectorized speedup is measurable from the same script.
"""

from __future__ import annotations

import argparse
import datetime as dt
import random
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

GAP_MS = 60_000

PATTERNS = [
    # (label, pattern) — one per kernel cost family
    ("island_jvm", "value > 150"),
    ("windowed_avg", "avg(value, 10 sec) > 150"),
    ("windowed_minmax", "max(value, 10 sec) - min(value, 5 sec) > 30"),
    ("nested_avg", "avg(avg(value, 5 sec), 20 sec) > 150"),
    ("truthstat_times", "value > 150 for 30 sec >= 10 times"),
    ("combo_until", "avg(value, 10 sec) > 150 until value > 205"),
    ("lag1_shift", "lag(value) > 150"),  # r6b: vectorized shift
    ("lag1_in_avg", "avg(lag(value), 10 sec) > 150"),
    ("lag_bridge", "lag(value, 5 sec) > 150"),  # pending: bulk vectorized r6c
    ("wait_leading", "wait(5 sec, value > 150)"),  # pending: bulk vectorized r6c
    # r6c: nested pending lag — speculative branch forking, per-row only
    ("lag_fork", "lag(lag(value, 5 sec), 10 sec) > 150"),
]


def gen_noisy(n: int, seed: int = 7) -> pd.DataFrame:
    """Adversarially noisy single-key series: level flips every ~3
    rows (run count ≈ n/3), 1 Hz spacing, occasional nulls."""
    rng = random.Random(seed)
    epoch = dt.datetime(2024, 1, 1)
    ts, vals = [], []
    t = 0.0
    level = 160.0
    for i in range(n):
        if rng.random() < 0.33:
            level = rng.choice([90.0, 130.0, 170.0, 210.0])
        ts.append(epoch + dt.timedelta(seconds=t))
        vals.append(None if rng.random() < 0.01 else level + rng.random() * 8)
        t += 1.0
    return pd.DataFrame(
        {"user_id": np.int64(1), "ts": pd.to_datetime(ts), "value": vals}
    )


def measure(
    spark,
    rows: int = 200_000,
    chunk: int = 10_000,
    slow: bool = False,
    patterns=None,
) -> dict:
    """Per-pattern kernel rows/s (and interval counts) on the noisy
    series; importable so bench.py tracks the numbers per round."""
    from tsp_spark.streaming import stateful
    from tsp_spark.streaming.stateful import _make_update, build_spec

    sys.path.insert(0, str(REPO / "tools"))
    from kernel_parity import FakeGroupState

    pdf = gen_noisy(rows)
    src = spark.createDataFrame(pdf)
    ft = {"value": "float64"}
    keys = ["user_id"]
    out = {}
    prev = stateful._FORCE_SLOW
    stateful._FORCE_SLOW = slow
    try:
        for label, pattern in patterns or PATTERNS:
            s, spec = build_spec(src, pattern, keys, "ts", ft, GAP_MS)
            out_cols = [
                "pattern_id", "subunit", *keys, "from_ts", "to_ts", "n_rows",
            ]
            update = _make_update([spec], keys, "ts", GAP_MS, out_cols)
            data = s.orderBy("ts").toPandas()
            # best of 3 (fresh state each attempt): each sample is only
            # 0.1-0.3 s, so a single GC pause or frequency dip skews a
            # one-shot reading by 2× — the minimum is the kernel cost,
            # same convention as bench.py's best-of-N
            best, n_out = float("inf"), 0
            for _attempt in range(1 if slow else 3):
                st = FakeGroupState()
                n_out = 0
                t0 = time.perf_counter()
                for i0 in range(0, len(data), chunk):
                    for o in update(
                        (1,), iter([data.iloc[i0 : i0 + chunk]]), st
                    ):
                        n_out += len(o)
                best = min(best, time.perf_counter() - t0)
            out[label] = {
                "rows_per_sec": int(rows / best),
                "sec": round(best, 3),
                "intervals": n_out,
            }
    finally:
        stateful._FORCE_SLOW = prev
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--chunk", type=int, default=10_000)
    ap.add_argument("--slow", action="store_true")
    args = ap.parse_args()

    from tsp_spark.session import get_spark

    spark = get_spark(
        "kernel_throughput", master="local[4]", shuffle_partitions=4
    )
    spark.sparkContext.setLogLevel("ERROR")
    print(f"rows={args.rows} chunk={args.chunk} "
          f"path={'per-row' if args.slow else 'vectorized'}")
    res = measure(spark, args.rows, args.chunk, args.slow)
    for label, r in res.items():
        print(
            f"{label:18s} {r['rows_per_sec']/1000:9.0f}k rows/s"
            f"   ({r['sec']:6.2f} s, {r['intervals']} intervals)"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
