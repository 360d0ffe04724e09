"""Directed three-way float-drift sweep for the windowed-aggregate forms.

VERDICT r13 Next #2: the r13 prefix-difference drift class (whole-
history cumulative rounding flips near-threshold comparisons) has
three sibling surfaces — the batch O(n) forms, the public helpers, and
the streaming kernel's per-batch prefix scans. This sweep runs all of
them against the DuckDB frame oracle on data ENGINEERED for the bug
class: near-threshold values riding a large magnitude offset, long
single-key histories, thresholds at varying magnitudes.

Data: value = offset + eta, eta an ASYMMETRIC square wave (+A / −3A,
60-row half-period) so window means cross the threshold twice per
period — while the key-lifetime cumulative reaches offset × n_rows,
where ulp swamps A for large offsets. With a 60-row window the means
live on the LATTICE offset + A(4m−120)/60 (m = in-window + rows), so
the threshold sits at the MIDPOINT between two lattice points
(offset + 2A/60): every comparison then has true margin ≥ A/30. A
threshold ON a lattice point is a zero-margin tie that every
association legitimately rounds either way — the first run of this
sweep put it there and even the frame form "flipped" 499 rows vs
DuckDB at (100.3, 1e-7); that is tie noise, not drift, and the same
applies to symmetric waves (see tests/test_window_drift.py).

Legs per (offset, rows) config, each returning threshold-comparison
flips vs DuckDB:

  frame   — Spark sliding RANGE frame (windowed_avg form="frame")
  block   — the r14 block-anchored O(n) form (windowed_avg_long,
            what the compiler routes float sum/avg to)
  legacy  — the r13 global prefix-difference (windowed_avg
            form="prefix", kept as the measured counter-example)
  stream1 — streaming vectorized kernel, whole series as ONE batch
  streamN — streaming vectorized kernel, 5k-row micro-batches with
            carried deque state

PASS = frame/block/stream* all 0 flips; legacy is REPORTED (it is the
bug-class detector — if it ever reads 0 at the 1e6 offset, the data
stopped provoking the class and the sweep needs retuning).

Usage: python tools/fuzz_window_drift.py [--rows N]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

WINDOW_MS = 60_000
CADENCE_MS = 1_000


def make_data(offset: float, amp: float, n: int) -> pd.DataFrame:
    ms = (np.arange(n) * CADENCE_MS).astype("int64")
    eta = np.where((np.arange(n) // 60) % 2 == 0, amp, -3 * amp)
    pdf = pd.DataFrame({"u": "a", "ms": ms, "v": offset + eta})
    pdf["ts"] = pd.to_datetime(pdf["ms"], unit="ms")
    return pdf


def oracle_flags(pdf: pd.DataFrame, thr: float) -> np.ndarray:
    import duckdb

    con = duckdb.connect()
    con.register("t", pdf)
    return con.execute(
        f"""SELECT (avg(v) OVER (PARTITION BY u ORDER BY ms
              RANGE BETWEEN {WINDOW_MS - 1} PRECEDING AND CURRENT ROW)
              > {thr!r}) b FROM t ORDER BY ms"""
    ).fetchdf()["b"].to_numpy()


def spark_flags(spark, pdf, thr, mode):
    from pyspark.sql import functions as F

    from tsp_spark.ops.windows import windowed_avg, windowed_avg_long

    df = spark.createDataFrame(pdf[["u", "ts", "v"]])
    if mode == "block":
        out = windowed_avg_long(df, "a", F.col("v"), ["u"], "ts", 60.0)
    else:
        out = df.withColumn(
            "a", windowed_avg(F.col("v"), ["u"], "ts", 60.0, form=mode)
        )
    return (
        out.withColumn("b", F.col("a") > thr)
        .orderBy("ts").select("b").toPandas()["b"].to_numpy()
    )


def stream_flags(pdf, thr, batch: int | None) -> np.ndarray:
    from tsp_spark.streaming.stateful import _SlidingAggState
    from tsp_spark.streaming.vectorized import sliding_aggregate

    ms = pdf["ms"].to_numpy()
    vals = pdf["v"].to_numpy().copy()
    n = len(ms)
    st = _SlidingAggState()
    parts = []
    step = batch or n
    for i in range(0, n, step):
        sl = slice(i, i + step)
        m = len(ms[sl])
        out, _, _ = sliding_aggregate(
            "avg", WINDOW_MS, st, ms[sl], vals[sl].copy(),
            np.zeros(m, dtype=bool), np.full(m, -1, dtype=np.int64),
        )
        parts.append(out)
    return np.concatenate(parts) > thr


def main() -> int:
    rows = 120_000
    if "--rows" in sys.argv:
        rows = int(sys.argv[sys.argv.index("--rows") + 1])
    from tsp_spark.session import get_spark

    spark = get_spark(
        "fuzz_window_drift", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")

    # (offset, signal amplitude): margins scale with amp; the cumulative
    # rounding scales with offset × rows — the big-offset legs are where
    # the r13 class lives, the 100.3 leg mirrors the sf1 events table
    configs = [
        (100.3, 1e-7),
        (100.3, 1e-6),
        (1_000_000.3, 1e-5),
        (1_000_000_000.7, 1e-2),
    ]
    print(f"rows={rows} window={WINDOW_MS}ms cadence={CADENCE_MS}ms")
    hdr = f"{'offset':>15} {'amp':>8} | {'frame':>6} {'block':>6} {'stream1':>7} {'stream5k':>8} | {'legacy':>7}"
    print(hdr)
    bad = 0
    legacy_total = 0
    for offset, amp in configs:
        pdf = make_data(offset, amp, rows)
        # midpoint between the m=30 and m=31 mean-lattice points:
        # true margin >= amp/30 at every row (see module docstring)
        thr = offset + 2 * amp / 60
        o = oracle_flags(pdf, thr)

        def flips(flags):
            return int((flags != o).sum())

        t0 = time.time()
        res = {
            "frame": flips(spark_flags(spark, pdf, thr, "frame")),
            "block": flips(spark_flags(spark, pdf, thr, "block")),
            "stream1": flips(stream_flags(pdf, thr, None)),
            "stream5k": flips(stream_flags(pdf, thr, 5_000)),
            "legacy": flips(spark_flags(spark, pdf, thr, "prefix")),
        }
        legacy_total += res["legacy"]
        bad += res["frame"] + res["block"] + res["stream1"] + res["stream5k"]
        print(
            f"{offset:>15} {amp:>8.0e} | {res['frame']:>6} {res['block']:>6}"
            f" {res['stream1']:>7} {res['stream5k']:>8} | {res['legacy']:>7}"
            f"   ({time.time() - t0:.0f}s)"
        )
    print(f"TOTAL flips (frame+block+stream): {bad}")
    print(f"legacy-form flips (bug-class detector): {legacy_total}")
    if legacy_total == 0:
        print("WARNING: legacy form did not drift — data no longer "
              "provokes the class; retune offsets/amps")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
