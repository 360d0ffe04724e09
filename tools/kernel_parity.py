"""Offline batch-vs-kernel parity harness: drives the PRODUCTION
stateful kernel (`_make_update`, the exact fn applyInPandasWithState
runs) with a stub GroupState over chunked micro-batches — state packs
and unpacks between chunks, so the int64 codecs are exercised — and
compares the closed intervals against the batch compiler on identical
data. No streaming query, so a case takes ~1 s instead of ~15 s; the
pinned pytest suite + tools/fuzz_stateful.py still cover the real
Structured Streaming path (watermark, timeout, checkpoint).

Usage: python tools/kernel_parity.py [seed ...]
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pandas as pd  # noqa: E402

GAP_MS = 15_000


class FakeGroupState:
    """The slice of pyspark GroupState the kernel touches."""

    def __init__(self):
        self._val = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._val is not None

    @property
    def get(self):
        return self._val

    def update(self, v):
        self._val = v

    def setTimeoutTimestamp(self, ms):
        pass

    def remove(self):
        self._val = None


def kernel_intervals(
    src, pattern, keys, ts, ft, max_gap_ms=GAP_MS, chunk=13
):
    """Closed intervals from the production kernel run offline:
    {(key…, from_ms, to_ms)}. ``chunk`` rows per simulated micro-batch
    (state round-trips through the int64 codec between chunks)."""
    from tsp_spark.streaming.stateful import _make_update, build_spec

    s, spec = build_spec(src, pattern, list(keys), ts, ft, max_gap_ms)
    out_cols = ["pattern_id", "subunit", *keys, "from_ts", "to_ts", "n_rows"]
    update = _make_update([spec], list(keys), ts, max_gap_ms, out_cols)
    pdf = s.orderBy(*keys, ts).toPandas()
    got = set()

    def collect(dfs):
        for out in dfs:
            for r in out.itertuples(index=False):
                rec = tuple(getattr(r, k) for k in keys) + (
                    int(r.from_ts.value // 1_000_000),
                    int(r.to_ts.value // 1_000_000),
                )
                got.add(rec)

    for kv, grp in pdf.groupby(list(keys), sort=True):
        key = kv if isinstance(kv, tuple) else (kv,)
        g = grp.sort_values(ts).reset_index(drop=True)
        st = FakeGroupState()
        for i0 in range(0, len(g), chunk):
            collect(update(key, iter([g.iloc[i0 : i0 + chunk]]), st))
        st.hasTimedOut = True
        collect(update(key, iter([]), st))
    return got


def batch_intervals(src, pattern, keys, ts, ft, max_gap_ms=GAP_MS):
    from tsp_spark.compile.compiler import compile_pattern

    rows = (
        compile_pattern(src, pattern, list(keys), ts, ft, max_gap_ms=max_gap_ms)
        .select(*keys, "from_ts", "to_ts")
        .collect()
    )
    return {
        tuple(r[k] for k in keys)
        + (
            int(r["from_ts"].timestamp() * 1000),
            int(r["to_ts"].timestamp() * 1000),
        )
        for r in rows
    }


def compare(spark, src, pattern, ft, chunk=13):
    batch = batch_intervals(src, pattern, ["user_id"], "ts", ft)
    got = kernel_intervals(src, pattern, ["user_id"], "ts", ft, chunk=chunk)
    if got != batch:
        return (
            f"missing={sorted(batch - got)[:3]} spurious={sorted(got - batch)[:3]} "
            f"(batch {len(batch)}, kernel {len(got)})"
        )
    return None


# the round-5 kernel-totality shapes: string lag, nested aggregates,
# right-nested andThen, wait/windowed terms under boolean combinators,
# until over windowed terms, registry math inside windowed booleans
PINNED = [
    "lag(event_type) = 'hot'",
    "lag(event_type, 5 sec) = 'hot'",
    "lag(event_type, 5 sec) != event_type",
    "avg(avg(value, 5 sec), 20 sec) > 150",
    "max(avg(value, 5 sec), 10 sec) - min(value, 5 sec) > 30",
    "lag(avg(value, 5 sec), 5 sec) > value",
    "value > 150 andThen (value < 120 andThen value > 150)",
    "value < 120 andThen (value > 150 andThen value < 120) andThen value > 150",
    "value > 150 and wait(5 sec, value < 120)",
    "wait(5 sec, value > 150) or value > 205",
    "avg(value, 10 sec) > 150 until value > 205",
    "sin(avg(value, 10 sec) / 60) > 0.5",
    "abs(value - 160) < 20 and avg(value, 10 sec) > 150",
    "(value > 150 andThen value < 120) and value < 200",
    "wait(5 sec, avg(value, 5 sec) > 150)",
    "wait(5 sec, value > 150 andThen value < 120)",
    "(value > 150 andThen value < 120) for 10 sec",
    "(value > 150 andThen value < 120) for 20 sec >= 2 times",
    "sigmoid(avg(value, 10 sec) - 150) > 0.5",
    "sqrt(abs(value - 150)) < 3 and avg(value, 5 sec) > 140",
    # deep composition: pending programs nested inside each other
    "wait(5 sec, value > 150 and wait(3 sec, value < 120))",
    "wait(5 sec, value > 150 andThen (value < 120 andThen value > 150))",
    "(value > 150 and wait(3 sec, value < 120)) andThen value > 150",
    "value > 150 andThen (value < 120 and wait(3 sec, value > 150))",
    # r6: lag nested inside windowed aggregates (incremental bridge
    # depmask resolution — the last shape off the carry buffer)
    "avg(lag(value, 5 sec), 10 sec) > 150",
    "sum(lag(value, 3 sec), 10 sec) > 600",
    "count(lag(value, 5 sec), 10 sec) >= 8",
    "avg(lag(value), 10 sec) > 150",
    "max(lag(value, 5 sec), 10 sec) - min(lag(value, 5 sec), 10 sec) > 30",
    "avg(lag(value, 5 sec), 10 sec) > 150 for 10 sec",
    "avg(lag(value, 5 sec), 10 sec) > 150 for 20 sec >= 2 times",
    "avg(avg(lag(value, 3 sec), 5 sec), 15 sec) > 150",
    "lag(value, 5 sec) > avg(lag(value, 5 sec), 10 sec)",
    "avg(lag(value, 5 sec) + value, 10 sec) > 300",
    "wait(5 sec, avg(lag(value, 3 sec), 5 sec) > 150)",
    # r6: row-wise reducers (sumOf…avgOf, `_`-constraints) evaluated
    # in-kernel, incl. windowed aggregates and pending lags as args
    "avg(sumOf(value, value; _ > 100), 10 sec) > 400",
    "minOf(value, avg(value, 10 sec)) > 150",
    "maxOf(value, lag(value, 5 sec)) > 205",
    "countOf(value, lag(value); _ > 150) >= 2",
    "avgOf(value, lag(value, 3 sec), avg(value, 5 sec)) > 150",
    "sumOf(avg(value, 5 sec), value) > 300 until value > 205",
    "minOf(value, 150) > 140 for 10 sec",
    # r6c: top-level wait — the bulk vectorized leading-frame path
    "wait(5 sec, value > 150)",
    "wait(10 sec, value > 205) for 10 sec",
    # r6c: pending lag nested inside another lag's lookback — the LAST
    # declared boundary, closed via speculative branch forking
    "lag(lag(value, 5 sec), 10 sec) > 150",
    "lag(lag(value, 5 sec)) > 150",
    "lag(lag(value, 5 sec), 5 sec) > lag(value, 5 sec)",
    "lag(lag(lag(value, 2 sec), 3 sec), 5 sec) > 150",
    "lag(lag(event_type, 5 sec), 5 sec) = 'hot'",
    "avg(lag(lag(value, 5 sec), 5 sec), 10 sec) > 150",
    "lag(lag(value, 5 sec), 5 sec) > 150 for 10 sec",
    "lag(lag(value, 5 sec), 5 sec) > 150 for 20 sec >= 2 times",
    "value > 150 andThen lag(lag(value, 5 sec), 5 sec) > 150",
    "lag(lag(value, 5 sec), 5 sec) > 150 until value > 205",
    "wait(10 sec, lag(lag(value, 5 sec), 5 sec) > 150)",
    "lag(avg(lag(value, 3 sec), 5 sec), 5 sec) > 150",
    "min(lag(lag(value, 4 sec), 4 sec), 10 sec) > 120 and lag(value, 4 sec) > 100",
    # r6c: the five shapes the randomized sweep caught during the
    # stream-membership / NaN-bridge / lag1-last_emit work
    "wait(5 sec, lag(lag(value, 5 sec)) > 180) for 5 sec",
    "lag(lag(event_type, 5 sec), 5 sec) = 'hot' for 20 sec > 4 sec",
    "lag(lag(event_type, 5 sec), 5 sec) = 'hot' for 20 sec > 2 times",
    "lag(lag(event_type, 5 sec), 5 sec) = 'hot' for 20 sec <= 2 times",
    "lag(lag(value, 5 sec)) > 120 for 5 sec",
    # r6d: PURE lag1 chains (no windowed lag anywhere) — dep-bearing
    # lag1s pend on their own bridge at skip rows, so the spec-level
    # row/cond queues must serialize across micro-batches even though
    # every window_ms is 0 (can_pend under-report, review-caught; the
    # sharp repro needs an int column with mid-stream NULLs — see
    # tests/test_kernel_offline_parity.py::test_pure_lag1_chain_int_nulls)
    "lag(lag(value)) > 150",
    "lag(lag(lag(value))) > 150",
    "lag(lag(event_type)) = 'hot'",
    # r6d: JVM-exact integer casts (NaN → 0, saturate, narrow-wrap) —
    # NULL floats in the series exercise the NaN → 0 path
    "value as int32 > 150",
    "value as int64 > 150",
    "avg(value as int32, 10 sec) > 150",
]


def gen_series(rng: random.Random, spark):
    import datetime as dt

    rows = []
    EPOCH = dt.datetime(2024, 1, 1)
    for user in (1, 2, 3):
        t = 0.0
        for _seg in range(rng.randint(2, 4)):
            level = rng.choice([90.0, 160.0, 200.0])
            for _ in range(rng.randint(20, 60)):
                if rng.random() < 0.15:
                    level = rng.choice([90.0, 130.0, 170.0, 210.0])
                et = rng.choice(["hot", "cold", "hot", "warm"])
                # occasional NULLs exercise the decode: a NULL float
                # field is Double.NaN (BasicDecoders.scala:17-30) —
                # it poisons window aggregates and compares IEEE-false
                v = None if rng.random() < 0.04 else level + rng.random() * 8
                # NULL ints are genuinely ABSENT (a NULL float decodes
                # to NaN and stays present) — mid-stream absence drives
                # the lag skip/'u'/bridge paths away from series heads
                iv = (
                    None
                    if rng.random() < 0.06
                    else int(level) + rng.randrange(8)
                )
                rows.append(
                    (
                        user,
                        EPOCH + dt.timedelta(seconds=t),
                        v,
                        et,
                        iv,
                    )
                )
                t += rng.choice([0.5, 1.0, 2.0])
            t += (GAP_MS / 1000) + rng.randint(5, 30)
    return spark.createDataFrame(
        rows,
        "user_id bigint, ts timestamp, value double, event_type string, "
        "ivalue bigint",
    )


def main() -> int:
    """``kernel_parity.py [seed ...]`` sweeps PINNED per seed;
    ``kernel_parity.py --fuzz N [seed ...]`` additionally runs N random
    patterns per seed from the streaming fuzzer's generator — offline,
    so ~15× more shapes per minute than tools/fuzz_stateful.py."""
    from tsp_spark.session import get_spark

    args = sys.argv[1:]
    n_fuzz = 0
    if args and args[0] == "--fuzz":
        n_fuzz = int(args[1])
        args = args[2:]

    spark = get_spark("kernel_parity", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    ft = {"value": "float64", "event_type": "string", "ivalue": "int64"}
    seeds = [int(s) for s in args] or [7, 77]
    bad = 0
    for seed in seeds:
        rng = random.Random(seed)
        src = gen_series(rng, spark).cache()
        src.count()
        pats = list(PINNED)
        if n_fuzz:
            from fuzz_stateful import gen_pattern

            pats += [gen_pattern(rng) for _ in range(n_fuzz)]
        for pat in pats:
            diff = compare(spark, src, pat, ft, chunk=rng.choice([5, 13, 50]))
            status = "DIVERGED " + diff if diff else "ok"
            print(f"seed {seed}: [{pat}] {status}", flush=True)
            if diff:
                bad += 1
        src.unpersist()
    print(f"TOTAL DIVERGENCES: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
