"""Randomized batch-vs-stream parity sweep for the incremental kernel.

Generates random kernel-eligible DSL patterns (row conds, timers,
windowed aggregates, truth stats, until, andThen) and random gappy
keyed series, then asserts the stateful kernel's closed intervals equal
the batch compiler's on identical data — the same contract the pinned
pytest parity suite checks, swept across fresh shapes.

Usage: python tools/fuzz_stateful.py [--long] [seed ...] (default 3 seeds)

``--long`` (r13, VERDICT r12 Next #3) sweeps the LONG-WINDOW regime:
hour-to-day windows over multi-day series with hour-scale gaps. On the
batch side these route through the r12/r13 O(n) forms (prefix
difference, two-block min/max, leading-wait on negated time), so the
sweep pins the streaming kernel's incremental accumulators (including
the default vectorized micro-batch path) against exactly those forms —
the combination the short-window sweep never exercises.
"""

from __future__ import annotations

import datetime as dt
import random
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

GAP_MS = 15_000
EPOCH = dt.datetime(2024, 1, 1)


def gen_pattern(rng: random.Random) -> str:
    def cond():
        thr = rng.choice([80, 120, 150, 180])
        return rng.choice(
            [
                f"value > {thr}",
                f"value < {thr}",
                f"value > {thr} and value < {thr + 60}",
                f"avg(value, {rng.choice([5, 10])} sec) > {thr}",
                f"sum(value, 5 sec) > {thr * 3}",
                f"max(value, {rng.choice([5, 10])} sec) - "
                f"min(value, 5 sec) > {rng.choice([20, 50])}",
                f"count(value, 10 sec) >= {rng.choice([5, 9])}",
                # lag: delayed-resolution pending rows + equal-value bridge
                f"lag(value) > {thr}",
                f"lag(value, {rng.choice([3, 5, 10])} sec) > {thr}",
                f"lag(value, 5 sec) > value",
                f"lag(value, {rng.choice([3, 7])} sec) - value "
                f"> {rng.choice([-20, 0, 20])}",
                # r5 totality: string lag, nested aggregates, lag-of-agg,
                # registry math inside windowed booleans
                "lag(event_type, 5 sec) = 'hot'",
                "lag(event_type) != event_type",
                f"avg(avg(value, 5 sec), 20 sec) > {thr}",
                f"lag(avg(value, 5 sec), 5 sec) > value",
                f"sin(avg(value, 10 sec) / 60) > 0.5 and value > {thr}",
                # r6 totality: lag nested inside windowed aggregates
                # (incremental bridge depmask resolution)
                f"avg(lag(value, {rng.choice([3, 5])} sec), 10 sec) > {thr}",
                f"sum(lag(value, 3 sec), 10 sec) > {thr * 3}",
                f"count(lag(value, 5 sec), 10 sec) >= {rng.choice([5, 8])}",
                f"avg(lag(value), 10 sec) > {thr}",
                f"avg(avg(lag(value, 3 sec), 5 sec), 15 sec) > {thr}",
                f"lag(value, 5 sec) > avg(lag(value, 5 sec), 10 sec)",
                f"avg(lag(value, 5 sec) + value, 10 sec) > {thr * 2}",
                # r6 totality: row-wise reducers in-kernel (with
                # windowed aggregates / pending lags as arguments)
                f"avg(sumOf(value, value; _ > {thr}), 10 sec) > {thr * 2}",
                f"minOf(value, avg(value, 10 sec)) > {thr}",
                f"maxOf(value, lag(value, 5 sec)) > {thr}",
                f"countOf(value, lag(value); _ > {thr}) >= 2",
                f"avgOf(value, lag(value, 3 sec), avg(value, 5 sec)) > {thr}",
                # r6c totality: pending lag inside another lag's
                # lookback (speculative branch forking)
                f"lag(lag(value, {rng.choice([3, 5])} sec), "
                f"{rng.choice([5, 10])} sec) > {thr}",
                f"lag(lag(value, 5 sec)) > {thr}",
                f"avg(lag(lag(value, 3 sec), 3 sec), 10 sec) > {thr}",
                f"lag(lag(event_type, 5 sec), 5 sec) = 'hot'",
                # r6d: int column with mid-stream NULLs — a NULL int is
                # genuinely ABSENT (a NULL float is NaN and present),
                # so these drive skip/'u'/bridge paths away from series
                # heads: pure lag1 chains, pending lags, and aggregates
                # over an absence-bearing stream
                f"ivalue > {thr}",
                f"lag(ivalue) > {thr}",
                f"lag(lag(ivalue)) > {thr}",
                f"lag(lag(lag(ivalue))) > {thr}",
                f"lag(ivalue, {rng.choice([3, 5])} sec) > {thr}",
                f"lag(lag(ivalue, 3 sec)) > {thr}",
                f"lag(lag(ivalue), 5 sec) > {thr}",
                f"avg(lag(ivalue), 10 sec) > {thr}",
                f"avg(ivalue, {rng.choice([5, 10])} sec) > {thr}",
                f"lag(ivalue) > ivalue",
            ]
        )

    kind = rng.randrange(9)
    if kind == 0:
        return cond()
    if kind == 6:
        # leading-window wait: pending program, series-truncated frames
        inner = cond()
        w = rng.choice([3, 5, 10])
        if rng.random() < 0.4:
            return f"wait({w} sec, {inner}) for {rng.choice([5, 10])} sec"
        return f"wait({w} sec, {inner})"
    if kind == 1:
        return f"{cond()} for {rng.choice([5, 10])} sec"
    if kind == 2:
        op = rng.choice([">", ">=", "<", "<="])
        return f"{cond()} for 20 sec {op} {rng.choice([2, 4])} times"
    if kind == 3:
        return f"{cond()} for 20 sec > {rng.choice([4, 8])} sec"
    if kind == 4:
        return f"value > 150 andThen value < {rng.choice([100, 120])}"
    # left-assoc chain through the generalized stage SM
    mid = rng.choice(["value > 150", "value > 180", "avg(value, 5 sec) > 150"])
    chain = (
        f"value < {rng.choice([120, 140])} andThen {mid} "
        f"andThen value < {rng.choice([120, 140])}"
    )
    if rng.random() < 0.3:
        chain += " andThen value > 150"
    if kind == 5:
        return chain
    if kind == 7:
        # right-NESTED andThen: sequence-membership boolean program
        inner = f"value > 150 andThen value < {rng.choice([100, 120])}"
        return f"value < {rng.choice([120, 140])} andThen ({inner})"
    # wait under a boolean combinator: Kleene combo program
    op = rng.choice(["and", "or"])
    return f"value > {rng.choice([80, 120])} {op} wait(5 sec, {cond()})"


GAP_LONG_MS = 3 * 3600 * 1000  # --long mode: series split at 3 h gaps


def gen_pattern_long(rng: random.Random) -> str:
    """Long-window pattern corpus: every shape the ≥5-min O(n) batch
    forms rewrite (block min/max, leading wait, prefix sum/avg/count,
    truth stats), at 6 h - 24 h windows."""
    w = rng.choice(["6 hr", "12 hr", "24 hr"])
    thr = rng.choice([120, 150, 180])
    return rng.choice(
        [
            f"max(value, {w}) > {thr + 20}",
            f"min(value, {w}) < {thr - 20}",
            f"max(value, {w}) - min(value, 6 hr) > {rng.choice([40, 80])}",
            f"wait({w}, value > {thr + 30})",
            f"wait(12 hr, max(value, 6 hr) > {thr + 30})",
            f"avg(value, {w}) > {thr}",
            f"sum(value, {w}) > {thr * 10}",
            f"count(value, {w}) >= {rng.choice([10, 25])}",
            f"value > {thr} for {w} > {rng.choice([5, 12])} times",
            f"value > {thr} for {w} > {rng.choice([1, 2])} hr",
            f"avg(value, 12 hr) > {thr} for 6 hr",
            f"wait({w}, value > {thr}) for 2 hr",
            # consume-once lag at hour-scale lookbacks: the kernel's
            # pending-deque holds hours of entries and the equal-value
            # bridge resolves across long absences
            f"lag(value, {rng.choice(['1 hr', '6 hr'])}) > {thr}",
            f"avg(lag(value, 1 hr), {w}) > {thr}",
        ]
    )


def gen_series_long(rng: random.Random, spark):
    """Multi-day keyed series at minute-scale cadence with hour-scale
    gap splits — enough rows per 24 h window (~tens to hundreds) to
    make the O(n) forms' block/as-of machinery non-trivial, small
    enough for a streaming sweep."""
    rows = []
    for user in (1, 2, 3):
        t = 0.0
        for _seg in range(rng.randint(2, 3)):
            level = rng.choice([90.0, 160.0, 200.0])
            for _ in range(rng.randint(60, 140)):
                if rng.random() < 0.12:
                    level = rng.choice([90.0, 130.0, 170.0, 210.0])
                rows.append(
                    (
                        user,
                        EPOCH + dt.timedelta(seconds=t),
                        level + rng.random() * 8,
                        rng.choice(["hot", "cold", "warm"]),
                        None
                        if rng.random() < 0.06
                        else int(level) + rng.randrange(8),
                    )
                )
                # 2-40 min cadence. NO tied timestamps: (keys, ts)
                # uniqueness is the engine-wide row-identity contract
                # (ops/islands.py docstring) — under ties the batch
                # RANGE frame merges the tied rows into one frame while
                # the reference-faithful arrival-order kernel gives the
                # FIRST tied row a window without its sibling, so
                # batch-vs-stream parity is undefined there (verified:
                # the r13 first sweep's two `avg` divergences both sat
                # exactly on generated ties; batch frame/prefix/auto
                # agreed throughout)
                t += rng.choice([120, 300, 600, 1200, 2400])
            t += (GAP_LONG_MS / 1000) + rng.randint(600, 7200)
    return spark.createDataFrame(
        rows,
        "user_id bigint, ts timestamp, value double, event_type string, "
        "ivalue bigint",
    )


def gen_series(rng: random.Random, spark):
    rows = []
    for user in (1, 2, 3):
        t = 0.0
        for _seg in range(rng.randint(2, 4)):
            level = rng.choice([90.0, 160.0, 200.0])
            for _ in range(rng.randint(20, 60)):
                if rng.random() < 0.15:
                    level = rng.choice([90.0, 130.0, 170.0, 210.0])
                rows.append(
                    (
                        user,
                        EPOCH + dt.timedelta(seconds=t),
                        level + rng.random() * 8,
                        rng.choice(["hot", "cold", "warm"]),
                        # NULL ints are genuinely ABSENT (unlike NULL
                        # floats, which decode to NaN and stay present)
                        # — mid-stream absence drives the lag skip/'u'
                        # paths away from series heads (r6d)
                        None
                        if rng.random() < 0.06
                        else int(level) + rng.randrange(8),
                    )
                )
                t += rng.choice([0.5, 1.0, 2.0])
            t += (GAP_MS / 1000) + rng.randint(5, 30)  # force series split
    return spark.createDataFrame(
        rows,
        "user_id bigint, ts timestamp, value double, event_type string, "
        "ivalue bigint",
    )


def run_case(
    spark,
    rng: random.Random,
    pattern: str,
    gap_ms: int = GAP_MS,
    gen=gen_series,
    flush_s: int = 90_000,
) -> str | None:
    from tsp_spark.compile.compiler import compile_pattern
    from tsp_spark.streaming.stateful import stateful_pattern

    ft = {"value": "float64", "event_type": "string", "ivalue": "int64"}
    src = gen(rng, spark)
    batch = {
        (r["user_id"], r["from_ts"], r["to_ts"])
        for r in compile_pattern(
            src, pattern, ["user_id"], "ts", ft, max_gap_ms=gap_ms
        ).select("user_id", "from_ts", "to_ts").collect()
    }

    src_dir = tempfile.mkdtemp(prefix="tsp_fuzz_st_src")
    chk = tempfile.mkdtemp(prefix="tsp_fuzz_st_chk")
    table = f"fz_{abs(hash(pattern)) % 10**8}_{rng.randrange(10**6)}"
    try:
        src.coalesce(1).write.parquet(f"{src_dir}/b0")
        flush = spark.createDataFrame(
            [(u, EPOCH + dt.timedelta(seconds=flush_s + u), 0.0, "ok", 0)
             for u in (1, 2, 3)],
            src.schema,
        )
        stream = (
            spark.readStream.schema(src.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src_dir}/*")
        )
        q = (
            stateful_pattern(
                stream, pattern, ["user_id"], "ts", ft,
                max_gap_ms=gap_ms, watermark_delay="1 second",
            )
            .select("user_id", "from_ts", "to_ts")
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(table)
            .option("checkpointLocation", chk)
            .start()
        )
        q.processAllAvailable()
        flush.coalesce(1).write.mode("append").parquet(f"{src_dir}/b1")
        deadline = time.time() + 90
        got: set = set()
        while time.time() < deadline:
            q.processAllAvailable()
            got = {
                (r["user_id"], r["from_ts"], r["to_ts"])
                for r in spark.sql(f"SELECT * FROM {table}").collect()
            }
            if batch <= got:
                break
            time.sleep(0.5)
        q.stop()
        if got != batch:
            return (
                f"missing={sorted(batch - got)[:3]} "
                f"spurious={sorted(got - batch)[:3]}"
            )
        return None
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(chk, ignore_errors=True)


def main() -> int:
    from tsp_spark.session import get_spark

    spark = get_spark("fuzz_stateful", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    long_mode = "--long" in sys.argv
    seeds = [int(s) for s in sys.argv[1:] if s.lstrip("-").isdigit()] or [
        11, 222, 3333,
    ]
    bad = 0
    for seed in seeds:
        rng = random.Random(seed)
        for i in range(4):
            if long_mode:
                pattern = gen_pattern_long(rng)
                diff = run_case(
                    spark, rng, pattern, gap_ms=GAP_LONG_MS,
                    gen=gen_series_long, flush_s=3_000_000,
                )
            else:
                pattern = gen_pattern(rng)
                diff = run_case(spark, rng, pattern)
            status = "DIVERGED " + diff if diff else "ok"
            print(f"seed {seed} case {i}: [{pattern}] {status}", flush=True)
            if diff:
                bad += 1
    print(f"TOTAL DIVERGENCES: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
