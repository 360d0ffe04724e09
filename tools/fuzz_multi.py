"""Randomized stacked-vs-per-pattern parity sweep for multi-pattern
jobs (r13).

`compile_intervals_multi` (cross-pattern plan sharing) restructures the
core interval path for every multi-pattern ordered job, so it gets the
same treatment as the streaming kernel: random pattern SETS (2-5
patterns mixing row conds, timers, windowed aggregates with both frame
regimes, for-interval stats, wait, andThen chains, lag — present slots
since r13b — and exact-mode chains as keep=None slot queues) over
random gappy keyed series (25% of cases with max_gap_ms=None),
asserting the stacked `search_incidents` output equals the per-pattern
path's row for row, in both andthen modes.

Usage: python tools/fuzz_multi.py [seed ...]   (default 3 seeds)
"""

from __future__ import annotations

import datetime as dt
import random
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

GAP_MS = 15_000
EPOCH = dt.datetime(2024, 1, 1)


def gen_pattern(rng: random.Random) -> str:
    thr = rng.choice([80, 120, 150, 180])

    def cond():
        return rng.choice(
            [
                f"value > {thr}",
                f"value < {thr}",
                f"value > {thr} and value < {thr + 60}",
                f"avg(value, {rng.choice([5, 10])} sec) > {thr}",
                f"sum(value, 5 sec) > {thr * 3}",
                f"max(value, 7 sec) - min(value, 5 sec) > 30",
                f"count(value, 10 sec) >= 5",
                "lag(event_type, 5 sec) = 'hot'",   # present slot
                f"lag(value) > {thr}",              # present slot
            ]
        )

    kind = rng.randrange(7)
    if kind == 0:
        return cond()
    if kind == 1:
        return f"{cond()} for {rng.choice([5, 10])} sec"
    if kind == 2:
        op = rng.choice([">", ">=", "<", "<="])
        return f"{cond()} for 20 sec {op} {rng.choice([2, 4])} times"
    if kind == 3:
        return f"wait({rng.choice([3, 5])} sec, {cond()})"
    if kind == 4:
        return f"value > 150 andThen value < {rng.choice([100, 120])}"
    if kind == 5:
        return (
            f"value < {rng.choice([120, 140])} andThen value > 150 "
            f"andThen value < {rng.choice([120, 140])}"
        )
    # right-nested andThen operand (compiles via the membership boolean)
    return "value < 130 andThen (value > 150 andThen value < 120)"


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
                        None if rng.random() < 0.04 else level + rng.random() * 8,
                        rng.choice(["hot", "cold", "warm"]),
                    )
                )
                t += rng.choice([0.5, 1.0, 2.0])
            t += (GAP_MS / 1000) + rng.randint(5, 30)
    return spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, value double, event_type string"
    )


def run_case(
    spark, rng: random.Random, patterns: list[str], mode: str,
    gap_ms: int | None = GAP_MS,
    window_agg: str = "auto",
) -> str | None:
    from tsp_spark.api import RawPattern, search_incidents
    from tsp_spark.compile.compiler import PatternCompiler

    ft = {"value": "float64", "event_type": "string"}
    src = gen_series(rng, spark)
    pats = [RawPattern(i + 1, p, subunit=i % 3) for i, p in enumerate(patterns)]
    kw = dict(
        keys=["user_id"], ts="ts", fields_types=ft,
        max_gap_ms=gap_ms, session_gap_ms=2_000, shard_ms=None,
        andthen_mode=mode, window_agg=window_agg,
    )
    stacked = sorted(map(tuple, search_incidents(src, pats, **kw).collect()))
    real = PatternCompiler.compile_intervals_multi
    try:
        PatternCompiler.compile_intervals_multi = (
            lambda self, d, tagged: (None, [t for t, _ in tagged])
        )
        per = sorted(map(tuple, search_incidents(src, pats, **kw).collect()))
    finally:
        PatternCompiler.compile_intervals_multi = real
    if stacked != per:
        miss = [r for r in per if r not in stacked][:3]
        spur = [r for r in stacked if r not in per][:3]
        return f"missing={miss} spurious={spur}"
    return None


def main() -> int:
    from tsp_spark.session import get_spark

    spark = get_spark("fuzz_multi", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    seeds = [int(s) for s in sys.argv[1:] if s.lstrip("-").isdigit()] or [
        21, 322, 4323,
    ]
    bad = 0
    for seed in seeds:
        rng = random.Random(seed)
        for i in range(3):
            pats = [gen_pattern(rng) for _ in range(rng.randint(2, 5))]
            mode = "exact" if rng.random() < 0.3 else "fused"
            # 25% of cases run with NO gap splitting (constant series
            # id, no gap boundary term in the stacked islandization)
            gap = None if rng.random() < 0.25 else GAP_MS
            # r14 (VERDICT r13 Next #5): stacked-vs-per-pattern parity
            # must hold under the window-agg gate forced BOTH ways, so
            # an O(n)-form change (the r14 block rewrite) can't
            # silently diverge only one of the two paths. Every case's
            # series is seeded identically across forms (fresh rng
            # clone per leg).
            for wa in ("auto", "frame", "prefix"):
                leg_rng = random.Random(rng.random())
                diff = run_case(
                    spark, leg_rng, pats, mode, gap_ms=gap, window_agg=wa
                )
                status = "DIVERGED " + diff if diff else "ok"
                print(
                    f"seed {seed} case {i} [{mode} gap={gap} agg={wa}] "
                    f"{pats} {status}",
                    flush=True,
                )
                if diff:
                    bad += 1
    print(f"TOTAL DIVERGENCES: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
