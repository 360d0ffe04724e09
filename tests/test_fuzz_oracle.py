"""Fuzz the Spark engine against the pure-Python reference oracle
(tools/ref_oracle.py) on randomized series.

Covers the operator subset where the current reference code and the
documented/golden semantics agree (comparisons, boolean algebra,
arithmetic, windowed aggregates, lag, for-timer on clean runs,
sessionization). `andThen`/`until` edge semantics intentionally differ
(docs/SEMANTICS.md) and are pinned by the golden corpus instead.

All fuzz cases become keys of ONE DataFrame, so each pattern costs a
single Spark job regardless of the number of cases.
"""

from __future__ import annotations

import datetime as dt
import math
import os
import random
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools import ref_oracle as O  # noqa: E402
from tsp_spark.api import RawPattern, search_incidents  # noqa: E402

PATTERNS = [
    "v > 50",
    "v <= 30 or v > 80",
    "v > 40 and w < 60",
    "abs(v - 50) < 20",
    "v + w > 100",
    "v > 45 for 3 sec",
    "lag(v) > v",
    # time-based lag with the lookback horizon longer than the split gap:
    # series gaps (15 s steps > 10 s maxGap) fall inside the 20 s horizon,
    # so this diverges unless lag(x, T) is confined to its sub-series the
    # way the reference resets PreviousValue state at a split.
    "lag(v, 20 sec) > v",
    "lag(u, 5 sec) + u > 100",
    # absent-index propagation through unary/binary composition: the
    # reference zips by idx intersection, so `not`/`or` must stay
    # absent (not flip to true) where the lag emitted nothing
    "not (lag(v, 10 sec) > v)",
    "lag(v, 20 sec) > 50 or w > 90",
    # r6c: pending lag nested inside another lag's lookback — the
    # reference composes PreviousValue over PreviousValue
    # (ASTPatternGenerator builds the chain recursively); the batch
    # compiler (and so the speculative-fork kernel, parity-pinned to
    # it) must agree with the ported state machine
    "lag(lag(v, 5 sec), 10 sec) > v",
    "lag(lag(v, 5 sec)) > 50",
    "lag(lag(v), 5 sec) > 50",
    # r6c oracle-arbitrated semantics the triple-lag shape caught:
    # stream-membership skipping, `.equals` NaN bridging, and the
    # present-mask gate on an outer lag's frame source
    "lag(lag(lag(v, 2 sec), 3 sec), 5 sec) > 50",
    "lag(lag(v, 5 sec), 5 sec) > lag(v, 5 sec)",
    "not (v > 50)",
    "v > 40 xor w > 60",
    "v / w > 1.2",
    "abs(v - w) < 10 or v > 90",
    "v * 2 - w / 2 >= 50 and not w = 0",
    # avg/sum fuzz on the never-null field: the reference's O(1)
    # evict-and-add sum is permanently NaN-poisoned after one NaN
    # (GroupPattern.scala:56-93, NaN - x = NaN) while this engine's
    # frame-based aggregate self-heals once the NaN leaves the window —
    # a documented deviation (docs/SEMANTICS.md).
    "avg(u, 3 sec) > 55",
    "sum(u, 4 sec) < 150",
    "count(u, 5 sec) >= 3",
    # r14 §20: the math extensions enter the fuzz corpus (engine,
    # both kernels, and the oracle share JVM libm edge rules; interior
    # transcendental values are 1-ulp libm-vs-JVM territory, so the
    # thresholds sit away from attainable boundaries — sqrt IS exactly
    # rounded, and `ln(v - 50)` drives the negative/zero → NaN/-Inf
    # edges half the time)
    # r14 §20 probe-caught regression shapes: an absent lag cast to an
    # int width used to come back as the saturation-clamp BOUND
    # (-2147483648 for int32, 0 after int8 narrowing) instead of Fail —
    # `< 0` then matched spuriously on every first-row-of-series
    "(lag(v) as int32) < 0",
    "(lag(v, 5 sec) as int8) >= 0",
    # ne with NaN operands (null fields decode to NaN; != is the one
    # comparison that's TRUE on NaN) and field casts of NaN (→ 0)
    "v != w",
    "(v as int16) > 50",
    "sqrt(abs(v)) > 7",
    "ln(abs(v) + 1) > 3.5",
    "ln(v - 50) > 0 or w > 95",
    "exp(v / 25) > 8",
    "log(abs(w) + 0.5) < 1.5",
    "sigmoid(v - 50) > 0.5",
    "sigmoid(v - 50, 2) > 0.5",
    "cot(v / 7) > 1",
    "sumOf(v, w) > 120",
    "maxOf(v, w; _ > 50) < 70",
    # un-cond'ed extreme reducers: NaN (from 5%-null fields) reaches the
    # FOLD — the cond'ed forms above filter it out before min/max
    "minOf(v, w) < 30",
    "maxOf(v, w) > 80",
    "minOf(v, w; _ > 95) > 10",
    # WindowStatistic truth counts (ForWithInterval); upper-bounded
    # variants ("< N times") are NOT fuzzed — the reference's
    # full-window gate (total_millis) carries path-dependent eviction
    # artifacts on irregular spacing (docs/SEMANTICS.md); golden cases
    # 43-45 pin the real-usage shapes.
    "v > 45 for 5 sec > 2 times",
    # NOT fuzzed: bare `wait(T, X)` over sub-window success runs — a
    # documented deviation (docs/SEMANTICS.md): WaitPattern.scala's
    # left-edge slack comes from queue leftovers of the TRUNCATED fail
    # emission under branch conditions its own code marks "TODO: Temp…";
    # golden wait cases (8/16/17/43-49/52) pass, covering the shapes
    # the reference actually exercises (wait over `for T` inners).
    # NOT fuzzed: windowed aggregate inside `for T` (e.g. "avg(u, 3 sec)
    # > 55 for 2 sec") — a deliberate deviation. The reference's
    # TimerPattern only emits success when its inner arrives as merged
    # RLE spans (Optimizer-fused SimplePatterns); a GroupPattern feeds
    # per-event values, so the Succ branch re-queues forever
    # (TimerPattern.scala:78-93) and the reference emits essentially
    # nothing for this composition. See docs/SEMANTICS.md.
]

FIELDS = {"v": "float64", "w": "float64", "u": "float64"}
EPOCH = dt.datetime(2024, 1, 1)
GAP_MS = 10_000
SESSION_MS = 1_000


def gen_series(rng: random.Random, n: int) -> list[tuple[int, dict]]:
    """Random keyed series: step ~1s with occasional large gaps, values
    with plateaus (exercise RLE), nulls, and NaN-inducing holes."""
    rows = []
    t = 0
    v = rng.uniform(0, 100)
    w = rng.uniform(0, 100)
    for _ in range(n):
        t += rng.choice([1000, 1000, 1000, 2000, 15_000])
        if rng.random() < 0.7:
            v = rng.uniform(0, 100)
        if rng.random() < 0.5:
            w = rng.uniform(0, 100)
        rows.append(
            (
                t,
                {
                    "v": None if rng.random() < 0.05 else round(v, 2),
                    "w": None if rng.random() < 0.05 else round(w, 2),
                    "u": round(v + w, 2),
                },
            )
        )
    return rows


@pytest.fixture(scope="module")
def fuzz_data(spark):
    # Default seed is pinned for CI reproducibility; sweep fresh seeds
    # with e.g. `SPARK_GRAFT_FUZZ_SEED=99 pytest tests/test_fuzz_oracle.py`
    # (a 7-seed sweep on 2026-08-13 found the SegmentizerPattern
    # equal-value bridge; sweeps are the cheapest semantics probe).
    rng = random.Random(int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "20260813")))
    cases = {cid: gen_series(rng, rng.randint(3, 60)) for cid in range(40)}
    rows = [
        (cid, EPOCH + dt.timedelta(milliseconds=ms), r["v"], r["w"], r["u"])
        for cid, series in cases.items()
        for ms, r in series
    ]
    df = spark.createDataFrame(
        rows, "series_id int, ts timestamp, v double, w double, u double"
    ).cache()
    df.count()
    return cases, df


def oracle_incidents(cases, pattern: str):
    want = {}
    for cid, series in cases.items():
        rows_by_key = {(cid,): series}
        try:
            ivs = O.run_pattern(
                pattern,
                rows_by_key,
                FIELDS,
                events_max_gap_ms=GAP_MS,
                chunk_size_ms=1 << 60,  # single chunk: isolate semantics
                session_gap_ms=SESSION_MS,
            )
        except NotImplementedError:
            return None
        want[cid] = ivs
    return want


@pytest.mark.slow
@pytest.mark.parametrize("pattern", PATTERNS)
def test_engine_matches_oracle(spark, fuzz_data, pattern):
    cases, df = fuzz_data
    want = oracle_incidents(cases, pattern)
    got: dict[int, list[tuple[int, int]]] = {cid: [] for cid in cases}
    out = search_incidents(
        df,
        [RawPattern(1, pattern)],
        ["series_id"],
        "ts",
        fields_types=FIELDS,
        max_gap_ms=GAP_MS,
        session_gap_ms=SESSION_MS,
    ).collect()
    for r in out:
        got[r["series_id"]].append(
            (
                int(r["from_ts"].replace(tzinfo=dt.timezone.utc).timestamp() * 1000),
                int(r["to_ts"].replace(tzinfo=dt.timezone.utc).timestamp() * 1000),
            )
        )
    base_ms = int(EPOCH.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    mismatches = []
    for cid in cases:
        g = sorted((f - base_ms, t - base_ms) for f, t in got[cid])
        o = sorted(want[cid])
        if g != o:
            mismatches.append((cid, g, o))
    assert not mismatches, (
        f"{len(mismatches)}/{len(cases)} cases diverge for {pattern!r}; "
        f"first: case {mismatches[0][0]} engine={mismatches[0][1]} "
        f"oracle={mismatches[0][2]}"
    )


# --------------------------------------------------------------------------
# r8: reference-exact andThen consumption mode (two-queue union+rewind,
# AndThenPattern.scala:42-94) fuzzed against the ported state machine on
# overlap-dense series — the exact shapes where the fused default's
# documented §17 deviations live.
# --------------------------------------------------------------------------

ANDTHEN_PATTERNS = [
    "v > 50 andThen w > 50",
    # same-field sequences: B runs nested inside / overlapping A runs
    "v > 30 andThen v > 70",
    "v > 70 andThen v > 30",
    # boolean-algebra operands
    "(v > 30 and w > 30) andThen u > 90",
    "v <= 40 or w <= 40 andThen u > 110",
    # chains, left-assoc and explicitly right-nested (associativity must
    # be preserved — flattening would change pairing)
    "v > 40 andThen w > 40 andThen u > 100",
    "v > 40 andThen (w > 40 andThen u > 100)",
    "(v > 40 andThen w > 40) andThen u > 100",
    # dense/degenerate operands
    "v >= 0 andThen w > 50",
    "v > 50 andThen w >= 0",
    # timer as LEFT operand: its success runs reach the merge as plain
    # islands and match the reference exactly (5-seed sweep, 125
    # cases). Timer-as-RIGHT and wait operands deviate (probed r8:
    # 7/25 and 13/25 cases) — their reference emission timing is not
    # a boolean RLE; documented out of exact-mode scope.
    "(v > 40 for 3 sec) andThen w > 50",
]


def gen_dense_series(rng: random.Random, n: int) -> list[tuple[int, dict]]:
    """Overlap-dense variant of gen_series: long plateaus (sticky
    values) so operand truth runs overlap and nest — the consumption
    order of the two-queue merge is only visible on such shapes."""
    rows = []
    t = 0
    v = rng.uniform(0, 100)
    w = rng.uniform(0, 100)
    for _ in range(n):
        t += rng.choice([1000, 1000, 1000, 1000, 2000, 15_000])
        if rng.random() < 0.25:
            v = rng.uniform(0, 100)
        if rng.random() < 0.35:
            w = rng.uniform(0, 100)
        rows.append(
            (
                t,
                {
                    "v": None if rng.random() < 0.03 else round(v, 2),
                    "w": None if rng.random() < 0.03 else round(w, 2),
                    "u": round(v + w, 2),
                },
            )
        )
    return rows


@pytest.fixture(scope="module")
def dense_fuzz_data(spark):
    rng = random.Random(int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "20260814")))
    cases = {cid: gen_dense_series(rng, rng.randint(3, 80)) for cid in range(40)}
    rows = [
        (cid, EPOCH + dt.timedelta(milliseconds=ms), r["v"], r["w"], r["u"])
        for cid, series in cases.items()
        for ms, r in series
    ]
    df = spark.createDataFrame(
        rows, "series_id int, ts timestamp, v double, w double, u double"
    ).cache()
    df.count()
    return cases, df


@pytest.mark.slow
@pytest.mark.parametrize("pattern", ANDTHEN_PATTERNS)
def test_exact_andthen_matches_oracle(spark, dense_fuzz_data, pattern):
    cases, df = dense_fuzz_data
    want = oracle_incidents(cases, pattern)
    got: dict[int, list[tuple[int, int]]] = {cid: [] for cid in cases}
    out = search_incidents(
        df,
        [RawPattern(1, pattern)],
        ["series_id"],
        "ts",
        fields_types=FIELDS,
        max_gap_ms=GAP_MS,
        session_gap_ms=SESSION_MS,
        andthen_mode="exact",
    ).collect()
    for r in out:
        got[r["series_id"]].append(
            (
                int(r["from_ts"].replace(tzinfo=dt.timezone.utc).timestamp() * 1000),
                int(r["to_ts"].replace(tzinfo=dt.timezone.utc).timestamp() * 1000),
            )
        )
    base_ms = int(EPOCH.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    mismatches = []
    for cid in cases:
        g = sorted((f - base_ms, t - base_ms) for f, t in got[cid])
        o = sorted(want[cid])
        if g != o:
            mismatches.append((cid, g, o))
    assert not mismatches, (
        f"{len(mismatches)}/{len(cases)} cases diverge for {pattern!r}; "
        f"first: case {mismatches[0][0]} engine={mismatches[0][1]} "
        f"oracle={mismatches[0][2]}"
    )
