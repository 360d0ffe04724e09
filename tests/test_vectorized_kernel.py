"""Vectorized vs per-row kernel path equivalence.

The r6 vectorized micro-batch path (streaming/vectorized.py) must be
indistinguishable from the per-row program feed: same closed
intervals, same packed state — on noisy data with nulls, NaNs and
series gaps, across chunk boundaries, and even when a key's stream
alternates paths between micro-batches (the state layouts are
shared). String-typed operands must demote the spec to the per-row
path instead of failing."""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd
import pytest

from tsp_spark.streaming import stateful
from tsp_spark.streaming.stateful import _make_update, build_spec

GAP_MS = 15_000

PATTERNS = [
    "avg(value, 10 sec) > 150",
    "sum(value, 7 sec) > 600",
    "count(value, 10 sec) >= 8",
    "min(value, 10 sec) > 120",
    "max(value, 10 sec) - min(value, 5 sec) > 30",
    "avg(avg(value, 5 sec), 20 sec) > 150",
    "value > 150 for 20 sec >= 3 times",
    "value > 150 for 20 sec > 5 sec",
    "value > 150 for exactly 10 sec >= 1 times",
    "avg(value, 10 sec) > 150 until value > 205",
    "abs(value - 160) < 20 and avg(value, 10 sec) > 150",
    "sin(avg(value, 10 sec) / 60) > 0.5",
    "avg(value, 10 sec) > 150 for 15 sec",
    "ivalue / 2 > 80 and sum(ivalue, 10 sec) > 900",  # exact-int branch
    # r6b: plain lag(x) vectorizes (shift + series resets; absent rows
    # drop from islandization / feed raw to Timer & truth stats)
    "lag(value) > 150",
    "lag(value) > value",
    "avg(lag(value), 10 sec) > 150",
    "lag(value) > 150 for 12 sec",
    "lag(value) > 150 for 20 sec >= 3 times",
    "lag(value) > 150 until value > 205",
    "lag(ivalue) = ivalue",
    "value > 150 andThen lag(value) > 150",  # chains stay per-row
]


class FakeGroupState:
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


def _gen(seed: int, n: int = 600, with_nan: bool = True) -> pd.DataFrame:
    """``with_nan`` injects literal NaN VALUES beyond NULLs. For
    float-typed fields the two are indistinguishable AND equivalent:
    the decode maps NULL→NaN (BasicDecoders.scala:17-30, mirrored by
    both engines), so Arrow collapsing SQL NULL and NaN in
    applyInPandasWithState loses nothing."""
    rng = random.Random(seed)
    epoch = dt.datetime(2024, 1, 1)
    rows = []
    t = 0.0
    level = 160.0
    for _ in range(n):
        if rng.random() < 0.3:
            level = rng.choice([90.0, 130.0, 170.0, 210.0])
        r = rng.random()
        v = (
            None
            if r < 0.04
            else (
                float("nan")
                if (with_nan and r < 0.07)
                else level + rng.random() * 8
            )
        )
        rows.append(
            (
                1,
                epoch + dt.timedelta(seconds=t),
                v,
                None if v is None or v != v else int(v),
                rng.choice(["hot", "cold"]),
            )
        )
        t += rng.choice([0.5, 1.0, 2.0])
        if rng.random() < 0.02:
            t += GAP_MS / 1000 + 5
    return pd.DataFrame(
        rows, columns=["user_id", "ts", "value", "ivalue", "etype"]
    )


def _drive(spark, pdf, pattern, chunk, path_per_chunk):
    """Run the production update fn over chunked micro-batches;
    ``path_per_chunk(k)`` → True forces the per-row path for chunk k.
    Returns (intervals, final packed state)."""
    ft = {"value": "float64", "ivalue": "int64", "etype": "string"}
    src = spark.createDataFrame(pdf)
    s, spec = build_spec(src, pattern, ["user_id"], "ts", ft, GAP_MS)
    out_cols = [
        "pattern_id", "subunit", "user_id", "from_ts", "to_ts", "n_rows",
    ]
    update = _make_update([spec], ["user_id"], "ts", GAP_MS, out_cols)
    data = s.orderBy("ts").toPandas()
    st = FakeGroupState()
    got = []
    try:
        for k, i0 in enumerate(range(0, len(data), chunk)):
            stateful._FORCE_SLOW = path_per_chunk(k)
            for out in update((1,), iter([data.iloc[i0 : i0 + chunk]]), st):
                got.extend(
                    (r.from_ts, r.to_ts) for r in out.itertuples(index=False)
                )
        packed = st._val
        st.hasTimedOut = True
        for out in update((1,), iter([]), st):
            got.extend(
                (r.from_ts, r.to_ts) for r in out.itertuples(index=False)
            )
    finally:
        stateful._FORCE_SLOW = False
    return sorted(got), packed


@pytest.mark.parametrize("pattern", PATTERNS)
def test_paths_equivalent(spark, pattern):
    pdf = _gen(seed=11)
    fast, st_fast = _drive(spark, pdf, pattern, 97, lambda k: False)
    slow, st_slow = _drive(spark, pdf, pattern, 97, lambda k: True)
    assert fast == slow
    # Packed state layouts are interchangeable. Values are bit-equal
    # except NESTED aggregates over non-integral data, whose stored
    # inner-window values may differ by 1 ulp (prefix-scan vs
    # left-to-right fold) — structurally identical, and conditions
    # only flip on an exact threshold tie, which needs integral data
    # (covered by the bit-exact int branch).
    if "avg(avg" in pattern:
        assert len(st_fast[1]) == len(st_slow[1])
    else:
        assert st_fast == st_slow


def test_alternating_paths_mid_stream(spark):
    """Flipping path per micro-batch must not perturb results — the
    state each path writes is exactly what the other reads."""
    pdf = _gen(seed=23)
    pat = "avg(value, 10 sec) > 150 until value > 205"
    ref, _ = _drive(spark, pdf, pat, 61, lambda k: True)
    mix, _ = _drive(spark, pdf, pat, 61, lambda k: k % 2 == 0)
    assert mix == ref


def test_string_operand_demotes_not_fails(spark):
    """A windowed boolean with a string comparison can't vectorize —
    the spec must fall back to the per-row feed and still be right."""
    pdf = _gen(seed=31)
    pat = "etype = 'hot' and avg(value, 10 sec) > 150"
    fast, _ = _drive(spark, pdf, pat, 83, lambda k: False)
    slow, _ = _drive(spark, pdf, pat, 83, lambda k: True)
    assert fast == slow


def test_vectorized_matches_batch_compiler(spark):
    """End-to-end oracle: vectorized kernel intervals == the batch
    compiler's on identical data (two shapes; the broad sweep lives in
    tools/kernel_parity.py)."""
    from tsp_spark.compile.compiler import compile_pattern

    pdf = _gen(seed=47)
    ft = {"value": "float64", "ivalue": "int64", "etype": "string"}
    for pat in [
        "avg(value, 10 sec) > 150",
        "value > 150 for 20 sec >= 3 times",
    ]:
        src = spark.createDataFrame(pdf)
        batch = sorted(
            (int(r["from_ts"].timestamp() * 1000), int(r["to_ts"].timestamp() * 1000))
            for r in compile_pattern(
                src, pat, ["user_id"], "ts", ft, max_gap_ms=GAP_MS
            )
            .select("from_ts", "to_ts")
            .collect()
        )
        got, _ = _drive(spark, pdf, pat, 73, lambda k: False)
        got = [
            (int(f.value // 1_000_000), int(t.value // 1_000_000))
            for f, t in got
        ]
        assert got == batch


def test_huge_magnitude_sums_demote_and_match(spark):
    """Review-caught: float prefix-sum DIFFERENCES cancel
    catastrophically (sum over [1e16…, 1.0…] windows loses the 1.0s),
    where the per-row fold does not. Such batches must demote to the
    per-row feed — transactionally, even when an earlier term already
    advanced — so both paths agree."""
    import datetime as dt

    epoch = dt.datetime(2024, 1, 1)
    rows = []
    vals = [1e16] * 6 + [1.0] * 7 + [1e16] * 3 + [2.0] * 5
    for i, v in enumerate(vals):
        rows.append((1, epoch + dt.timedelta(seconds=i), v, None, "x"))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value", "ivalue", "etype"])
    for pat in [
        "sum(value, 5 sec) > 1",
        "avg(value, 5 sec) > 1 and sum(avg(value, 3 sec), 6 sec) > 2",
    ]:
        fast, _ = _drive(spark, pdf, pat, 7, lambda k: False)
        slow, _ = _drive(spark, pdf, pat, 7, lambda k: True)
        assert fast == slow, pat


def test_big_int_columns_demote_and_match(spark):
    """Review-caught: float64 arithmetic rounds past 2^52 where the
    per-row path computes exact Python ints — big int columns must
    demote at precheck."""
    import datetime as dt

    epoch = dt.datetime(2024, 1, 1)
    big = (1 << 53) + 2
    rows = [
        (1, epoch + dt.timedelta(seconds=i), 100.0, big + i, "x")
        for i in range(12)
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value", "ivalue", "etype"])
    pat = "(ivalue + 1) - ivalue = 1 and count(value, 5 sec) >= 1"
    fast, _ = _drive(spark, pdf, pat, 5, lambda k: False)
    slow, _ = _drive(spark, pdf, pat, 5, lambda k: True)
    assert fast == slow and len(fast) > 0


def test_incompatible_checkpoint_state_fails_loudly(spark):
    """Review-caught: the packed state layout changed in r6 with no
    version word — restarting from an older checkpoint silently
    misdecoded. Now every p_i array leads with a version word and an
    unknown one raises a clear error instead of garbage incidents."""
    pdf = _gen(seed=3, n=60)
    ft = {"value": "float64", "ivalue": "int64", "etype": "string"}
    src = spark.createDataFrame(pdf)
    s, spec = build_spec(src, "avg(value, 10 sec) > 150", ["user_id"], "ts", ft, GAP_MS)
    out_cols = ["pattern_id", "subunit", "user_id", "from_ts", "to_ts", "n_rows"]
    update = _make_update([spec], ["user_id"], "ts", GAP_MS, out_cols)
    data = s.orderBy("ts").toPandas()
    st = FakeGroupState()
    for _ in update((1,), iter([data.iloc[:30]]), st):
        pass
    assert st._val[1][0] == stateful._STATE_VERSION
    # corrupt the version word like a pre-upgrade checkpoint would
    tampered = (st._val[0], [999] + list(st._val[1][1:]))
    st._val = tampered
    with pytest.raises(Exception, match="incompatible kernel state"):
        for _ in update((1,), iter([data.iloc[30:]]), st):
            pass


def _drive_frames(spark, frames, pattern, force_slow):
    """Feed explicit micro-batch frames (already per-batch sorted) so
    cross-batch LATE data can be simulated — _drive always feeds a
    globally sorted stream."""
    ft = {"value": "float64", "ivalue": "int64", "etype": "string"}
    src = spark.createDataFrame(pd.concat(frames, ignore_index=True))
    s, spec = build_spec(src, pattern, ["user_id"], "ts", ft, GAP_MS)
    out_cols = [
        "pattern_id", "subunit", "user_id", "from_ts", "to_ts", "n_rows",
    ]
    update = _make_update([spec], ["user_id"], "ts", GAP_MS, out_cols)
    prepared = s.toPandas()
    sizes = [len(f) for f in frames]
    st = FakeGroupState()
    got = []
    try:
        stateful._FORCE_SLOW = force_slow
        i0 = 0
        for sz in sizes:
            batch = prepared.iloc[i0 : i0 + sz].sort_values("ts")
            i0 += sz
            for out in update((1,), iter([batch]), st):
                got.extend(
                    (r.from_ts, r.to_ts) for r in out.itertuples(index=False)
                )
        packed = st._val
        st.hasTimedOut = True
        for out in update((1,), iter([]), st):
            got.extend(
                (r.from_ts, r.to_ts) for r in out.itertuples(index=False)
            )
    finally:
        stateful._FORCE_SLOW = False
    return sorted(got), packed


def _frame(rows):
    import datetime as dt

    epoch = dt.datetime(2024, 1, 1)
    return pd.DataFrame(
        [
            (
                1,
                epoch + dt.timedelta(milliseconds=ms),
                v,
                None if v is None or v != v else int(v),
                e,
            )
            for ms, v, e in rows
        ],
        columns=["user_id", "ts", "value", "ivalue", "etype"],
    )


@pytest.mark.parametrize(
    "pattern",
    ["lag(value, 5 sec) > 150", "wait(5 sec, value > 150)"],
)
def test_late_batch_demotes_pending_programs(spark, pattern):
    """Review-caught: a micro-batch starting BEFORE the carried pending
    queue's tail broke the vectorized searchsorted assumptions and
    silently diverged from the per-row feed (emissions AND checkpoint
    state). The prechecks now demote that batch to per-row."""
    b1 = _frame([(8000, 100.0, "hot"), (9000, 160.0, "hot")])
    b2 = _frame([(4000, 210.0, "hot"), (10000, 210.0, "hot")])
    fast = _drive_frames(spark, [b1, b2], pattern, force_slow=False)
    slow = _drive_frames(spark, [b1, b2], pattern, force_slow=True)
    assert fast == slow


def test_reducer_string_arg_drops_not_crashes(spark):
    """Review-caught: an in-kernel ReducerCall hit float('hot') →
    ValueError, and under ANSI mode the batch compiler's plain
    cast('double') threw CAST_INVALID_INPUT. Both now drop non-numeric
    elements (try_cast semantics); numeric strings still fold in."""
    from tsp_spark.compile.compiler import compile_pattern

    rows = [(i * 1000, 100.0 + i * 10, "hot" if i % 2 else "cold") for i in range(20)]
    rows[3] = (3000, 130.0, "250")   # numeric string folds in
    rows[5] = (5000, None, None)     # NULL string drops
    pdf = _frame(rows)
    pat = "countOf(value, etype; _ > 0) >= 1 and avg(value, 10 sec) > 150"
    fast, _ = _drive(spark, pdf, pat, 7, lambda k: False)
    slow, _ = _drive(spark, pdf, pat, 7, lambda k: True)
    ft = {"value": "float64", "ivalue": "int64", "etype": "string"}
    res = compile_pattern(
        spark.createDataFrame(pdf), pat, ["user_id"], "ts", ft, GAP_MS
    )
    batch = sorted((r["from_ts"], r["to_ts"]) for r in res.collect())
    assert fast == slow
    assert [(f.to_pydatetime(), t.to_pydatetime()) for f, t in fast] == batch
    assert len(batch) > 0


@pytest.mark.parametrize(
    "pattern",
    [
        "lag(lag(value, 5 sec), 10 sec) > 150",
        "lag(lag(value, 5 sec)) > 150",
        "lag(lag(lag(value, 2 sec), 3 sec), 5 sec) > 150",
        "lag(lag(etype, 5 sec), 5 sec) = 'hot'",
        "avg(lag(lag(value, 5 sec), 5 sec), 10 sec) > 150",
        "lag(lag(value, 5 sec), 5 sec) > 150 for 20 sec >= 3 times",
        "value > 150 andThen lag(lag(value, 5 sec), 5 sec) > 150",
        "lag(lag(value, 5 sec), 5 sec) > 150 until value > 205",
        "wait(10 sec, lag(lag(value, 5 sec), 5 sec) > 150)",
    ],
)
def test_nested_lag_forking_matches_batch(spark, pattern):
    """r6c: a pending lag nested inside another lag's lookback — the
    kernel's last declared boundary — runs incrementally via
    speculative branch forking (_WindowedCondProgram._fork_terms):
    while the inner bridge is undecided the program state forks per
    hypothesis, rows feed every branch, only the branch-agreed prefix
    emits, and the inner's next emission joins. Must equal the batch
    compiler across chunked micro-batches (state pack/unpack between
    chunks exercises the branch codec)."""
    from tsp_spark.compile.compiler import compile_pattern

    ft = {"value": "float64", "ivalue": "int64", "etype": "string"}
    for seed in (7, 31):
        pdf = _gen(seed=seed, n=350)
        src = spark.createDataFrame(pdf)
        batch = sorted(
            (r["from_ts"], r["to_ts"])
            for r in compile_pattern(
                src, pattern, ["user_id"], "ts", ft, GAP_MS
            ).collect()
        )
        got, _ = _drive(spark, pdf, pattern, 53, lambda k: True)
        got = [(f.to_pydatetime(), t.to_pydatetime()) for f, t in got]
        assert got == batch, f"seed={seed}"


def test_andthen_absent_run_end_index(spark):
    """r6c review of the nested-lag work surfaced a PRE-EXISTING chain
    bug: _AndThenSM closed a side's run with end index ``idx-1`` even
    when the trailing rows were ABSENT for that side, so the run
    claimed indices it never covered and stole matches that belonged
    to a later run (seed 31: an inverted from>to incident plus a
    missing one). Runs now close at the side's last VISIBLE index."""
    from tsp_spark.compile.compiler import compile_pattern

    ft = {"value": "float64", "ivalue": "int64", "etype": "string"}
    for pat in [
        "value > 150 andThen lag(value, 5 sec) > 150",
        "lag(value, 5 sec) > 150 andThen value > 205",
        "value < 100 andThen lag(value, 3 sec) > 150 andThen value > 205",
    ]:
        for seed in (31, 11, 23):
            pdf = _gen(seed=seed, n=350)
            src = spark.createDataFrame(pdf)
            batch = sorted(
                (r["from_ts"], r["to_ts"])
                for r in compile_pattern(
                    src, pat, ["user_id"], "ts", ft, GAP_MS
                ).collect()
            )
            got, _ = _drive(spark, pdf, pat, 53, lambda k: True)
            got = [(f.to_pydatetime(), t.to_pydatetime()) for f, t in got]
            assert got == batch, f"{pat} seed={seed}"
            for f, t in got:
                assert f <= t


@pytest.mark.parametrize(
    "pattern",
    [
        "lag(lag(value, 5 sec), 10 sec) > 150",
        "lag(lag(value, 3 sec), 3 sec) > value",
        "lag(lag(ivalue, 5 sec), 5 sec) = ivalue",
    ],
)
def test_fork_bulk_path_equivalent(spark, pattern):
    """r8: the double-pending-lag family's vectorized bulk path
    (vectorized.fork_pending_batch — no speculative forks on the
    decided prefix) must equal the per-row fork path row-for-row
    across chunked micro-batches, including MID-STREAM path
    alternation (per-row chunks leave open branches/pending that the
    bulk head must drain per-row before vectorizing), and equal the
    batch compiler end-to-end."""
    from tsp_spark.compile.compiler import compile_pattern

    ft = {"value": "float64", "ivalue": "int64", "etype": "string"}
    for seed in (11, 23, 47):
        pdf = _gen(seed=seed, n=500)
        for chunk in (37, 211):
            fast, _sf = _drive(spark, pdf, pattern, chunk, lambda k: False)
            slow, _ss = _drive(spark, pdf, pattern, chunk, lambda k: True)
            assert fast == slow, f"seed={seed} chunk={chunk}"
            mixed, _sm = _drive(
                spark, pdf, pattern, chunk, lambda k: k % 2 == 0
            )
            assert mixed == slow, f"alternation seed={seed} chunk={chunk}"
        src = spark.createDataFrame(pdf)
        batch = sorted(
            (r["from_ts"], r["to_ts"])
            for r in compile_pattern(
                src, pattern, ["user_id"], "ts", ft, GAP_MS
            ).collect()
        )
        got = [(f.to_pydatetime(), t.to_pydatetime()) for f, t in fast]
        assert got == batch, f"batch parity seed={seed}"
