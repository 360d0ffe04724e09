"""Offline batch-vs-kernel parity for the round-5 totality shapes.

Drives the PRODUCTION update fn (stateful._make_update — the exact
callable applyInPandasWithState runs) with a stub GroupState over
chunked micro-batches, so state packs/unpacks through the int64 codecs
between chunks, and compares closed intervals against the batch
compiler. Covers the shapes that moved off the carry buffer in r5:
string lag (tagged value codec), nested window aggregates, lag-of-agg,
right-nested andThen (_SeqBoolProgram), wait / windowed terms under
boolean combinators (_ComboProgram), until over windowed terms, and
registry math inside windowed booleans. The streaming-query path
(watermark, timeout, checkpoint) is covered by the slower parity tests
in test_stateful_patterns.py and tools/fuzz_stateful.py.
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from kernel_parity import PINNED, compare, gen_series  # noqa: E402

FT = {"value": "float64", "event_type": "string", "ivalue": "int64"}


@pytest.fixture(scope="module")
def series(spark):
    src = gen_series(random.Random(7), spark).cache()
    src.count()
    yield src
    src.unpersist()


@pytest.mark.parametrize("pat", PINNED)
def test_offline_parity_pinned(spark, series, pat):
    diff = compare(spark, series, pat, FT, chunk=13)
    assert diff is None, f"[{pat}] {diff}"


def test_offline_parity_multi_pattern(spark, series):
    """Several heterogeneous patterns through ONE multi-spec kernel
    (the production topology: one shuffle, one state store, N state
    machines) — per-pattern intervals equal the batch compiler's."""
    from kernel_parity import FakeGroupState, batch_intervals
    from tsp_spark.streaming.stateful import _make_update, build_spec

    pats = [
        "value > 150",
        "avg(value, 10 sec) > 150 for 10 sec",
        "value > 150 andThen (value < 120 andThen value > 150)",
        "value > 80 and wait(5 sec, lag(event_type, 5 sec) = 'hot')",
    ]
    cur = series
    specs = []
    for pid, pat in enumerate(pats, start=1):
        cur, spec = build_spec(
            cur, pat, ["user_id"], "ts", FT, 15_000, pattern_id=pid
        )
        specs.append(spec)
    out_cols = [
        "pattern_id", "subunit", "user_id", "from_ts", "to_ts", "n_rows",
    ]
    update = _make_update(specs, ["user_id"], "ts", 15_000, out_cols)
    pdf = cur.orderBy("user_id", "ts").toPandas()
    got: dict[int, set] = {pid: set() for pid in range(1, len(pats) + 1)}

    def collect(dfs):
        for out in dfs:
            for r in out.itertuples(index=False):
                got[r.pattern_id].add(
                    (
                        r.user_id,
                        int(r.from_ts.value // 1_000_000),
                        int(r.to_ts.value // 1_000_000),
                    )
                )

    for kv, grp in pdf.groupby("user_id"):
        g = grp.sort_values("ts").reset_index(drop=True)
        st = FakeGroupState()
        for i0 in range(0, len(g), 17):
            collect(update((kv,), iter([g.iloc[i0 : i0 + 17]]), st))
        st.hasTimedOut = True
        collect(update((kv,), iter([]), st))

    for pid, pat in enumerate(pats, start=1):
        batch = batch_intervals(series, pat, ["user_id"], "ts", FT)
        assert got[pid] == batch, (
            f"[{pat}] missing={sorted(batch - got[pid])[:3]} "
            f"spurious={sorted(got[pid] - batch)[:3]}"
        )


def test_offline_parity_tiny_chunks(spark, series):
    """1-row micro-batches: every row crosses a state pack/unpack —
    the harshest codec exercise for pending truth tables, seq-bool
    interval state, and combo queues."""
    for pat in (
        "lag(event_type, 5 sec) = 'hot'",
        "value > 150 andThen (value < 120 andThen value > 150)",
        "value > 150 and wait(5 sec, value < 120)",
        "avg(avg(value, 5 sec), 20 sec) > 150",
    ):
        diff = compare(spark, series, pat, FT, chunk=1)
        assert diff is None, f"[{pat}] {diff}"


def test_pure_lag1_chain_int_nulls(spark):
    """r6d regression (review-caught can_pend under-report): a PURE
    lag1 chain — lag(lag(x)), no window_ms anywhere — is still
    pending-capable, because a dep-bearing lag1's skip rows (inner
    absent) go 'u' on the lag's OWN bridge. can_pend=False made
    _buffered() skip serializing the spec-level row/cond queues at
    micro-batch pack time while the program kept its internal pending
    row, desyncing the row/cond pairing for the rest of the key's
    stream (10 divergences on this exact series pre-fix). The sharp
    repro needs an INT column with mid-stream NULLs: a NULL int is
    genuinely ABSENT (a NULL float decodes to NaN, which is present
    and bridges), so the skip path fires away from series heads."""
    import datetime as dt

    from kernel_parity import batch_intervals, kernel_intervals
    from tsp_spark.streaming.stateful import build_spec

    EPOCH = dt.datetime(2024, 1, 1)
    vals = [
        200, 210, None, 220, 90, 95, 230, 240, 85,
        250, None, 260, 80, 270, 275, 88, 280, 290,
    ]
    src = spark.createDataFrame(
        [(1, EPOCH + dt.timedelta(seconds=i), v) for i, v in enumerate(vals)],
        "user_id bigint, ts timestamp, ivalue bigint",
    )
    ft = {"ivalue": "int64"}
    for pat in ("lag(lag(ivalue)) > 100", "lag(lag(lag(ivalue))) > 100"):
        _, spec = build_spec(
            src, pat, ["user_id"], "ts", ft, 15_000, pattern_id=1
        )
        progs = [c for c in spec.cond_cols if not isinstance(c, str)]
        assert progs and all(p.can_pend for p in progs), (
            f"[{pat}] dep-bearing lag1 chain must report can_pend "
            f"(it buffers the spec-level queues across micro-batches)"
        )
        batch = batch_intervals(src, pat, ["user_id"], "ts", ft)
        for chunk in (1, 2, 3, 4, 6):
            got = kernel_intervals(
                src, pat, ["user_id"], "ts", ft, chunk=chunk
            )
            assert got == batch, (
                f"[{pat}] chunk={chunk} missing={sorted(batch - got)[:3]} "
                f"spurious={sorted(got - batch)[:3]}"
            )


def test_bulk_pending_feed_is_transactional(spark):
    """r6d regression (review-caught): the bulk pending path
    (wait / single-pending-lag specs) caught VecUnsupported with NO
    snapshot/restore, unlike the fast path. A wait inner that mutates
    lag state (prev advances to batch END) before a later term raises
    (sum over values outside the stable float range) left the per-row
    replay reading batch-end lag at row 0 — spurious wait incidents
    (3 divergent chunkings on this exact series pre-fix)."""
    import datetime as dt

    from kernel_parity import batch_intervals, kernel_intervals

    EPOCH = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(30):
        v = 1e16 + 0.5 + i            # forces the stable-sum-range raise
        y = 1e18 if i < 25 else 1.0   # lag > sum until late, then far below
        rows.append((1, EPOCH + dt.timedelta(seconds=i), v, y))
    src = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, value double, yval double"
    )
    ft = {"value": "float64", "yval": "float64"}
    pat = "wait(5 sec, sum(value, 60 sec) > lag(yval))"
    batch = batch_intervals(src, pat, ["user_id"], "ts", ft)
    for chunk in (30, 15, 10):
        got = kernel_intervals(src, pat, ["user_id"], "ts", ft, chunk=chunk)
        assert got == batch, (
            f"chunk={chunk} missing={sorted(batch - got)[:3]} "
            f"spurious={sorted(got - batch)[:3]}"
        )


def test_jvm_int_cast_parity(spark):
    """r6d (review-caught): `x as intN` must behave like the
    reference's decodeToInt `d.toInt` (BasicDecoders.scala:89-91) on
    every path — NaN → 0 (a NULL float field IS NaN), float sources
    saturate, int8/int16 narrow by signed low-bits wrap. Previously
    the batch path crashed on NaN/overflow (Spark ANSI cast), the
    per-row kernel crashed on int(nan), and the vectorized path
    silently passed NaN through — three different behaviors."""
    import datetime as dt

    from kernel_parity import batch_intervals, kernel_intervals

    EPOCH = dt.datetime(2024, 1, 1)
    vals = [
        150.0, None, 3e9, -3e9, 200.5, None, 1e20, 130.7, -150.2, 90.0,
        2147483646.9, 180.0, None, 250.0, 99.0, 175.5,
    ]
    src = spark.createDataFrame(
        [(1, EPOCH + dt.timedelta(seconds=i), v) for i, v in enumerate(vals)],
        "user_id bigint, ts timestamp, value double",
    )
    ft = {"value": "float64"}
    for pat in (
        "value as int32 > 100",
        "value as int64 > 100",
        "value as int8 > 50",          # (byte)200.5 = -56: wrap visible
        "value as int32 >= 2147483647",  # saturation visible
        "avg(value as int32, 5 sec) > 100",
    ):
        batch = batch_intervals(src, pat, ["user_id"], "ts", ft)
        for chunk in (1, 4, 16):
            got = kernel_intervals(src, pat, ["user_id"], "ts", ft, chunk=chunk)
            assert got == batch, (
                f"[{pat}] chunk={chunk} missing={sorted(batch - got)[:3]} "
                f"spurious={sorted(got - batch)[:3]}"
            )

    from tsp_spark.streaming.stateful import _jvm_int

    # JVM ground truth: (int)NaN = 0, (long)1e20 = Long.MAX,
    # (byte)200.5 = -56, (short)(int)-3e9 wraps the saturated int32
    assert _jvm_int(float("nan"), "int32") == 0
    assert _jvm_int(1e20, "int64") == 9223372036854775807
    assert _jvm_int(200.5, "int8") == -56
    assert _jvm_int(3e9, "int32") == 2147483647
    assert _jvm_int(-3e9, "int32") == -2147483648
    assert _jvm_int(65536 + 7, "int16") == 7
