from __future__ import annotations

import pytest

from tsp_spark.compile import compile_pattern


def _events(spark, mk_ts, rows, schema="unit string, ts timestamp, x double, s string"):
    return spark.createDataFrame([(u, mk_ts(t), *rest) for (u, t, *rest) in rows], schema)


def _iv(df):
    return sorted(
        (r.unit, r.from_ts.timestamp() % 86400, r.to_ts.timestamp() % 86400)
        for r in df.collect()
    )


def test_simple_comparison(spark, mk_ts):
    df = _events(
        spark, mk_ts,
        [("a", 0, 1.0, "x"), ("a", 10, 5.0, "x"), ("a", 20, 6.0, "x"), ("a", 30, 1.0, "x")],
    )
    out = compile_pattern(df, "x > 4", ["unit"], "ts")
    assert _iv(out) == [("a", 10.0, 20.0)]


def test_timer_for(spark, mk_ts):
    rows = [("a", t, 9.0 if 10 <= t <= 40 else 0.0, "x") for t in range(0, 60, 5)]
    df = _events(spark, mk_ts, rows)
    out = compile_pattern(df, "x > 4 for 10 sec", ["unit"], "ts")
    # run is [10,40]; satisfied from 20 (held 10s) to 40
    assert _iv(out) == [("a", 20.0, 40.0)]


def test_timer_gap_resets(spark, mk_ts):
    rows = [("a", 0, 9.0, "x"), ("a", 5, 9.0, "x"), ("a", 120, 9.0, "x"), ("a", 125, 9.0, "x")]
    df = _events(spark, mk_ts, rows)
    out = compile_pattern(df, "x > 4 for 5 sec", ["unit"], "ts", max_gap_ms=60_000)
    assert _iv(out) == [("a", 5.0, 5.0), ("a", 125.0, 125.0)]


def test_andthen(spark, mk_ts):
    rows = [
        ("a", 0, 1.0, "x"), ("a", 10, 9.0, "x"), ("a", 20, 9.0, "x"),
        ("a", 30, 2.0, "x"), ("a", 40, 2.0, "x"),
    ]
    df = _events(spark, mk_ts, rows)
    out = compile_pattern(df, "x > 4 andThen x < 3", ["unit"], "ts")
    assert _iv(out) == [("a", 10.0, 40.0)]


def test_andthen_no_match_across_gap(spark, mk_ts):
    """A series split resets ALL pattern state (PatternProcessor.scala:
    33-56): an A-run ending just before a >maxGap gap must not sequence
    with a B-run starting right after it, even though the raw indices
    are adjacent."""
    rows = [
        ("a", 0, 9.0, "x"), ("a", 10, 9.0, "x"),
        # > 60 s gap — new sub-series
        ("a", 120, 2.0, "x"), ("a", 130, 2.0, "x"),
    ]
    df = _events(spark, mk_ts, rows)
    out = compile_pattern(df, "x > 4 andThen x < 3", ["unit"], "ts", max_gap_ms=60_000)
    assert _iv(out) == []
    # control: same shape inside one series does match
    rows2 = [
        ("a", 0, 9.0, "x"), ("a", 10, 9.0, "x"),
        ("a", 20, 2.0, "x"), ("a", 30, 2.0, "x"),
    ]
    out2 = compile_pattern(_events(spark, mk_ts, rows2), "x > 4 andThen x < 3", ["unit"], "ts", max_gap_ms=60_000)
    assert _iv(out2) == [("a", 0.0, 30.0)]


def test_and_or_trilean(spark, mk_ts):
    df = spark.createDataFrame(
        [("a", mk_ts(0), 5.0, None), ("a", mk_ts(10), 5.0, 1.0), ("a", mk_ts(20), 0.0, None)],
        "unit string, ts timestamp, x double, y double",
    )
    # or tolerates one-sided Fail: x>4 or y>0 at t=0 → true (x side)
    out = compile_pattern(df, "x > 4 or y > 0", ["unit"], "ts")
    assert _iv(out) == [("a", 0.0, 10.0)]
    # and fails on Fail: only t=10 matches
    out2 = compile_pattern(df, "x > 4 and y > 0", ["unit"], "ts")
    assert _iv(out2) == [("a", 10.0, 10.0)]


def test_windowed_avg(spark, mk_ts):
    rows = [("a", t, float(v), "x") for t, v in [(0, 0), (10, 0), (20, 60), (30, 60), (40, 60)]]
    df = _events(spark, mk_ts, rows)
    # trailing 20s avg > 30: at t=30 avg(60,60,60)=60 wait frame [10,30]: (0+60+60)/3=40>30 ✓
    out = compile_pattern(df, "avg(x, 20 sec) > 30", ["unit"], "ts")
    assert _iv(out) == [("a", 30.0, 40.0)]


def test_lag(spark, mk_ts):
    rows = [("a", 0, 1.0, "x"), ("a", 10, 2.0, "x"), ("a", 20, 1.5, "x")]
    df = _events(spark, mk_ts, rows)
    out = compile_pattern(df, "x > lag(x)", ["unit"], "ts")
    assert _iv(out) == [("a", 10.0, 10.0)]


def test_for_with_times(spark, mk_ts):
    # x>4 true 3 times within 30s window, require > 2 times (≥3)
    rows = [("a", t, 9.0 if t in (0, 10, 20) else 0.0, "x") for t in range(0, 40, 5)]
    df = _events(spark, mk_ts, rows)
    out = compile_pattern(df, "x > 4 for 30 sec > 2 times", ["unit"], "ts")
    rows_out = _iv(out)
    assert rows_out and rows_out[0][0] == "a"


def test_until(spark, mk_ts):
    rows = [("a", 0, 9.0, "ok"), ("a", 10, 9.0, "ok"), ("a", 20, 9.0, "stop"), ("a", 30, 9.0, "ok")]
    df = _events(spark, mk_ts, rows)
    out = compile_pattern(
        df, "x > 4 until s = 'stop'", ["unit"], "ts", fields_types={"s": "string", "x": "float64"}
    )
    assert _iv(out) == [("a", 0.0, 10.0), ("a", 30.0, 30.0)]


def test_wait(spark, mk_ts):
    rows = [("a", 0, 0.0, "x"), ("a", 10, 0.0, "x"), ("a", 20, 9.0, "x"), ("a", 30, 0.0, "x")]
    df = _events(spark, mk_ts, rows)
    out = compile_pattern(df, "wait(15 sec, x > 4)", ["unit"], "ts")
    # x>4 at t=20 → wait window makes [5?..] true at rows with ts in [20-15, 20]
    assert _iv(out) == [("a", 10.0, 20.0)]


def test_reducer(spark, mk_ts):
    df = spark.createDataFrame(
        [("a", mk_ts(0), 1.0, 2.0, -3.0)],
        "unit string, ts timestamp, p double, q double, r double",
    )
    out = compile_pattern(df, "sumOf(p, q, r; _ > 0) = 3", ["unit"], "ts")
    assert len(out.collect()) == 1
    out2 = compile_pattern(df, "countOf(p, q, r; _ > 0) = 2", ["unit"], "ts")
    assert len(out2.collect()) == 1
    out3 = compile_pattern(df, "avgOf(p, q, r) = 0", ["unit"], "ts")
    assert len(out3.collect()) == 1


def test_nested_lag_and_agg_product(spark, mk_ts):
    rows = [("a", t, float(t), "x") for t in range(0, 50, 10)]
    df = _events(spark, mk_ts, rows)
    # nested window functions must materialize, not error
    compile_pattern(df, "lag(lag(x)) >= 0", ["unit"], "ts").collect()
    compile_pattern(df, "count(x, 20 sec) * sum(x, 20 sec) >= 0", ["unit"], "ts").collect()
    compile_pattern(df, "avg(x, 20 sec) >= 8 for 20 sec > 10 sec", ["unit"], "ts").collect()


def test_cast_and_math(spark, mk_ts):
    df = _events(spark, mk_ts, [("a", 0, 5.7, "x")])
    out = compile_pattern(df, "x as int32 = 5", ["unit"], "ts")
    assert len(out.collect()) == 1
    out2 = compile_pattern(df, "abs(x - 6) < 0.5", ["unit"], "ts")
    assert len(out2.collect()) == 1


def test_jvm_cast_semantics_batch(spark, mk_ts):
    """r6d (review-caught): `x as intN` follows the reference's
    decodeToInt `d.toInt` (BasicDecoders.scala:89-91) — NaN (a NULL
    float field) casts to 0 instead of crashing Spark's ANSI cast,
    floats saturate (with (long)d = Long.MAX exactly for d >= 2^63,
    not the largest-double-below-2^63 clamp), int8/int16 narrow by
    signed low-bits wrap."""
    df = _events(
        spark, mk_ts,
        [("a", 0, None, "x"), ("a", 10, 1e20, "x"), ("a", 20, 200.5, "x")],
    )
    # NaN -> 0: only the NULL row matches = 0
    out = compile_pattern(df, "x as int32 = 0", ["unit"], "ts")
    assert len(out.collect()) == 1
    # saturation hits Long.MAX exactly (off-by-1023 clamp would miss)
    out2 = compile_pattern(
        df, "x as int64 >= 9223372036854775000", ["unit"], "ts"
    )
    assert len(out2.collect()) == 1
    # (byte)200.5 = -56
    out3 = compile_pattern(df, "x as int8 = 0 - 56", ["unit"], "ts")
    assert len(out3.collect()) == 1


def test_none_max_gap_keeps_segmentizer_bridge(spark, mk_ts):
    """r6d (review-caught): max_gap_ms=None must behave like an
    infinite gap, not silently skip the lag Segmentizer bridge (the
    probe-compile guard keyed on the series column's absence, which a
    None-gap evaluation also hit)."""
    import random

    rng = random.Random(11)
    rows, t = [], 0.0
    for _ in range(150):
        t += rng.choice([0.5, 1.0, 1.0, 7.0, 9.0])
        v = None if rng.random() < 0.08 else rng.choice([40.0, 60.0, 60.0, 80.0])
        rows.append(("a", t, v, "x"))
    df = _events(spark, mk_ts, rows)
    for pat in ("lag(lag(x, 5 sec)) > 50", "lag(x, 5 sec) > 50"):
        a = sorted(
            (r["from_ts"], r["to_ts"], r["n_rows"])
            for r in compile_pattern(
                df, pat, ["unit"], "ts", max_gap_ms=None
            ).collect()
        )
        b = sorted(
            (r["from_ts"], r["to_ts"], r["n_rows"])
            for r in compile_pattern(
                df, pat, ["unit"], "ts", max_gap_ms=10**12
            ).collect()
        )
        assert a == b, f"[{pat}] None-gap diverged from infinite-gap"


def test_bare_numeric_pattern_keeps_present(spark, mk_ts):
    """r6d (review-caught): a bare numeric top-level pattern (nonzero =
    true) must forward the present mask — a lag's absent rows are
    invisible indices, not Fail run-breaks."""
    rows = [("a", t, 5.0, "x") for t in range(6)]
    df = _events(spark, mk_ts, rows)
    # lag(x) is absent at the series head only; one unbroken true run
    out = compile_pattern(df, "lag(x) for 2 sec", ["unit"], "ts")
    ivs = out.collect()
    assert len(ivs) == 1, f"expected one run, got {len(ivs)}"


def test_minof_propagates_nan(spark, mk_ts):
    """r6d (review-caught): the reference folds Math.min, which
    PROPAGATES NaN (FunctionRegistry.scala:473-485) — a NULL float
    argument poisons minOf instead of being skipped by array_min's
    NaN-greatest order. Math.max coincides with array_max, so maxOf
    was already right."""
    df = spark.createDataFrame(
        [
            ("a", mk_ts(0), 50.0, 70.0),
            ("a", mk_ts(10), 50.0, None),   # NaN arg -> minOf = NaN
            ("a", mk_ts(20), 200.0, 90.0),
        ],
        "unit string, ts timestamp, p double, q double",
    )
    out = compile_pattern(df, "minOf(p, q) < 100", ["unit"], "ts")
    ivs = sorted(r["from_ts"].timestamp() % 86400 for r in out.collect())
    assert len(ivs) == 2  # rows 0 and 2; the NaN row is excluded


def test_window_agg_prefix_matches_frame(spark):
    """r11: sum/count/avg via the O(n) prefix-difference windows (two
    growing frames: running cumulative minus its value at or before
    t - w) == the sliding-frame form — EXACTLY, on integer-valued
    doubles (their partial sums are exactly representable), across
    gap splits, empty half-open frames, masked inners (agg over lag),
    and the sharded kernel. The prefix form is what 'auto' uses for
    count always and for sum/avg at >= 5 min windows (PREFIX_WINDOW_AGG_MIN_MS) — Spark's
    sliding frame re-aggregates the buffer per row, O(n x w_rows)
    (tools/bench_window_frames.py: avg(x, 24 hr) at 2M rows was 230x
    the 30 s form before this path existed)."""
    import datetime
    import random

    from tsp_spark.api import RawPattern, search_incidents

    rng = random.Random(0x11A6)
    rows = []
    for key in ("a", "b"):
        t = 0
        for _ in range(400):
            t += rng.choice([1, 2, 3, 59, 61, 120])
            rows.append(
                (key,
                 datetime.datetime(2024, 1, 1)
                 + datetime.timedelta(seconds=t),
                 float(rng.randint(0, 9)))
            )
    df = spark.createDataFrame(rows, "unit string, ts timestamp, x double")
    pats = [
        RawPattern(1, "avg(x, 7 sec) > 4.5"),
        RawPattern(2, "sum(x, 5 sec) >= 12"),
        RawPattern(3, "count(x, 9 sec) >= 3"),
        RawPattern(4, "avg(lag(x), 6 sec) > 4.5"),
        RawPattern(5, "avg(x, 2 hr) > 4.5"),  # past the auto threshold
    ]
    kw = dict(
        keys=["unit"], ts="ts", fields_types={"x": "float64"},
        max_gap_ms=60_000, session_gap_ms=1_000,
    )
    frame = sorted(map(tuple, search_incidents(
        df, pats, shard_ms=None, window_agg="frame", **kw).collect()))
    prefix = sorted(map(tuple, search_incidents(
        df, pats, shard_ms=None, window_agg="prefix", **kw).collect()))
    auto = sorted(map(tuple, search_incidents(
        df, pats, shard_ms=None, **kw).collect()))
    assert frame == prefix == auto and len(frame) > 0
    # sharded kernel with the prefix frames inside
    sharded = sorted(map(tuple, search_incidents(
        df, pats, shard_ms=30_000, window_agg="prefix", **kw).collect()))
    assert sharded == frame


def test_truthstat_prefix_matches_frame(spark):
    """r12 (VERDICT r11 Next #1): ForWithInterval truth-stats (`for T
    <op> N times` / `<op> T'`) via the O(n) growing-frame difference ==
    the sliding RANGE frame — EXACTLY. The summed quantities are
    integer 0/1 counts and integer inter-event millis, so prefix
    subtraction is bit-exact and 'auto'/'prefix' switch unconditionally
    (no float-association gate, unlike sum/avg). Covers the times kind,
    the time kind (whose first-row NULL delta exercises the NULL-skip
    equivalence), `exactly`, hi-bounded ranges, a 2 hr window, gap
    splits, and the sharded kernel."""
    import datetime
    import random

    from tsp_spark.api import RawPattern, search_incidents

    rng = random.Random(0x12A7)
    rows = []
    for key in ("a", "b"):
        t = 0
        for _ in range(400):
            t += rng.choice([1, 2, 3, 59, 61, 120])
            rows.append(
                (key,
                 datetime.datetime(2024, 1, 1)
                 + datetime.timedelta(seconds=t),
                 float(rng.randint(0, 9)))
            )
    df = spark.createDataFrame(rows, "unit string, ts timestamp, x double")
    pats = [
        RawPattern(1, "x > 4 for 10 sec > 2 times"),
        RawPattern(2, "x > 4 for 30 sec > 10 sec"),
        RawPattern(3, "x > 4 for exactly 1 min > 3 times"),
        RawPattern(4, "x > 4 for 20 sec < 4 times"),
        RawPattern(5, "x > 4 for 1 min 5 to 40 sec"),
        RawPattern(6, "x < 5 for 2 hr > 30 times"),
    ]
    kw = dict(
        keys=["unit"], ts="ts", fields_types={"x": "float64"},
        max_gap_ms=60_000, session_gap_ms=1_000,
    )
    frame = sorted(map(tuple, search_incidents(
        df, pats, shard_ms=None, window_agg="frame", **kw).collect()))
    prefix = sorted(map(tuple, search_incidents(
        df, pats, shard_ms=None, window_agg="prefix", **kw).collect()))
    auto = sorted(map(tuple, search_incidents(
        df, pats, shard_ms=None, **kw).collect()))
    assert frame == prefix == auto and len(frame) > 0
    sharded = sorted(map(tuple, search_incidents(
        df, pats, shard_ms=30_000, window_agg="prefix", **kw).collect()))
    assert sharded == frame


def test_truth_stats_helper_prefix_matches_frame(spark):
    """ops.windows.truth_stats form='prefix' (r12 default) == the
    sliding-frame form on all four stat columns, including the NULL
    first-row delta and NULL cond values."""
    import datetime

    from pyspark.sql import functions as F

    from tsp_spark.ops.windows import truth_stats

    rows = []
    vals = [5.0, None, 9.0, 1.0, None, 7.0, 2.0, 8.0, 3.0, 6.0]
    for key in ("a", "b"):
        for i, v in enumerate(vals):
            rows.append(
                (key,
                 datetime.datetime(2024, 1, 1)
                 + datetime.timedelta(seconds=i * i * 3),
                 v)
            )
    df = spark.createDataFrame(rows, "unit string, ts timestamp, x double")
    cond = F.col("x") > 4
    out = {}
    for form in ("prefix", "frame"):
        stats = truth_stats(cond, ["unit"], "ts", 20.0, form=form)
        out[form] = sorted(
            map(tuple,
                df.select("unit", "ts", *[c.alias(n) for n, c in stats.items()])
                .collect())
        )
    assert out["prefix"] == out["frame"] and len(out["prefix"]) == 20


def test_minmax_wait_block_matches_frame(spark):
    """r12 (VERDICT r11 Next #3): windowed min/max and `wait` via the
    two-block decomposition (_block_extreme: aligned window-width
    blocks, per-block prefix/suffix extremes over GROWING frames, as-of
    stitch with sentinel rows) == the sliding-frame form — EXACTLY.
    min/max are order-insensitive so there is no float-association
    carve-out at any window length. Covers min, max, wait (the closed
    LEADING frame on negated time), a masked inner (max over lag),
    windows on both sides of the auto threshold, gap splits, ties
    (duplicate timestamps), and the sharded kernel."""
    import datetime
    import random

    from tsp_spark.api import RawPattern, search_incidents

    rng = random.Random(0x12B3)
    rows = []
    for key in ("a", "b"):
        t = 0
        for _ in range(400):
            t += rng.choice([0, 1, 2, 3, 59, 61, 120])  # 0 → tied ts
            rows.append(
                (key,
                 datetime.datetime(2024, 1, 1)
                 + datetime.timedelta(seconds=t),
                 float(rng.randint(0, 99)))
            )
    df = spark.createDataFrame(rows, "unit string, ts timestamp, x double")
    pats = [
        RawPattern(1, "max(x, 7 sec) > 90"),
        RawPattern(2, "min(x, 13 sec) < 5"),
        RawPattern(3, "wait(9 sec, x > 95)"),
        RawPattern(4, "max(lag(x), 6 sec) > 90"),
        RawPattern(5, "min(x, 2 hr) < 1"),      # past the auto threshold
        RawPattern(6, "wait(2 hr, x > 98)"),    # leading, past threshold
    ]
    kw = dict(
        keys=["unit"], ts="ts", fields_types={"x": "float64"},
        max_gap_ms=60_000, session_gap_ms=1_000,
    )
    frame = sorted(map(tuple, search_incidents(
        df, pats, shard_ms=None, window_agg="frame", **kw).collect()))
    prefix = sorted(map(tuple, search_incidents(
        df, pats, shard_ms=None, window_agg="prefix", **kw).collect()))
    auto = sorted(map(tuple, search_incidents(
        df, pats, shard_ms=None, **kw).collect()))
    assert frame == prefix == auto and len(frame) > 0
    sharded = sorted(map(tuple, search_incidents(
        df, pats, shard_ms=30_000, window_agg="prefix", **kw).collect()))
    assert sharded == frame


def test_window_agg_prefix_recovers_from_nonfinite(spark):
    """r12 (ADVICE r11 medium): a NaN or ±Inf input must poison windowed
    sum/avg only WHILE it is inside the window — the naive running
    cumulative stays NaN forever (NaN−NaN=NaN, Inf−Inf=NaN). The prefix
    form keeps the cumulative finite plus exact integer counts of
    NaN/+Inf/−Inf contributions, so it matches the frame form (and the
    DuckDB oracle, and the streaming kernel's deque recompute) even
    after the non-finite value leaves the window."""
    import datetime

    from tsp_spark.api import RawPattern, search_incidents

    inf = float("inf")
    rows = []
    for key, vals in (
        ("a", [5.0, None, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0]),  # None -> NaN
        ("b", [5.0, inf, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0]),
        ("c", [5.0, -inf, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0]),
        ("d", [5.0, inf, -inf, 5.0, 5.0, 5.0, 5.0, 5.0]),  # both signs
    ):
        for i, v in enumerate(vals):
            rows.append(
                (key,
                 datetime.datetime(2024, 1, 1)
                 + datetime.timedelta(seconds=3 * i),
                 v)
            )
    df = spark.createDataFrame(rows, "unit string, ts timestamp, x double")
    pats = [
        RawPattern(1, "avg(x, 7 sec) > 4"),
        RawPattern(2, "sum(x, 7 sec) >= 10"),
    ]
    kw = dict(
        keys=["unit"], ts="ts", fields_types={"x": "float64"},
        max_gap_ms=60_000, session_gap_ms=1_000, shard_ms=None,
    )
    frame = sorted(map(tuple, search_incidents(
        df, pats, window_agg="frame", **kw).collect()))
    prefix = sorted(map(tuple, search_incidents(
        df, pats, window_agg="prefix", **kw).collect()))
    assert frame == prefix and len(frame) > 0


def test_block_extreme_negative_epoch_parity(spark):
    """The two-block min/max decomposition buckets rows by
    floor(ms / W) — pre-1970 timestamps make ms (and the block ids and
    sentinel positions) NEGATIVE, exercising floor-toward-negative
    alignment. Parity vs the frame form must hold there too."""
    import datetime

    from tsp_spark.api import RawPattern, search_incidents

    rows = []
    base = datetime.datetime(1969, 12, 31, 12, 0, 0)  # straddles epoch 0
    vals = [50.0, 99.0, 10.0, 60.0, 3.0, 70.0, 95.0, 20.0, 80.0, 1.0]
    for key in ("a", "b"):
        for i, v in enumerate(vals):
            rows.append(
                (key, base + datetime.timedelta(hours=i * 5), v)
            )
    df = spark.createDataFrame(rows, "unit string, ts timestamp, x double")
    pats = [
        RawPattern(1, "max(x, 12 hr) > 90"),
        RawPattern(2, "min(x, 12 hr) < 5"),
        RawPattern(3, "wait(12 hr, x > 90)"),
    ]
    kw = dict(
        keys=["unit"], ts="ts", fields_types={"x": "float64"},
        max_gap_ms=86_400_000, session_gap_ms=1_000, shard_ms=None,
    )
    frame = sorted(map(tuple, search_incidents(
        df, pats, window_agg="frame", **kw).collect()))
    prefix = sorted(map(tuple, search_incidents(
        df, pats, window_agg="prefix", **kw).collect()))
    assert frame == prefix and len(frame) > 0


@pytest.mark.slow
@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_long_window_forms_random_parity(spark, seed):
    """r12 multi-seed sweep: every ≥5-min O(n) form (prefix sum/avg/
    count, truth-stat difference, two-block min/max, two-block wait)
    against the oracle-exact frame form on RANDOM series — duplicate
    timestamps, nulls, plateau values, and gaps larger than the window
    and larger than max_gap (series splits). The fixed-seed parity
    tests pin known edge cases; this sweep hunts unknown ones (the r11
    Segmentizer bridge bug was found by exactly such a sweep)."""
    import datetime
    import random

    from tsp_spark.api import RawPattern, search_incidents

    rng = random.Random(0x12C0 + seed)
    rows = []
    for key in ("a", "b", "c"):
        t = 0
        v = float(rng.randint(0, 9))
        for _ in range(rng.randint(40, 260)):
            t += rng.choice([0, 10, 30, 60, 120, 400, 2000])  # sec; 0=tie
            if rng.random() < 0.6:
                v = float(rng.randint(0, 9))
            rows.append(
                (key,
                 datetime.datetime(2024, 1, 1)
                 + datetime.timedelta(seconds=t),
                 None if rng.random() < 0.06 else v)
            )
    df = spark.createDataFrame(rows, "unit string, ts timestamp, x double")
    pats = [
        RawPattern(1, "avg(x, 6 min) > 4.5"),
        RawPattern(2, "sum(x, 11 min) >= 30"),
        RawPattern(3, "count(x, 7 min) >= 4"),
        RawPattern(4, "max(x, 9 min) > 8"),
        RawPattern(5, "min(x, 8 min) < 1"),
        RawPattern(6, "wait(6 min, x > 8)"),
        RawPattern(7, "x > 4 for 10 min > 3 times"),
        RawPattern(8, "x > 4 for 12 min > 5 min"),
    ]
    kw = dict(
        keys=["unit"], ts="ts", fields_types={"x": "float64"},
        max_gap_ms=900_000, session_gap_ms=5_000, shard_ms=None,
    )
    frame = sorted(map(tuple, search_incidents(
        df, pats, window_agg="frame", **kw).collect()))
    prefix = sorted(map(tuple, search_incidents(
        df, pats, window_agg="prefix", **kw).collect()))
    assert frame == prefix


def test_rate_gate_switches_short_dense_windows(spark):
    """r13 (VERDICT r12 Next #1): the O(n)-form gate is ROWS-IN-WINDOW
    aware, not just wall-clock. A 100 Hz series under a 2-min window
    holds 12,000 rows/frame — the exact O(n·w) cliff the long forms
    kill — but 2 min < PREFIX_WINDOW_AGG_MIN_MS, so the old gate kept
    the frame form. With a measured event rate supplied (the
    auto-probe's hot-key rows/span), `auto` now switches. Checks the
    gate decision itself, the plan form actually chosen (the block
    min/max path is observable via Compiled.has_window=False), and
    end-to-end parity with the frame form."""
    import datetime

    from tsp_spark.compile.compiler import (
        PREFIX_WINDOW_AGG_MIN_MS,
        PREFIX_WINDOW_AGG_MIN_ROWS,
        PatternCompiler,
    )
    from tsp_spark.dsl.parser import parse_pattern

    ft = {"x": "float64"}
    norate = PatternCompiler(["unit"], "ts", ft, 60_000)
    with_rate = PatternCompiler(["unit"], "ts", ft, 60_000,
                                event_rate_hz=100.0)
    # gate decisions: 2 min at 100 Hz = 12,000 rows -> long form;
    # the same window with no rate knowledge stays on the frame form;
    # a window below MIN_ROWS at the given rate stays too (100 Hz x
    # 9 s = 900 rows < 1,000); the wall-clock floor still applies
    assert not norate._long_window(120_000)
    assert with_rate._long_window(120_000)
    assert not with_rate._long_window(
        (PREFIX_WINDOW_AGG_MIN_ROWS - 100) * 10  # 9 s at 100 Hz
    )
    assert norate._long_window(PREFIX_WINDOW_AGG_MIN_MS)
    # plan form: min/max at 2 min with the rate -> block decomposition;
    # without -> sliding frame (observed via the compiler's form notes —
    # r14: comparison operands materialize their window column, so
    # Compiled.has_window is False for both forms at the top level)
    rows = [
        ("a",
         datetime.datetime(2024, 1, 1)
         + datetime.timedelta(milliseconds=10 * i),
         float(i % 100))
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "unit string, ts timestamp, x double")
    node = parse_pattern("max(x, 2 min) > 98", ft).inner \
        if hasattr(parse_pattern("max(x, 2 min) > 98", ft), "inner") \
        else parse_pattern("max(x, 2 min) > 98", ft)
    src_r = with_rate.with_series(df)
    src_n = norate.with_series(df)
    with_rate.window_forms.clear()
    norate.window_forms.clear()
    with_rate.compile_bool(src_r, node)
    norate.compile_bool(src_n, node)
    assert [f["form"] for f in with_rate.window_forms] == ["block"]
    assert [f["form"] for f in norate.window_forms] == ["frame"]
    # end-to-end parity at 100 Hz/2 min: the engaged long forms stay
    # exact (min/max bit-exact; integer-valued doubles sum exactly)
    from tsp_spark.api import RawPattern, search_incidents

    pats = [
        RawPattern(1, "max(x, 2 min) > 98"),
        RawPattern(2, "avg(x, 2 min) < 49"),
        RawPattern(3, "wait(2 min, x > 98)"),
    ]
    kw = dict(
        keys=["unit"], ts="ts", fields_types=ft,
        max_gap_ms=60_000, session_gap_ms=1_000, shard_ms=None,
    )
    frame = sorted(map(tuple, search_incidents(
        df, pats, window_agg="frame", **kw).collect()))
    prefix = sorted(map(tuple, search_incidents(
        df, pats, window_agg="prefix", **kw).collect()))
    assert frame == prefix and len(frame) > 0


def test_probe_rate_reaches_window_gate(spark, monkeypatch):
    """End-to-end: search_incidents' auto-probe measures the hot key's
    event rate, surfaces it in decision_sink (hot_rate_hz, probe_age_s)
    and feeds it to the compiler's rows-in-window gate."""
    import tsp_spark.api as api
    from tsp_spark.api import RawPattern, search_incidents

    from pyspark.sql import functions as F

    monkeypatch.setattr(api, "AUTO_PROBE_MIN_BYTES", 1)
    monkeypatch.setattr(api, "AUTO_HOT_ROWS_MIN", 10**12)  # never shard
    api.clear_auto_probe_cache()
    n = 5_000  # 100 Hz for 50 s
    ev = spark.range(n).select(
        F.lit("a").alias("unit"),
        F.timestamp_millis(
            F.lit(1_704_067_200_000) + F.col("id") * 10
        ).alias("ts"),
        (F.pmod(F.xxhash64("id"), F.lit(100)).cast("double")).alias("x"),
    )
    pats = [RawPattern(1, "avg(x, 30 sec) > 55")]
    kw = dict(
        keys=["unit"], ts="ts", fields_types={"x": "float64"},
        max_gap_ms=60_000, session_gap_ms=1_000,
    )
    d: dict = {}
    auto = sorted(map(tuple, search_incidents(
        ev, pats, decision_sink=d, **kw).collect()))
    assert d["probed"] and d["shard_ms"] is None
    assert 90.0 <= d["hot_rate_hz"] <= 110.0
    assert d["probe_age_s"] == 0.0
    frame = sorted(map(tuple, search_incidents(
        ev, pats, shard_ms=None, window_agg="frame", **kw).collect()))
    assert auto == frame and len(auto) > 0
    # second call: served from the memo, age now recorded
    d2: dict = {}
    search_incidents(ev, pats, decision_sink=d2, **kw).count()
    assert d2["probe_cached"] and d2["probe_age_s"] >= 0.0
    assert d2["hot_rate_hz"] == d["hot_rate_hz"]
    # r13: the probe trigger is DECOUPLED from shard eligibility — a
    # max_gap_ms=None job (never shardable) with a sub-5-min window
    # still probes, so the rows-in-window gate engages (found by the
    # --hz bench: such jobs silently stayed on the frame form)
    d3: dict = {}
    kw_nogap = dict(kw, max_gap_ms=None)
    auto_ng = sorted(map(tuple, search_incidents(
        ev, pats, decision_sink=d3, **kw_nogap).collect()))
    assert d3["probed"] and not d3["eligible"] and d3["shard_ms"] is None
    assert 90.0 <= d3["hot_rate_hz"] <= 110.0
    frame_ng = sorted(map(tuple, search_incidents(
        ev, pats, shard_ms=None, window_agg="frame", **kw_nogap).collect()))
    assert auto_ng == frame_ng
    api.clear_auto_probe_cache()


def test_rate_gate_downgrades_sparse_long_windows(spark, monkeypatch):
    """r14 (optimization round): the rows-in-window gate decides in
    BOTH directions once a rate is measured. A source whose densest
    gate-crossing key holds < PREFIX_WINDOW_AGG_MIN_ROWS rows per frame
    keeps the cheap sliding frame even for ≥ 5-min windows (the O(n)
    forms' fixed pipeline measured 2.7× the frame's wall at sf0.1,
    where a 6 hr window holds < 1 row); unknown rates keep the
    conservative wall-clock floor. The probe's max_rate_hz (densest
    key, not hottest) drives the decision: a dense-but-not-hottest key
    must still get the O(n) forms."""
    import tsp_spark.api as api
    from tsp_spark.api import RawPattern, search_incidents
    from tsp_spark.compile.compiler import (
        PREFIX_WINDOW_AGG_MIN_MS,
        PatternCompiler,
    )

    from pyspark.sql import functions as F

    ft = {"x": "float64"}
    six_h = 6 * 3600 * 1000
    norate = PatternCompiler(["unit"], "ts", ft, None)
    sparse = PatternCompiler(["unit"], "ts", ft, None,
                             event_rate_hz=1.0 / 3600)  # 1 event/hour
    dense = PatternCompiler(["unit"], "ts", ft, None, event_rate_hz=1.0)
    assert norate._long_window(six_h)          # unknown rate: floor holds
    assert not sparse._long_window(six_h)      # 6 rows/frame -> frame form
    assert dense._long_window(six_h)           # 21,600 rows/frame -> O(n)
    assert norate._long_window(PREFIX_WINDOW_AGG_MIN_MS)
    assert not sparse._long_window(PREFIX_WINDOW_AGG_MIN_MS)

    # end-to-end: the auto-probe on a SMALL source (below
    # AUTO_PROBE_MIN_BYTES — no monkeypatching of the size gate) now
    # measures the rate because a windowed aggregate needs it, and the
    # sparse source keeps frame forms with identical results.
    api.clear_auto_probe_cache()
    base = 1_704_067_200_000
    n = 2_000
    sparse_ev = spark.range(n).select(
        F.lit("a").alias("unit"),
        # one event per hour -> a 6 hr window holds ~6 rows
        F.timestamp_millis(F.lit(base) + F.col("id") * 3_600_000).alias("ts"),
        (F.pmod(F.xxhash64("id"), F.lit(200)).cast("double")).alias("x"),
    )
    pats = [RawPattern(1, "avg(x, 6 hr) > 110"),
            RawPattern(2, "max(x, 6 hr) > 198")]
    kw = dict(keys=["unit"], ts="ts", fields_types=ft,
              max_gap_ms=None, session_gap_ms=1_000)
    d: dict = {}
    auto = sorted(map(tuple, search_incidents(
        sparse_ev, pats, decision_sink=d, **kw).collect()))
    assert d["probed"] and d["shard_ms"] is None
    assert d["max_rate_hz"] == 0.0  # no key can cross the 1000-row gate
    forms = {(f["kind"], f["form"]) for f in d["window_forms"]}
    assert forms == {("avg", "frame"), ("max", "frame")}
    frame = sorted(map(tuple, search_incidents(
        sparse_ev, pats, shard_ms=None, window_agg="frame", **kw).collect()))
    assert auto == frame and len(auto) > 0

    # dense-but-not-hottest key: hottest key 'slow' (1200 rows, one per
    # hour) is sparse, 'fast' (1100 rows at 1 Hz) is dense — the gate
    # must see the DENSE key's rate and keep the O(n) forms.
    api.clear_auto_probe_cache()
    mixed = spark.range(2_300).select(
        F.when(F.col("id") < 1_200, F.lit("slow"))
        .otherwise(F.lit("fast")).alias("unit"),
        F.timestamp_millis(
            F.when(F.col("id") < 1_200,
                   F.lit(base) + F.col("id") * 3_600_000)
            .otherwise(F.lit(base) + (F.col("id") - 1_200) * 1_000)
        ).alias("ts"),
        (F.pmod(F.xxhash64("id"), F.lit(200)).cast("double")).alias("x"),
    )
    d2: dict = {}
    auto_m = sorted(map(tuple, search_incidents(
        mixed, pats, decision_sink=d2, **kw).collect()))
    assert d2["max_rate_hz"] > 0.9  # the 1 Hz dense key, not the hot one
    assert d2["hot_rate_hz"] < 0.1  # hottest key is the sparse one
    forms2 = {(f["kind"], f["form"]) for f in d2["window_forms"]}
    assert forms2 == {("avg", "block"), ("max", "block")}
    frame_m = sorted(map(tuple, search_incidents(
        mixed, pats, shard_ms=None, window_agg="frame", **kw).collect()))
    assert auto_m == frame_m and len(auto_m) > 0
    api.clear_auto_probe_cache()


def test_windowed_helpers_long_forms_match_frame(spark):
    """r13 (VERDICT r12 Next #2): the PUBLIC ops.windows helpers expose
    the O(n) long-window forms — windowed_sum/count/avg(form="prefix")
    and windowed_min_long/max_long (two-block) — and they match the
    literal sliding-frame helpers exactly, including NULL values,
    all-NULL windows (sum/avg NULL, count 0), duplicate timestamps,
    and integer-valued doubles."""
    import datetime

    from tsp_spark.ops.windows import (
        windowed_avg,
        windowed_count,
        windowed_max,
        windowed_max_long,
        windowed_min,
        windowed_min_long,
        windowed_sum,
    )

    rows = []
    vals = [5.0, None, 9.0, None, None, 7.0, 2.0, 8.0, 3.0, 6.0,
            None, None, 1.0, 4.0, 4.0]
    gaps = [0, 3, 3, 9, 1, 1, 40, 2, 0, 5, 7, 7, 30, 0, 2]  # 0 -> ties
    for key in ("a", "b"):
        t = 0
        for v, g in zip(vals, gaps):
            t += g
            rows.append(
                (key,
                 datetime.datetime(2024, 1, 1)
                 + datetime.timedelta(seconds=t),
                 v)
            )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "unit string, ts timestamp, x double")
    x, ks = F.col("x"), ["unit"]
    for w_s in (8.0, 3600.0):
        sel = df.select(
            "unit", "ts", "x",
            windowed_sum(x, ks, "ts", w_s).alias("fs"),
            windowed_sum(x, ks, "ts", w_s, form="prefix").alias("ps"),
            windowed_count(x, ks, "ts", w_s).alias("fc"),
            windowed_count(x, ks, "ts", w_s, form="prefix").alias("pc"),
            windowed_avg(x, ks, "ts", w_s).alias("fa"),
            windowed_avg(x, ks, "ts", w_s, form="prefix").alias("pa"),
            windowed_min(x, ks, "ts", w_s).alias("fmin"),
            windowed_max(x, ks, "ts", w_s).alias("fmax"),
        )
        sel = windowed_min_long(sel, "pmin", x, ks, "ts", w_s)
        sel = windowed_max_long(sel, "pmax", x, ks, "ts", w_s)
        bad = sel.where(
            ~F.col("fs").eqNullSafe(F.col("ps"))
            | ~F.col("fc").eqNullSafe(F.col("pc"))
            | ~F.col("fa").eqNullSafe(F.col("pa"))
            | ~F.col("fmin").eqNullSafe(F.col("pmin"))
            | ~F.col("fmax").eqNullSafe(F.col("pmax"))
        ).count()
        assert bad == 0, f"long-form helper diverged at window {w_s}s"
        assert sel.count() == len(rows)


def _multi_job_corpus(spark):
    import datetime
    import random

    rng = random.Random(0x13C5)
    rows = []
    for key in ("a", "b", "c"):
        t = 0
        for _ in range(300):
            t += rng.choice([1, 2, 3, 59, 61, 120])
            rows.append(
                (key,
                 datetime.datetime(2024, 1, 1)
                 + datetime.timedelta(seconds=t),
                 float(rng.randint(0, 9)),
                 rng.choice(["ok", "err", "warn"]))
            )
    return spark.createDataFrame(
        rows, "unit string, ts timestamp, x double, s string"
    )


def test_multi_pattern_stacked_matches_per_pattern(spark):
    """r13 (VERDICT r12 Next #5): compile_intervals_multi — the
    cross-pattern shared scan/exchange — produces EXACTLY the incidents
    of the per-pattern path across the grammar: row-local predicates,
    timers, for-interval stats, windowed aggregates, wait, a 3-operand
    andThen chain, trilean NULL conditions, and consume-once lag —
    which since r13b STACKS too (present-slot islandization over
    present rows against the last present state, the Segmentizer
    merge-across-absent rule). Exact mode stacks as well (keep=None
    slot queues through the same two-queue merge) — no grammar shape
    falls back."""
    from tsp_spark.api import RawPattern, search_incidents
    from tsp_spark.compile.compiler import PatternCompiler

    df = _multi_job_corpus(spark)
    pats = [
        RawPattern(1, "x > 5"),
        RawPattern(2, "x > 3 for 10 sec"),
        RawPattern(3, "x > 4 for 30 sec > 3 times", subunit=7),
        RawPattern(4, "avg(x, 15 sec) > 5"),
        RawPattern(5, "wait(9 sec, x > 8)"),
        RawPattern(6, "x > 2 andThen s = 'err' andThen x < 3"),
        RawPattern(7, "lag(x) > 5"),   # present-producing (stacks r13b)
    ]
    kw = dict(
        keys=["unit"], ts="ts",
        fields_types={"x": "float64", "s": "string"},
        max_gap_ms=60_000, session_gap_ms=2_000, shard_ms=None,
    )
    stacked = sorted(map(tuple, search_incidents(df, pats, **kw).collect()))
    # fused mode stacks EVERYTHING, lag included (r13b)
    from tsp_spark.dsl.parser import parse_pattern

    comp = PatternCompiler(
        ["unit"], "ts", {"x": "float64", "s": "string"}, 60_000
    )
    _, fb = comp.compile_intervals_multi(
        comp.with_series(df),
        [(i, parse_pattern(p.source_code, {"x": "float64", "s": "string"}))
         for i, p in enumerate(pats)],
    )
    assert fb == []

    real = PatternCompiler.compile_intervals_multi
    try:
        PatternCompiler.compile_intervals_multi = (
            lambda self, d, tagged: (None, [t for t, _ in tagged])
        )
        per_pattern = sorted(
            map(tuple, search_incidents(df, pats, **kw).collect())
        )
    finally:
        PatternCompiler.compile_intervals_multi = real
    assert stacked == per_pattern and len(stacked) > 0
    # exact mode stacks too (keep=None slot queues into the two-queue
    # merge) and stays identical to its own per-pattern result
    exact_kw = dict(kw, andthen_mode="exact")
    stacked_e = sorted(map(tuple, search_incidents(df, pats, **exact_kw).collect()))
    try:
        PatternCompiler.compile_intervals_multi = (
            lambda self, d, tagged: (None, [t for t, _ in tagged])
        )
        per_e = sorted(map(tuple, search_incidents(df, pats, **exact_kw).collect()))
    finally:
        PatternCompiler.compile_intervals_multi = real
    assert stacked_e == per_e
    # max_gap_ms=None (no gap splitting — constant series id, no gap
    # boundary term): stacked == per-pattern there too
    ng_kw = dict(kw, max_gap_ms=None)
    stacked_ng = sorted(map(tuple, search_incidents(df, pats, **ng_kw).collect()))
    try:
        PatternCompiler.compile_intervals_multi = (
            lambda self, d, tagged: (None, [t for t, _ in tagged])
        )
        per_ng = sorted(map(tuple, search_incidents(df, pats, **ng_kw).collect()))
    finally:
        PatternCompiler.compile_intervals_multi = real
    assert stacked_ng == per_ng and len(stacked_ng) > 0
    # r14 (VERDICT r13 Next #5): the window-agg gate forced BOTH ways —
    # stacked == per-pattern under "frame" AND under "prefix" (which
    # since r14 routes float avg through the block-anchored form, a df
    # rewrite planting sentinel rows inside the stacked plan), so an
    # O(n)-form change can't silently diverge only one of the paths
    for wa in ("frame", "prefix"):
        wa_kw = dict(kw, window_agg=wa)
        stacked_w = sorted(
            map(tuple, search_incidents(df, pats, **wa_kw).collect())
        )
        try:
            PatternCompiler.compile_intervals_multi = (
                lambda self, d, tagged: (None, [t for t, _ in tagged])
            )
            per_w = sorted(
                map(tuple, search_incidents(df, pats, **wa_kw).collect())
            )
        finally:
            PatternCompiler.compile_intervals_multi = real
        assert stacked_w == per_w and len(stacked_w) > 0, wa
        # the physical form changes; the incidents must not
        assert stacked_w == stacked, wa


def test_multi_pattern_job_shares_one_scan_and_exchange(spark):
    """r13 plan-shape gate (VERDICT r12 Next #5 'Done' criterion): an
    all-stackable multi-pattern ordered job plans ONE source scan and
    ONE row-level keyed exchange — not one per pattern. The per-pattern
    path plans N of each (Catalyst prunes each branch differently, so
    ReuseExchange never fires)."""
    import re

    from tsp_spark.api import RawPattern, search_incidents
    from tsp_spark.compile.compiler import PatternCompiler

    df = _multi_job_corpus(spark)
    pats = [
        RawPattern(1, "x > 5"),
        RawPattern(2, "x > 7"),
        RawPattern(3, "x > 2 for 10 sec"),
    ]
    kw = dict(
        keys=["unit"], ts="ts",
        fields_types={"x": "float64", "s": "string"},
        max_gap_ms=60_000, session_gap_ms=2_000, shard_ms=None,
    )

    def plan_counts(out):
        plan = out._jdf.queryExecution().executedPlan().toString()
        scans = plan.count("Scan ExistingRDD") + plan.count("LocalTableScan")
        row_ex = [
            m
            for m in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
            if "__slot" not in m and "__sisl" not in m
            and "pattern_id" not in m
        ]
        return scans, len(row_ex)

    scans, row_ex = plan_counts(search_incidents(df, pats, **kw))
    assert scans == 1, f"stacked job should scan once, saw {scans}"
    assert row_ex == 1, f"stacked job should exchange once, saw {row_ex}"

    real = PatternCompiler.compile_intervals_multi
    try:
        PatternCompiler.compile_intervals_multi = (
            lambda self, d, tagged: (None, [t for t, _ in tagged])
        )
        scans_n, row_ex_n = plan_counts(search_incidents(df, pats, **kw))
    finally:
        PatternCompiler.compile_intervals_multi = real
    assert scans_n == len(pats) and row_ex_n == len(pats)


def test_multi_key_partition_fields(spark):
    """The reference's partitionFields is a LIST — multi-column keys
    must partition every window/island/sessionize stage and the stacked
    path alike. Parity: (a) stacked == per-pattern on two keys;
    (b) two keys == one composite key (string concat) modulo the key
    columns themselves."""
    import datetime
    import random

    from pyspark.sql import functions as F

    from tsp_spark.api import RawPattern, search_incidents
    from tsp_spark.compile.compiler import PatternCompiler

    rng = random.Random(0x13D7)
    rows = []
    for unit in ("a", "b"):
        for line in (1, 2):
            t = 0
            for _ in range(150):
                t += rng.choice([1, 2, 3, 59, 61, 120])
                rows.append(
                    (unit, line,
                     datetime.datetime(2024, 1, 1)
                     + datetime.timedelta(seconds=t),
                     float(rng.randint(0, 9)))
                )
    df = spark.createDataFrame(
        rows, "unit string, line int, ts timestamp, x double"
    )
    pats = [
        RawPattern(1, "x > 5"),
        RawPattern(2, "x > 3 for 10 sec"),
        RawPattern(3, "x > 4 andThen x < 2"),
        RawPattern(4, "lag(x) > 5"),
    ]
    kw = dict(
        keys=["unit", "line"], ts="ts", fields_types={"x": "float64"},
        max_gap_ms=60_000, session_gap_ms=2_000, shard_ms=None,
    )
    stacked = sorted(map(tuple, search_incidents(df, pats, **kw).collect()))
    real = PatternCompiler.compile_intervals_multi
    try:
        PatternCompiler.compile_intervals_multi = (
            lambda self, d, tagged: (None, [t for t, _ in tagged])
        )
        per = sorted(map(tuple, search_incidents(df, pats, **kw).collect()))
    finally:
        PatternCompiler.compile_intervals_multi = real
    assert stacked == per and len(stacked) > 0
    # composite single key ≡ two keys (project the composite back out)
    comp = df.select(
        F.concat_ws("|", "unit", F.col("line").cast("string")).alias("k"),
        "ts", "x",
    )
    ckw = dict(kw, keys=["k"])
    comp_out = sorted(
        (r["pattern_id"], r["subunit"], r["k"], r["from_ts"], r["to_ts"])
        for r in search_incidents(comp, pats, **ckw).collect()
    )
    two_out = sorted(
        (r["pattern_id"], r["subunit"],
         f"{r['unit']}|{r['line']}", r["from_ts"], r["to_ts"])
        for r in search_incidents(df, pats, **kw).collect()
    )
    assert comp_out == two_out


def test_window_operand_evaluates_once(spark, mk_ts):
    """r14 (guide §1.2): a comparison over a windowed aggregate must
    compute the window function ONCE — the NULL/NaN comparison lattice
    references its operand 3-4×, and an inlined window expression is
    evaluated once per copy inside the Window physical node."""
    df = _events(
        spark, mk_ts,
        [("a", i, float(i % 7), "x") for i in range(40)],
    )
    out = compile_pattern(df, "avg(x, 10 sec) >= 3", ["unit"], "ts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every avg(...) windowspecdefinition line in the plan must carry a
    # distinct frame: the same sliding-frame avg appearing twice in one
    # Window node is the regression this guards against
    import re

    win_avgs = re.findall(r"avg\([^)]*\) windowspecdefinition.*?"
                          r"specifiedwindowframe\(RangeFrame, -9999", plan)
    assert len(win_avgs) == 1, plan
