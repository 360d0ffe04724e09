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
