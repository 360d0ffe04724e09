from __future__ import annotations

import pytest

from tsp_spark.dsl.ast import (
    AggregateCall,
    AndThen,
    Assert,
    Cast,
    Constant,
    ForWithInterval,
    FunctionCall,
    Identifier,
    ReducerCall,
    Timer,
    Until,
    Wait,
)
from tsp_spark.dsl.parser import ParseError, parse_pattern

# The reference's PatternGeneratorTest corpus (valid strings) — these must
# all parse; shapes spot-checked below.
VALID = [
    "doubleSensor1 > 0 for 30 sec",
    "doubleSensor1 > 0 for 30 seconds",
    "avgOf(doubleSensor1, doubleSensor2) >= 10 for 5 min >= 100 ms",
    "count(doubleSensor1, 4 sec) * sum(doubleSensor2, 3 sec) < 9",
    "lag(doubleSensor1, 10 sec) > doubleSensor1",
    "lag(doubleSensor1) > doubleSensor1",
    "doubleSensor1 > 0 andThen intSensor <= 42",
    "doubleSensor1 > 0 and intSensor <= 42",
    "doubleSensor1 > 0 or not intSensor <= 42",
    "(doubleSensor1 > 0 for 30 sec) or intSensor <= 42",
    "doubleSensor1 > 0 until intSensor <= 42",
    "wait(30 sec, doubleSensor1 > 0)",
    "boolSensor = true for 1 min > 3 times",
    "boolSensor = true for 1 min 30 sec",
    "intSensor = 1 for 2 min > 119 times",
    "avg(doubleSensor1, 30 sec) >= 8 for 2 min > 1 min",
    "doubleSensor1 for 10 sec +- 1 sec",
    "doubleSensor1 > 1 for 10 sec +- 10 %",
    "x for 10 sec to 20 sec",
    "abs(doubleSensor1 - 5) < 0.1",
    "intSensor as boolean",
    "doubleSensor1 as int32 = 5",
    "sumOf(a, b, c; _ > 0) > 10",
    "stringSensor = 'OFF'",
    'lag("Sensor with spaces") > 0',
    "lag(lag(doubleSensor1)) > 0",
    "sin(x) + cos(y) < tan(z)",
    "x > 0 and y > 0 and z > 0 for 10 sec",
    "PowerPolling >= 50 andThen PowerPolling < 50 andThen PowerPolling >= 50",
]


@pytest.mark.parametrize("src", VALID)
def test_parses(src):
    parse_pattern(src)


def test_timer_shape():
    p = parse_pattern("doubleSensor1 > 0 for 30 sec")
    assert isinstance(p, Timer) and p.window_ms == 30_000
    assert isinstance(p.inner, Assert)
    cmp = p.inner.inner
    assert isinstance(cmp, FunctionCall) and cmp.name == "gt"


def test_tolerance_percent():
    p = parse_pattern("x > 1 for 10 sec +- 10 %")
    assert isinstance(p, Timer)
    assert p.min_window_ms == 9_000 and p.window_ms == 11_000


def test_tolerance_default_fraction():
    p = parse_pattern("x > 1 for 10 sec", tolerance_fraction=0.1)
    assert p.min_window_ms == 9_000 and p.window_ms == 11_000


def test_for_with_times_range_quirks():
    # reference quirk: > N ⇒ count ≥ N+1 (inclusive NumericInterval.more(t+1))
    p = parse_pattern("intSensor = 1 for 2 min > 119 times")
    assert isinstance(p, ForWithInterval)
    assert p.kind == "times" and p.lo == 120.0 and p.hi is None
    p2 = parse_pattern("x > 0 for 1 min <= 3 times")
    assert p2.lo == 0.0 and p2.hi == 4.0


def test_for_with_time_range():
    p = parse_pattern("avg(s, 30 sec) >= 8 for 2 min > 1 min")
    assert isinstance(p, ForWithInterval)
    assert p.kind == "time" and p.lo == 60_000 and p.hi is None
    agg = p.inner.inner.args[0]
    assert isinstance(agg, AggregateCall) and agg.kind == "avg" and agg.window_ms == 30_000


def test_andthen_chain_left_assoc():
    p = parse_pattern("a > 0 andThen b > 0 andThen c > 0")
    assert isinstance(p, AndThen) and isinstance(p.left, AndThen)


def test_until_and_wait():
    p = parse_pattern("x > 0 until y > 1")
    assert isinstance(p, Until)
    w = parse_pattern("wait(30 sec, x > 0)")
    assert isinstance(w, Wait) and w.window_ms == 30_000


def test_reducer_with_constraint():
    p = parse_pattern("sumOf(a, b, c; _ > 0) > 10")
    red = p.inner.args[0]
    assert isinstance(red, ReducerCall) and red.name == "sumof"
    assert len(red.args) == 3 and red.cond is not None


def test_cast_and_string():
    p = parse_pattern("doubleSensor1 as int32 = 5")
    cast = p.inner.args[0]
    assert isinstance(cast, Cast) and cast.dtype == "int32"
    s = parse_pattern("stringSensor = 'OFF'")
    assert s.inner.args[1] == Constant("OFF")


def test_known_field_types():
    p = parse_pattern("s = 'x'", fields_types={"s": "string"})
    ident = p.inner.args[0]
    assert isinstance(ident, Identifier) and ident.dtype == "string"


def test_compound_time():
    p = parse_pattern("b = true for 1 min 30 sec")
    assert isinstance(p, Timer) and p.window_ms == 90_000


def test_invalid():
    for bad in ["x > ", "for 10 sec", "x > 0 for", "avg(x 10 sec) > 1", "x ) y"]:
        with pytest.raises(ParseError):
            parse_pattern(bad)


def test_min_function_vs_minutes_unit():
    """`min` is both the minutes TIME UNIT and the windowed-aggregate
    NAME; a unit keyword directly followed by '(' parses as a call."""
    from tsp_spark.dsl import ast as A
    from tsp_spark.dsl.parser import parse_pattern

    ft = {"value": "float64"}
    n = parse_pattern("min(value, 10 sec) > 10", ft)
    assert isinstance(n, A.Assert)
    cmp = n.inner
    assert isinstance(cmp.args[0], A.AggregateCall)
    assert cmp.args[0].kind == "min" and cmp.args[0].window_ms == 10_000
    # the minutes unit still works everywhere a time literal appears
    t = parse_pattern("value > 50 for 2 min", ft)
    assert isinstance(t, A.Timer)
    assert t.min_window_ms <= 120_000 <= t.window_ms
    both = parse_pattern("min(value, 2 min) > 1", ft)
    assert both.inner.args[0].window_ms == 120_000


def test_error_message_points_at_boolean_operand():
    """ADVICE r5: a dangling boolean operator must re-raise the
    boolean-layer diagnostic (pointing past the operator), not the
    trilean paren fallback's generic "Expected '('"."""
    for bad, end in [("value > 1 and", 13), ("value > 1 and and", 14)]:
        with pytest.raises(ParseError) as ei:
            parse_pattern(bad, {"value": "float64"})
        msg = str(ei.value)
        assert "Expected '('" not in msg
        assert str(end) in msg


def test_error_message_prefers_deepest_layer():
    """Review-caught: always re-raising the boolean-layer error
    regressed malformed PARENTHESIZED trilean input — '(a andThen )'
    reported a position inside the valid prefix. The deeper-consuming
    attempt's diagnostic wins now, fixing both directions."""
    with pytest.raises(ParseError) as ei:
        parse_pattern("(value > 1 andThen )", {"value": "float64"})
    # position 19 = the ')' after 'andThen', not the '>' at 7
    assert "19" in str(ei.value)
    with pytest.raises(ParseError) as ei:
        parse_pattern("value > 1 and", {"value": "float64"})
    assert "13" in str(ei.value) and "Expected '('" not in str(ei.value)
