"""Property-based structural invariants for the island/sessionize
kernels (hypothesis generates the series; invariants hold for ANY
input):

* islands are disjoint, ordered, within-gap, and condition-pure
* sessionized intervals are separated by more than the gap
* n_merged sums to the number of input intervals
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tsp_spark.ops.islands import islands
from tsp_spark.ops.sessionize import sessionize_intervals

EPOCH = dt.datetime(2024, 1, 1)
GAP_MS = 5_000
SESSION_MS = 3_000

series_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # key
        st.integers(min_value=0, max_value=60),  # second offset
        st.one_of(st.none(), st.floats(min_value=0, max_value=100, allow_nan=False)),
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda r: (r[0], r[1]),
)


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(series_strategy)
def test_island_invariants(spark, rows):
    df = spark.createDataFrame(
        [(k, EPOCH + dt.timedelta(seconds=s), v) for k, s, v in rows],
        "k int, ts timestamp, v double",
    )
    iv = islands(df, ["k"], "ts", F.col("v") > 50, max_gap_ms=GAP_MS).collect()
    truth = {
        (k, s): (v is not None and v > 50) for k, s, v in rows
    }
    by_key: dict[int, list[tuple[float, float]]] = {}
    for r in iv:
        by_key.setdefault(r["k"], []).append(
            (r["from_ts"].timestamp(), r["to_ts"].timestamp())
        )
    base = EPOCH.replace(tzinfo=dt.timezone.utc).timestamp()
    for k, intervals in by_key.items():
        intervals.sort()
        for (f1, t1), (f2, t2) in zip(intervals, intervals[1:]):
            assert t1 < f2, "islands must be disjoint and ordered"
        for f, t in intervals:
            assert f <= t
    # every true point is inside exactly one island; false points in none
    for (k, s), is_true in truth.items():
        ts = base + s
        hits = sum(
            1 for f, t in by_key.get(k, []) if f - 1e-6 <= ts <= t + 1e-6
        )
        assert hits == (1 if is_true else 0), (k, s, is_true, by_key.get(k))


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(series_strategy)
def test_sessionize_invariants(spark, rows):
    df = spark.createDataFrame(
        [(k, EPOCH + dt.timedelta(seconds=s), v) for k, s, v in rows],
        "k int, ts timestamp, v double",
    )
    iv = islands(df, ["k"], "ts", F.col("v") > 50, max_gap_ms=GAP_MS)
    n_in = iv.count()
    merged = sessionize_intervals(iv, ["k"], gap_ms=SESSION_MS).collect()
    assert sum(r["n_merged"] for r in merged) == n_in
    by_key: dict[int, list] = {}
    for r in merged:
        by_key.setdefault(r["k"], []).append(
            (r["from_ts"].timestamp(), r["to_ts"].timestamp())
        )
    for k, intervals in by_key.items():
        intervals.sort()
        for (f1, t1), (f2, t2) in zip(intervals, intervals[1:]):
            assert (f2 - t1) * 1000 > SESSION_MS, "merged intervals must be gap-separated"
