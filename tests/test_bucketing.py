"""Bucketed-source evidence for the 100 TB design: the CEP path's ONLY
shuffle is the keyed exchange feeding the window/island kernels, and a
source bucketed by the partition key eliminates it — Spark recognizes
the bucketed scan's hash distribution as satisfying the window's
requirement, so the whole pattern plan becomes exchange-free.

This is the docs/SCALE.md claim made executable: same results, zero
Exchange nodes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tsp_spark.compile.compiler import compile_pattern


@pytest.fixture(scope="module")
def bucketed_events(spark, events_small):
    spark.sql("DROP TABLE IF EXISTS events_bucketed")
    (
        events_small.write.bucketBy(8, "user_id")
        .sortBy("user_id", "ts")
        .mode("overwrite")
        .saveAsTable("events_bucketed")
    )
    yield spark.table("events_bucketed")
    spark.sql("DROP TABLE IF EXISTS events_bucketed")


def _n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


def test_bucketed_scan_eliminates_cep_shuffle(spark, events_small, bucketed_events):
    pattern = "value > 150 for 10 sec"
    ft = {"value": "float64"}
    plain = compile_pattern(events_small, pattern, ["user_id"], "ts", ft)
    bucketed = compile_pattern(bucketed_events, pattern, ["user_id"], "ts", ft)

    # identical incidents…
    key = lambda r: (r["user_id"], r["from_ts"], r["to_ts"], r["n_rows"])  # noqa: E731
    assert sorted(map(key, bucketed.collect())) == sorted(map(key, plain.collect()))

    # …but the bucketed plan needs NO shuffle at all: the scan's hash
    # distribution on user_id satisfies every window/groupBy requirement
    assert _n_exchanges(bucketed) == 0, bucketed._jdf.queryExecution().executedPlan().toString()
    assert _n_exchanges(plain) >= 1  # the plain path pays the keyed exchange


def test_bucketed_islands_groupby_alignment(spark, bucketed_events):
    """The islands kernel's groupBy((keys, island)) also rides the
    bucketed distribution — end-to-end exchange-free RLE."""
    from tsp_spark.ops.islands import islands

    out = islands(
        bucketed_events, ["user_id"], "ts", F.col("value") > 150, max_gap_ms=15_000
    )
    assert out.count() > 0
    assert _n_exchanges(out) == 0
