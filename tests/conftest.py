from __future__ import annotations

import datetime as dt

import pytest

from tsp_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tsp_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s


def ts(seconds: float) -> dt.datetime:
    """Epoch-based timestamp helper (UTC, naive — session TZ is UTC)."""
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=seconds)


@pytest.fixture(scope="session")
def mk_ts():
    return ts


@pytest.fixture(scope="session")
def events_small(spark):
    """Synthetic keyed event series: 3 users × 200 s with value ramps
    that cross thresholds and hold long enough for `for`-patterns."""
    rows = []
    for user in (1, 2, 3):
        for i in range(200):
            # value > 150 holds for a 30 s stretch per user, offset by user
            base = 200.0 if (50 + user * 10) <= i < (80 + user * 10) else 100.0
            rows.append((user, ts(i), base + (i % 7), "error" if i % 13 == 0 else "ok"))
    return spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, value double, event_type string"
    ).cache()
