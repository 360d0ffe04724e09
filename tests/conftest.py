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
