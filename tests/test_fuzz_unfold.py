"""Fuzz NarrowDataUnfolding (ops.unfold_narrow) against the faithful
SparseRowsDataAccumulator port (tools/ref_oracle.sparse_accumulate):
random narrow EAV series with repeated timestamps, nulls, value-column
routing, and timeout expiry."""

from __future__ import annotations

import datetime as dt
import math
import os
import random
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.ref_oracle import sparse_accumulate  # noqa: E402
from tsp_spark.ops.reshape import unfold_narrow  # noqa: E402

SENSORS = ["s1", "s2", "s3"]
EPOCH = dt.datetime(2024, 1, 1)
TIMEOUT_MS = 5_000


def gen_narrow(rng: random.Random, n: int):
    """EAV shape: per timestamp a random subset of sensors reports once
    (same-(ts,sensor) duplicates are order-ambiguous in both engines)."""
    rows = []
    t = 0
    for _ in range(n):
        t += rng.choice([1000, 1000, 2000, 7000])
        reporting = [s for s in SENSORS if rng.random() < 0.6]
        for s in reporting:
            rows.append(
                (
                    t,
                    {
                        "sensor": s,
                        "val": None if rng.random() < 0.1 else round(rng.uniform(0, 100), 2),
                    },
                )
            )
    return rows or [(1000, {"sensor": "s1", "val": 1.0})]


@pytest.mark.slow
def test_unfold_matches_accumulator(spark):
    rng = random.Random(int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "777")))
    cases = {cid: gen_narrow(rng, rng.randint(2, 50)) for cid in range(30)}

    rows = [
        (cid, EPOCH + dt.timedelta(milliseconds=ms), r["sensor"], r["val"])
        for cid, series in cases.items()
        for ms, r in series
    ]
    df = spark.createDataFrame(rows, "sid int, ts timestamp, sensor string, val double")
    wide = unfold_narrow(
        df, ["sid"], "ts", key_col="sensor", value_col="val",
        sensors=SENSORS, default_timeout_ms=TIMEOUT_MS,
    )
    got = {}
    for r in wide.collect():
        ms = int(r["ts"].replace(tzinfo=dt.timezone.utc).timestamp() * 1000) - int(
            EPOCH.replace(tzinfo=dt.timezone.utc).timestamp() * 1000
        )
        got[(r["sid"], ms)] = {s: r[s] for s in SENSORS}

    mism = []
    for cid, series in cases.items():
        want_rows = sparse_accumulate(
            series, key_column="sensor", value_column="val",
            sensors=SENSORS, default_timeout_ms=TIMEOUT_MS,
        )
        for ms, w in want_rows:
            g = got.get((cid, ms))
            if g is None:
                mism.append((cid, ms, "missing", w))
                continue
            for s in SENSORS:
                gv, wv = g[s], w[s]
                same = (gv is None and wv is None) or (
                    gv is not None
                    and wv is not None
                    and math.isclose(gv, wv, abs_tol=1e-9)
                )
                if not same:
                    mism.append((cid, ms, s, (gv, wv)))
    assert not mism, f"{len(mism)} cell mismatches; first 5: {mism[:5]}"
