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

FT = {"value": "float64", "event_type": "string"}


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
