"""Regression guard: golden-corpus parity must not regress.

Runs the reference's own 53-pattern corpus (4 source configurations)
through the Spark engine and asserts the pinned pass-set: all incident
COUNTS correct (the reference's hard-ish gate) except the one fixture
impossibility, and the known timestamp-deviation set doesn't grow
(docs/SEMANTICS.md records why those specific timestamps are
unmatchable)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# pinned deviations (see docs/SEMANTICS.md)
KNOWN_COUNT_FAILURES = {
    # narrow fixture data lacks SpeedThrustMin=11 entirely; the
    # reference itself would produce 0 incidents there
    ("narrow", 51),
}
KNOWN_TS_DEVIATIONS = {
    ("core", 50), ("core", 52),
    ("narrow", 50), ("narrow", 52),
    # ivolga corpora: legacy-era timestamps (raw-run-start convention);
    # the faithful port of the current reference misses the same set
    ("ivolga", 20), ("ivolga", 22), ("ivolga", 23), ("ivolga", 25),
    ("ivolga", 26), ("ivolga", 29), ("ivolga", 31), ("ivolga", 32),
    ("ivolga", 34), ("ivolga", 35), ("ivolga", 38), ("ivolga", 39),
    ("ivolga", 19), ("ivolga", 28),
}
KNOWN_TS_DEVIATIONS |= {
    ("ivolga_narrow", pid) for (_c, pid) in KNOWN_TS_DEVIATIONS if _c == "ivolga"
}


@pytest.mark.slow
@pytest.mark.parametrize("config", ["core", "narrow", "ivolga", "ivolga_narrow"])
def test_golden_corpus(config, spark, capsys):
    from tools import check_golden as G

    loader, corpus = G.CONFIGS[config]
    df, keys, fields = loader(spark)
    df = df.cache()
    df.count()
    pats, counts, ivs = G.golden(corpus)

    count_failures, ts_devs = set(), set()
    for p in pats:
        pid = int(p["id"])
        src = p["sourceCode"]
        from tsp_spark.compile.compiler import PatternCompiler
        from tsp_spark.dsl.parser import parse_pattern
        from tsp_spark.ops.sessionize import sessionize_intervals

        node = parse_pattern(src, fields, tolerance_fraction=0.0)
        compiler = PatternCompiler(keys, "ts", fields, max_gap_ms=60_000)
        iv = compiler.compile_intervals(df, node)
        merged = sessionize_intervals(iv, keys, gap_ms=1_000)
        got = sorted(
            (r["from_ts"].timestamp(), r["to_ts"].timestamp())
            for r in merged.collect()
        )
        want = sorted(ivs.get(pid, []))
        want_n = counts.get(pid)
        if want_n is not None and len(got) != want_n:
            count_failures.add((config, pid))
        elif not (
            len(got) == len(want)
            and all(
                abs(g[0] - w[0]) < 1e-4 and abs(g[1] - w[1]) < 1e-4
                for g, w in zip(got, want)
            )
        ):
            ts_devs.add((config, pid))

    assert count_failures <= KNOWN_COUNT_FAILURES, (
        f"new COUNT failures: {count_failures - KNOWN_COUNT_FAILURES}"
    )
    assert ts_devs <= KNOWN_TS_DEVIATIONS, (
        f"new timestamp deviations: {ts_devs - KNOWN_TS_DEVIATIONS}"
    )
