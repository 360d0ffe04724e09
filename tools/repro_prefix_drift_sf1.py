"""Reproduce + verify the fix for VERDICT r13 What's-wrong #1.

The judge's finding: `avg(value, 6 hr) > 100.3` (flagship pattern 6)
through the r13 whole-history prefix-difference form gave 84,217
incidents at sf1 where the frame form and DuckDB give 84,213 — the
cumulative sum's rounding flipped the threshold on 4 boundary rows.

This script runs pattern 6 alone on `.localdata/sf1/events.parquet`
three ways and prints the incident counts:

  * window_agg="frame"  — the literal sliding RANGE frame (oracle-true)
  * window_agg="prefix" — forces the O(n) forms; since r14 float avg
    routes to the block-anchored two-piece sums (the fix)
  * window_agg="auto"   — what the flagship actually runs (6 h window
    >> the 5-min floor, so it takes the same O(n) route)

plus the DuckDB oracle. PASS = all four agree.

Usage: python tools/repro_prefix_drift_sf1.py [sf_dir]
"""
from __future__ import annotations

import sys
import time

import duckdb

from tsp_spark.session import get_spark
from tsp_spark.queries import GAP_MS, EVENTS_FIELDS, ORACLE_AVG_ISLANDS, _load
from tsp_spark.api import RawPattern, search_incidents
from pyspark.sql import functions as F


def spark_count(spark, sf_dir: str, window_agg: str) -> tuple[int, float]:
    ev = _load(spark, sf_dir, "events")
    t0 = time.time()
    out = search_incidents(
        ev,
        [RawPattern(6, "avg(value, 6 hr) > 100.3")],
        keys=["user_id"],
        ts="ts",
        fields_types=EVENTS_FIELDS,
        max_gap_ms=GAP_MS,
        session_gap_ms=2_000,
        window_agg=window_agg,
    )
    n = out.count()
    return n, time.time() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf1"
    spark = get_spark()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    # ORACLE_AVG_ISLANDS islandizes + merges on the 2s session gap the
    # same way search_incidents(session_gap_ms=2000) does
    t0 = time.time()
    oracle = con.execute(
        f"SELECT count(*) FROM ({ORACLE_AVG_ISLANDS})"
    ).fetchone()[0]
    t_oracle = time.time() - t0
    print(f"duckdb oracle : {oracle}  ({t_oracle:.1f}s)")

    results = {}
    for mode in ("frame", "prefix", "auto"):
        n, dt = spark_count(spark, sf_dir, mode)
        results[mode] = n
        print(f"spark {mode:<7}: {n}  ({dt:.1f}s)")

    ok = all(v == oracle for v in results.values())
    print("PASS" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
