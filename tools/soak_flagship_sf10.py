"""sf10 rehearsal of the folded seven-pattern flagship (VERDICT r13
Next #6).

The r13 flagship fold made the stacked plan + the O(n) long-window
forms + sessionization one driver-gated entry, but its scaling
evidence stopped at sf1 — and the r13 drift bug bit exactly at the
first scale the harness never value-checked. This soak runs
`cep_incidents_multi` (q_cep_incidents_wide: seven patterns, one
stacked plan) on a generated events-only sf10 (~10M rows) and
set-compares the full result against the composite DuckDB oracle —
MATCH or the round is not done. Also reports sf1 → sf10 wall-clock
drift for the stacked plan.

Usage: python tools/soak_flagship_sf10.py
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF10_DIR = REPO / ".localdata" / "sf10ev"


def main() -> int:
    import duckdb

    from tools.gen_sf import ensure
    from tsp_spark.queries import ORACLE_INCIDENTS_WIDE, q_cep_incidents_wide
    from tsp_spark.session import get_spark

    t0 = time.time()
    ensure(10.0, str(SF10_DIR), {"events"})
    print(f"sf10 events ready ({time.time() - t0:.0f}s)", flush=True)

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    timings = {}
    results = {}
    for sf, d in (("sf1", REPO / ".localdata" / "sf1"), ("sf10", SF10_DIR)):
        t0 = time.time()
        pdf = q_cep_incidents_wide(spark, str(d)).toPandas()
        timings[sf] = time.time() - t0
        results[sf] = pdf
        print(f"{sf}: {len(pdf):,} incidents in {timings[sf]:.1f}s", flush=True)
    print(
        f"wall-clock drift sf1->sf10: {timings['sf10'] / timings['sf1']:.2f}×"
        f" for 10× rows; output {len(results['sf10']) / len(results['sf1']):.2f}×"
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF10_DIR}/events.parquet')"
    )
    t0 = time.time()
    odf = con.execute(ORACLE_INCIDENTS_WIDE).fetchdf()
    print(f"oracle: {len(odf):,} rows in {time.time() - t0:.1f}s", flush=True)

    key = ["pattern_id", "user_id", "from_ms", "to_ms"]
    so = set(map(tuple, results["sf10"][key].itertuples(index=False)))
    oo = set(map(tuple, odf[key].itertuples(index=False)))
    print(f"spark-only={len(so - oo)} oracle-only={len(oo - so)}")
    ok = so == oo
    print("MATCH" if ok else "DIVERGE")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
