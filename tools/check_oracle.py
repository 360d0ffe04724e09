"""Local replica of the driver's t2 correctness gate: run each declared
query on Spark AND its oracle SQL on DuckDB over the same sf dir;
compare row count, sorted-column schema, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stable order-insensitive compare: sort by all columns
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_cols = sorted(spark_pdf.columns)
    o_cols = sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        problems.append(f"columns spark={s_cols} oracle={o_cols}")
        return problems
    if problems:
        return problems
    s = normalize(spark_pdf)
    o = normalize(oracle_pdf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if sv.dtype.kind == "f" or ov.dtype.kind == "f":
            import numpy as np

            sn = sv.astype(float).to_numpy()
            on = ov.astype(float).to_numpy()
            both_nan = pd.isna(sn) & pd.isna(on)
            eq = (sn == on) | both_nan
            if not eq.all():
                idx = int((~eq).argmax())
                problems.append(
                    f"col {c}: {int((~eq).sum())} mismatches, first at {idx}: "
                    f"spark={sn[idx]!r} oracle={on[idx]!r}"
                )
        else:
            eq = (sv == ov) | (pd.isna(sv) & pd.isna(ov))
            if not eq.all():
                idx = int((~eq).argmax())
                problems.append(
                    f"col {c}: {int((~eq).sum())} mismatches, first at {idx}: "
                    f"spark={sv.iloc[idx]!r} oracle={ov.iloc[idx]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from tsp_spark.queries import ORACLES, QUERIES
    from tsp_spark.session import get_spark

    only = set(sys.argv[2:])
    spark = get_spark("oracle_check")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        sql = ORACLES.get(name)
        if sql is None:
            print(f"ok?   {name}: no oracle (rows-only) — {len(spark_pdf)} rows")
            continue
        try:
            oracle_pdf = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            failures += 1
            continue
        problems = compare(name, spark_pdf, oracle_pdf)
        if problems:
            failures += 1
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"PASS  {name} ({len(spark_pdf)} rows)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
