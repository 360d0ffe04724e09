"""Plan audit: summarize the physical plan of every declared query —
exchanges, joins, scans, pushed filters — the repeatable evidence behind
docs/SCALE.md.

Usage: python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    from tsp_spark.queries import QUERIES
    from tsp_spark.session import get_spark

    spark = get_spark("plan_audit", master="local[4]", shuffle_partitions=4)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001
            print(f"{name:26s} ERROR {type(e).__name__}: {e}")
            continue
        # the formatted output lists each node twice (tree + details);
        # count tree lines only (they start with optional bars + "+- ")
        tree = plan.split("\n\n")[0]
        n_ex = len(re.findall(r"\bExchange\b", tree))
        n_bhj = len(re.findall(r"BroadcastHashJoin", tree))
        n_smj = len(re.findall(r"SortMergeJoin", tree))
        n_scan = len(re.findall(r"Scan parquet", tree))
        n_win = len(re.findall(r"\bWindow\b", tree))
        pushed = sorted(
            {
                p.strip()
                for p in re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
                if p.strip()
            }
        )
        print(
            f"{name:26s} scans={n_scan} exchanges={n_ex} windows={n_win} "
            f"bhj={n_bhj} smj={n_smj}"
        )
        for p in pushed:
            print(f"{'':28s}pushed: {p[:110]}")


if __name__ == "__main__":
    main()
