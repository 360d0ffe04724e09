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

# Tables that are fact-scale at the 100 TB target, identified in the
# analyzed logical plan by a signature column: forcing a broadcast of a
# raw (unaggregated) scan of one of these OOMs executors at scale.
# nation / region / supplier are the blessed broadcast dimensions.
FACT_SIGNATURES = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "customer": "c_custkey",
    "part": "p_partkey",
}

# Regression guard for the round-4 pushdown fix: these queries filter
# fact tables by a constant date range, and that range MUST reach the
# parquet scan as a pushed range predicate on the named column. A bare
# IsNotNull here means someone re-wrapped the column in a function
# (unix_millis/year) and silently lost row-group pruning.
REQUIRED_RANGE_PUSHDOWN = {
    "rel_q1_pricing": ("l_shipdate",),
    "rel_q3_shipping": ("l_shipdate",),
    "rel_q5_nation_revenue": ("o_orderdate",),
    "rel_q6_revenue": ("l_shipdate",),
    "rel_q14_promo": ("l_shipdate",),
    "rel_q7_volume": ("l_shipdate",),
    "rel_q10_returns": ("o_orderdate",),
    # q4 (o_orderdate range) and q12 (l_shipdate range) live inside the
    # fold since r8; their pushed ranges must still reach the scans of
    # the fold's union plan.
    "rel_tpch_fold": ("o_orderdate", "l_shipdate"),
}

_RANGE_OPS = ("GreaterThan", "GreaterThanOrEqual", "LessThan", "LessThanOrEqual")


def broadcast_violations(df) -> list[str]:
    """Forced-broadcast audit on the analyzed logical plan: every
    ResolvedHint(broadcast) subtree must either not touch a fact table
    or reduce it through an Aggregate first (size bounded by group
    cardinality, e.g. Q2's per-type mins, Q22's one-row stats).

    Statistics-based auto-broadcasts are deliberately NOT flagged: at
    100 TB the planner sees fact-scale sizes and picks shuffle joins on
    its own — only a *hint* forces the OOM."""
    analyzed = df._jdf.queryExecution().analyzed()
    bad = []

    def walk(node):
        if node.nodeName() == "ResolvedHint" and "broadcast" in node.simpleString(25):
            sub = node.treeString()
            if "Aggregate" not in sub:
                bad.extend(t for t, col in FACT_SIGNATURES.items() if col in sub)
            return  # aggregated subtrees are size-bounded; stop here
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(analyzed)
    return bad


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    from tsp_spark.queries import QUERIES
    from tsp_spark.session import get_spark

    spark = get_spark("plan_audit", master="local[4]", shuffle_partitions=4)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    n_violations = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
            bcast_bad = broadcast_violations(df)
        except Exception as e:  # noqa: BLE001
            print(f"{name:26s} ERROR {type(e).__name__}: {e}")
            continue
        if bcast_bad:
            n_violations += 1
            print(f"{name:26s} FACT-BROADCAST VIOLATION: {sorted(set(bcast_bad))}")
        for col in REQUIRED_RANGE_PUSHDOWN.get(name, ()):
            if not any(f"{op}({col}" in plan for op in _RANGE_OPS):
                n_violations += 1
                print(
                    f"{name:26s} PUSHDOWN VIOLATION: no range predicate on "
                    f"{col} reaches the scan (function-wrapped filter?)"
                )
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
    print(f"\n{n_violations} fact-broadcast violations")
    sys.exit(1 if n_violations else 0)


if __name__ == "__main__":
    main()
