"""Capture .explain("formatted") for every bench query into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt where suffix is "before" or
"after" (second positional arg convention: tag like "r14" and suffix
via --suffix). Plans are captured from the same sf dir the bench uses
($SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1) so plan shapes
match the benched workload.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("tag", help="plans/<tag>/ output dir, e.g. r14")
    ap.add_argument("queries", nargs="*", help="subset (default: bench list)")
    ap.add_argument("--suffix", default="before", choices=["before", "after"])
    args = ap.parse_args()

    from bench import BENCH_QUERIES
    from tsp_spark.queries import QUERIES
    from tsp_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = args.queries or BENCH_QUERIES
    out_dir = Path(__file__).resolve().parent.parent / "plans" / args.tag
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark("capture_plans")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = out_dir / f"{name}_{args.suffix}.txt"
        path.write_text(plan)
        # quick shape summary on stderr for the working log
        n_ex = plan.count("Exchange")
        joins = [
            j
            for j in (
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
                "BroadcastNestedLoopJoin",
                "CartesianProduct",
            )
            if j in plan
        ]
        pyn = [
            p
            for p in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "MapInArrow")
            if p in plan
        ]
        print(
            f"# {name}: {n_ex} Exchange; joins={joins or '-'}; python={pyn or '-'}",
            file=sys.stderr,
        )
    print(f"wrote {len(names)} plans to {out_dir}")


if __name__ == "__main__":
    main()
