"""Fresh-process best-of-N headline bench (r12, VERDICT r11 Next #2).

The r11 headline bench sum rose 27.5 -> 37.4 s vs r10 with kernel
microbenches flat and (for most queries) identical definitions and
plans; docs/SCALE.md documents 2-3x process-to-process variance on
this host under load. This tool adjudicates: each query runs in its
OWN fresh JVM/Python process (subprocess), best-of-N inside the
process after the standard warmup action, so one badly-scheduled
long-lived session cannot color every row. Compares against the
committed bench_full_r{10,11}.json artifacts and flags rows that
reproduce >= 1.3x vs r10.

Usage:
  python tools/bench_fresh.py [query ...]     # default: all 29 headline
  python tools/bench_fresh.py --reps 3 cep_incidents_multi dedup_clusters
  python tools/bench_fresh.py --root /path/to/other/checkout q1 q2
      # A/B: run the SAME protocol against another checkout's code
      # (e.g. a git worktree at the r10 commit) for code-vs-host
      # bisection — the only experiment that separates the two.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {root!r})
from tsp_spark.queries import QUERIES, _load
from tsp_spark.session import get_spark
spark = get_spark("bench_fresh_child")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_load(spark, sf_dir, "events").count()   # same warmup as bench.py
fn = QUERIES[{name!r}]
best, n = float("inf"), 0
for _ in range({reps}):
    t0 = time.perf_counter()
    n = fn(spark, sf_dir).count()
    best = min(best, time.perf_counter() - t0)
print(json.dumps({{"sec": round(best, 3), "rows": n}}))
"""


def main() -> None:
    argv = sys.argv[1:]
    reps, root = 3, str(ROOT)
    args = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--reps":
            if i + 1 >= len(argv):
                sys.exit("--reps needs a value")
            reps, i = int(argv[i + 1]), i + 2
        elif a == "--root":
            if i + 1 >= len(argv):
                sys.exit("--root needs a path")
            root, i = argv[i + 1], i + 2
        else:
            args.append(a)
            i += 1
    from bench import BENCH_QUERIES

    names = args or BENCH_QUERIES
    prior = {}
    for r in (10, 11):
        p = ROOT / f"bench_full_r{r}.json"
        if p.exists():
            prior[r] = json.loads(p.read_text()).get("queries", {})
    out = {}
    for name in names:
        code = CHILD.format(root=root, name=name, reps=reps)
        try:
            res = subprocess.run(
                [sys.executable, "-c", code], capture_output=True,
                text=True, timeout=900,
            )
            line = (
                res.stdout.strip().splitlines()[-1]
                if res.stdout.strip()
                else ""
            )
            try:
                rec = json.loads(line)
            except Exception:
                rec = {"error": (res.stderr or "no output")[-500:]}
        except subprocess.TimeoutExpired:
            # one stuck query must record as a row, not abort the
            # sweep and discard every prior timing
            rec = {"error": "timeout after 900s"}
        r10 = prior.get(10, {}).get(name)
        r11 = prior.get(11, {}).get(name)
        if "sec" in rec:
            rec["r10_sec"], rec["r11_sec"] = r10, r11
            if r10:
                rec["vs_r10_x"] = round(rec["sec"] / r10, 2)
        out[name] = rec
        print(
            f"# {name}: fresh best-of-{reps} {rec.get('sec')}s "
            f"(r10 {r10}s, r11 {r11}s"
            + (f", {rec['vs_r10_x']}x vs r10" if "vs_r10_x" in rec else "")
            + ")",
            file=sys.stderr,
        )
    repro = {
        k: v for k, v in out.items() if v.get("vs_r10_x", 0) >= 1.3
    }
    print(json.dumps({"fresh": out, "reproduced_ge_1.3x": list(repro)}))


if __name__ == "__main__":
    main()
