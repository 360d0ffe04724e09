"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

BENCH_QUERIES = [
    # CEP surface (the reference's own domain)
    "cep_threshold_islands",
    "cep_timer_for",
    "cep_andthen",
    "cep_avg_window",
    "cep_truth_count",
    "cep_fill_narrow",
    "cep_sessionize",
    "cep_incidents_multi",
    # relational building blocks
    "rel_q1_pricing",
    "rel_q3_shipping",
    "rel_q5_nation_revenue",
    "rel_q14_promo",
    "rel_window_topk",
    "rel_asof_join",
    # pipeline extensions
    "dedup_exact",
    "dedup_jaccard",
    "dedup_minhash_lsh",
    "text_token_stats",
    "text_tokens_bpe",
    "text_fingerprint",
    "embed_quantize",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "embed_centroids",
    "dedup_embedding",
    "dedup_clusters",
    "cep_minmax_window",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from tsp_spark.queries import QUERIES, _load
    from tsp_spark.session import get_spark

    spark = get_spark("tsp_spark_bench")

    # warm the JVM + parquet footers with a trivial action
    _load(spark, sf_dir, "events").count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        # best of 2: the first run pays parquet-footer/code-gen warmup
        # and GC noise; the minimum is the stable per-query cost
        best, n = float("inf"), 0
        for _ in range(2):
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        total += best
        print(f"# {name}: {best:.3f}s ({n} rows)", file=sys.stderr)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "tsp_spark bench: sum of headline query wall times",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
