"""Giant-component soak for neardup_clusters (r13, VERDICT r12 Next #7).

The sf-ladder soaks feed dedup_clusters realistic near-dup graphs —
many SMALL components — which never stress the two regimes that decide
whether star contraction survives 100 TB:

* a single component spanning (nearly) the whole corpus, where
  large-star's per-node fan-out peaks (the hub's neighborhood IS the
  graph) and the 2M-edge local finish must correctly DECLINE until the
  rounds have contracted the edge set under the gate;
* a maximum-diameter component (one long path), the shape that
  serializes plain label propagation to O(diameter) rounds — star
  contraction must close it in O(log n).

This soak builds both adversarial shapes at 5M nodes (edge sets > 2x
the local-finish gate), runs neardup_clusters with stats_sink
telemetry, verifies every node labels to the true component minimum,
and reports rounds-to-converge plus the per-round edge contraction
(the 'peak shuffle' proxy: every star round shuffles ~4x the current
edge count).

Usage: python tools/soak_clusters_giant.py [n_nodes]
Writes one JSON line to stdout; paste the table into docs/SCALE.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from tsp_spark.pipeline.dedup import neardup_clusters

    nums = [a for a in sys.argv[1:] if a.isdigit()]
    n = int(nums[0]) if nums else 5_000_000
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "100g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    nodes = spark.range(n).select(F.col("id").alias("doc_id"))

    def chain_edges():
        # path 0-1-2-...-n: maximum diameter, one component
        return spark.range(n - 1).select(
            F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
        )

    def hub_edges():
        # one hub (0) wired to 60% of nodes + a 40% chain tail grafted
        # on: peak large-star fan-out AND depth in one component
        cut = int(n * 0.6)
        star = spark.range(1, cut).select(
            F.lit(0).cast("long").alias("id_a"), F.col("id").alias("id_b")
        )
        tail = spark.range(cut - 1, n - 1).select(
            F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
        )
        return star.unionByName(tail)

    out = {"n_nodes": n, "legs": {}}
    for leg, edges_fn in (("chain", chain_edges), ("hub", hub_edges)):
        stats: dict = {}
        t0 = time.perf_counter()
        labels = neardup_clusters(
            nodes, edges_fn(), "doc_id", pairs_distinct=True,
            stats_sink=stats,
        )
        # single component with min id 0: every node must label 0 and
        # exactly one representative must exist
        bad = labels.where(F.col("cluster_id") != 0).count()
        reps = labels.where(F.col("is_representative") == 1).count()
        total = labels.count()
        wall = time.perf_counter() - t0
        ok = bad == 0 and reps == 1 and total == n
        out["legs"][leg] = {
            "sec": round(wall, 1),
            "rounds": stats.get("rounds"),
            "initial_edges": stats.get("initial_edges"),
            "edge_counts": stats.get("edge_counts"),
            "local_finish": stats.get("local_finish"),
            "labels_correct": ok,
        }
        print(
            f"# {leg}: {wall:.1f}s rounds={stats.get('rounds')} "
            f"edges={stats.get('initial_edges')}→{stats.get('edge_counts')} "
            f"local_finish={stats.get('local_finish')} correct={ok}",
            file=sys.stderr,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
