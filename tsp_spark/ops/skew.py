"""Skew mitigation helpers for hot partition keys.

The reference caps key-partitions at 8192 and runs one fiber per key
(StreamPartitionOps.scala:11-34) — a chatty unit simply saturates its
fiber. On a cluster the equivalent failure is one straggler task per
hot key. AQE's skew-join splitting handles joins; for *aggregations*
over skewed keys, use two-phase salted aggregation:

    phase 1: groupBy(key, salt) — spreads one hot key over N tasks,
             map-side partial aggregation shrinks each shard
    phase 2: groupBy(key) — merges the N shard results (tiny input)

Only algebraic aggregates (sum/count/min/max and anything built from
them, e.g. avg = sum/count) can be salted this way.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, Column]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output name →
    (merge_fn_name, phase1_column) where merge_fn_name ∈
    {'sum','min','max'} re-combines the per-salt partials.

    Example (skew-safe count + sum + avg):

        salted_agg(df, ["user_id"], {
            "n":   ("sum", F.count(F.lit(1))),
            "tot": ("sum", F.sum("value")),
        }).withColumn("avg", F.col("tot") / F.col("n"))
    """
    merge = {"sum": F.sum, "min": F.min, "max": F.max}
    salted = df.withColumn(_SALT, (F.rand(seed=7) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, _SALT).agg(
        *[c.alias(f"__p_{name}") for name, (_m, c) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[
            merge[m](F.col(f"__p_{name}")).alias(name)
            for name, (m, _c) in aggs.items()
        ]
    )
