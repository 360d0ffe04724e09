"""Deterministic sketches for cardinality at scale.

KMV (k-minimum-values) distinct-count sketch: keep the k smallest
values of a uniform hash of the keys; if fewer than k distinct hashes
exist the count is exact, otherwise the estimator (k−1)/h_k (h_k = the
k-th smallest hash normalized to [0,1)) is unbiased with relative error
~1/√(k−2).

Unlike HLL++ (Spark) vs HyperLogLog (DuckDB) — whose register layouts
differ so their estimates can never be value-compared — KMV is a pure
function of the hash values, and the md5_long bridge
(pipeline/hashing.py) makes those identical in both engines, so the
sketch is oracle-checkable to the last bit.

100 TB shape: stage 1 dedups (group, hash) pairs with a partial-agg
groupBy (map-side combine collapses repeats before the shuffle);
stage 2 keeps the k smallest per group with one window pass over the
same partitioning; stage 3 is a tiny per-group aggregate. Sketch size
per group is k longs — mergeable by union+re-truncate."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tsp_spark.pipeline.hashing import md5_long

HASH_SPACE = float(1 << 60)  # md5_long is 60-bit non-negative


def kmv_distinct(
    df: DataFrame,
    value_col: str | Column,
    group_cols: Sequence[str],
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-count estimate: (group_cols…, n_kept,
    est_distinct). Exact when a group has < k distinct values."""
    col = F.col(value_col) if isinstance(value_col, str) else value_col
    h = md5_long(col.cast("string"))
    # NULL values are not countable distinct values: Spark sorts NULLS
    # FIRST, so an unfiltered NULL hash would occupy a top-k slot,
    # inflate n_kept and bias the estimator — while DuckDB (NULLS
    # LAST) would disagree (review-caught)
    pairs = (
        df.where(col.isNotNull())
        .select(*group_cols, h.alias("__h"))
        .distinct()
    )
    # salted local top-k before the per-group window (the top_tokens
    # trick, provably result-identical: a hash below its salt-locale's
    # top k is below the global top k): the reduce-side window input
    # is bounded at 32·k rows per group instead of a group's ENTIRE
    # distinct hash set flowing through one task at 100 TB
    w_local = Window.partitionBy(
        *group_cols, F.pmod(F.col("__h"), F.lit(32))
    ).orderBy("__h")
    pairs = pairs.withColumn(
        "__lr", F.row_number().over(w_local)
    ).where(F.col("__lr") <= k)
    w = Window.partitionBy(*group_cols).orderBy("__h")
    kept = pairs.withColumn("__r", F.row_number().over(w)).where(F.col("__r") <= k)
    hk = F.max("__h").cast("double") / F.lit(HASH_SPACE)
    n = F.count(F.lit(1))
    return kept.groupBy(*group_cols).agg(
        n.alias("n_kept"),
        F.round(
            F.when(n < k, n.cast("double")).otherwise((F.lit(k) - 1) / hk), 4
        ).alias("est_distinct"),
    )
