"""Incident sessionization — merge adjacent intervals separated by ≤ gap.

The reference merges adjacent incidents of the same (pattern, unit,
subunit) whenever next.from − prev.to ≤ maxWindowMs, unioning their
segments (streaming/.../PatternsSearchJob.scala:259-305;
core/.../Incident.scala:27-48 Semigroup).

Spark-first: a second island-detection pass over the (already tiny)
interval table — boundary when the gap to the previous interval exceeds
the merge gap, then groupBy(island) → min(from), max(to).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize_intervals(
    df: DataFrame,
    keys: Sequence[str],
    from_col: str = "from_ts",
    to_col: str = "to_ts",
    gap_ms: int = 2_000,
) -> DataFrame:
    """Merge intervals per key whose start is within ``gap_ms`` of the
    running maximum end of the current merged group (handles contained /
    overlapping intervals, not just back-to-back ones)."""
    w = Window.partitionBy(*keys).orderBy(from_col, to_col)
    # project the running max to a column first: referencing the window
    # expression twice (isNull + the gap arithmetic) would compute it
    # twice inside one Window node (r14, guide §1.2)
    sessioned = df.withColumn(
        "__prev_end",
        F.max(F.unix_millis(F.col(to_col))).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
    )
    boundary = (
        F.col("__prev_end").isNull()
        | (F.unix_millis(F.col(from_col)) - F.col("__prev_end") > F.lit(gap_ms))
    )
    sessioned = sessioned.withColumn(
        "__session",
        F.sum(boundary.cast("int")).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("__prev_end")
    return (
        sessioned.groupBy(*keys, "__session")
        .agg(
            F.min(from_col).alias(from_col),
            F.max(to_col).alias(to_col),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("__session")
    )
