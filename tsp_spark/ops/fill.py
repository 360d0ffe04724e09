"""Forward-fill with per-column timeouts — the reference's sparse-row filling.

Re-expresses WideDataFilling / the fill half of NarrowDataUnfolding
(streaming/.../transformers/SparseRowsDataAccumulator.scala:56-167):
each null is replaced by the last non-null value of the same key, unless
that value is older than the column's timeout (fieldsTimeoutsMs /
defaultTimeout), in which case it stays null (the reference expires the
cached value, :91-95).

Implementation: two window expressions per column over ONE shared
partitioning — `last(col, ignorenulls)` for the value and
`max(ts when col non-null)` for its age — so N columns fill in a single
window stage with no extra shuffle.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def forward_fill(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    cols: Sequence[str],
    default_timeout_ms: int | None = None,
    timeouts_ms: Mapping[str, int] | None = None,
) -> DataFrame:
    """Fill nulls in ``cols`` with the last seen value per key, expiring
    values older than the per-column timeout (ms). ``None`` timeout =
    fill forever.

    A row's OWN non-null value is always kept — expiry only suppresses
    stale fills (review-caught: a timeout ≤ 0 used to null out real
    data). Assumes (keys…, ts) uniquely identifies a row: with
    duplicate timestamps the rows-frame last() depends on tie order,
    which Spark does not stabilize across evaluations."""
    timeouts_ms = dict(timeouts_ms or {})
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ms = F.unix_millis(F.col(ts))
    filled_cols = {}
    for c in cols:
        timeout = timeouts_ms.get(c, default_timeout_ms)
        filled = F.last(F.col(c), ignorenulls=True).over(w)
        if timeout is None:
            filled_cols[c] = filled
        else:
            last_seen = F.max(F.when(F.col(c).isNotNull(), ms)).over(w)
            # strict <: the reference retains a cached value only while
            # now - seen < timeout (SparseRowsDataAccumulator.scala:91-95)
            filled_cols[c] = F.when(
                F.col(c).isNotNull(), F.col(c)
            ).otherwise(
                F.when(ms - last_seen < F.lit(timeout), filled)
            )
    # ONE withColumns call: per-column withColumn re-analyzes the
    # growing projection (O(n²) driver-side analysis on wide unfolds)
    return df.withColumns(filled_cols)
