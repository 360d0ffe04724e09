"""NarrowDataUnfolding — EAV/key-value rows → wide sensor rows.

The reference pivots (sensor_id, value) pairs into one column per sensor,
one output row per distinct (keys, timestamp), forward-filling each column
until its timeout expires (streaming/.../transformers/
SparseRowsDataAccumulator.scala:15-97; value-column routing
StreamSource.scala:90-112).

Spark-first: conditional aggregation (max(when(key==s, value))) instead of
``.pivot()`` — avoids pivot's extra distinct-scan job, keeps the plan a
single shuffle on (keys, ts) when the sensor list is declared (it always
is in the reference: sensors come from the pattern field set). Then the
shared forward_fill kernel.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsp_spark.ops.fill import forward_fill


def unfold_narrow(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    key_col: str,
    value_col: str,
    sensors: Sequence[str],
    value_col_mapping: Mapping[str, Sequence[str]] | None = None,
    default_timeout_ms: int | None = None,
    timeouts_ms: Mapping[str, int] | None = None,
) -> DataFrame:
    """Pivot narrow rows to wide + timed forward-fill.

    ``value_col_mapping`` routes listed sensors to an alternative value
    column (e.g. string sensors read from ``value_str``), mirroring the
    reference's NarrowDataUnfolding.valueColumnMapping.
    """
    source_col = {}
    for alt_col, routed in (value_col_mapping or {}).items():
        for s in routed:
            source_col[s] = alt_col
    aggs = [
        F.max(
            F.when(F.col(key_col) == F.lit(s), F.col(source_col.get(s, value_col)))
        ).alias(s)
        for s in sensors
    ]
    wide = df.groupBy(*keys, ts).agg(*aggs)
    return forward_fill(
        wide,
        keys,
        ts,
        list(sensors),
        default_timeout_ms=default_timeout_ms,
        timeouts_ms=timeouts_ms,
    )
