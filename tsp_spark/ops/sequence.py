"""The `andThen` sequence join — the one genuinely order-dependent operator.

Reference semantics (core/.../AndThenPattern.scala:42-94;
docs/writing-patterns.md:76-79): "A andThen B" succeeds on the interval
[start(A), end(B)] when a success interval of B begins no later than one
event after the success interval of A ends; a B that starts later (a gap
of failing events in between) does NOT match that A.

Spark-first strategy: islandize both operands (run-length encoding makes
the interval tables tiny relative to the event stream), then join island
tables per key on the adjacency condition

    B.start_idx <= A.end_idx + 1  AND  B.end_idx > A.end_idx

and keep, per A-island, the earliest matching B (min end). Both island
tables derive from the same keyed shuffle; the join keys are the partition
keys, so at scale this is a co-partitioned join of two small derived
tables — with AQE it typically executes as a broadcast join of the
smaller side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tsp_spark.ops.islands import islands


def and_then(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    cond_a: Column,
    cond_b: Column,
    max_gap_ms: int | None = 60_000,
) -> DataFrame:
    """Match success runs of ``cond_a`` immediately followed by success
    runs of ``cond_b``; emit one row per A-run that matches:
    ``keys…, from_ts (=A start), to_ts (=B end)``."""
    ia = islands(df, keys, ts, cond_a, max_gap_ms, with_idx=True)
    ib = islands(df, keys, ts, cond_b, max_gap_ms, with_idx=True)
    return and_then_intervals(ia, ib, keys)


def and_then_intervals(
    left: DataFrame, right: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Sequence-join two interval tables (each with keys…, from_ts, to_ts,
    start_idx, end_idx). Used directly for chained ``A andThen B andThen C``:
    the previous result is the left side."""
    a = left.select(
        *keys,
        F.col("from_ts").alias("__a_from"),
        F.col("to_ts").alias("__a_to"),
        F.col("start_idx").alias("__a_si"),
        F.col("end_idx").alias("__a_ei"),
    )
    b = right.select(
        *keys,
        F.col("from_ts").alias("__b_from"),
        F.col("to_ts").alias("__b_to"),
        F.col("start_idx").alias("__b_si"),
        F.col("end_idx").alias("__b_ei"),
    )
    joined = a.join(
        b,
        on=[*keys],
        how="inner",
    ).where((F.col("__b_si") <= F.col("__a_ei") + 1) & (F.col("__b_ei") > F.col("__a_ei")))
    # Earliest qualifying B per A-run.
    return (
        joined.groupBy(*keys, "__a_from", "__a_to", "__a_si", "__a_ei")
        .agg(
            F.min("__b_to").alias("to_ts"),
            F.min("__b_ei").alias("end_idx"),
        )
        .select(
            *keys,
            F.col("__a_from").alias("from_ts"),
            "to_ts",
            F.col("__a_si").alias("start_idx"),
            "end_idx",
        )
    )
