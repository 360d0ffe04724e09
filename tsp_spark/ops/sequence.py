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

from pyspark.sql import Column, DataFrame, Window
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
    the previous result is the left side.

    Match rule (AndThenPattern.scala:69-88): a B-run matches an A-run
    unless B is late (B.end < A.start) or gapped (B.start > A.end + 1) —
    overlapping runs DO match. Reported interval follows the documented
    semantics (docs/writing-patterns.md:76-79): "from the timestamp when
    LHS starts to the timestamp when RHS ends" — [A.from, B.to] — which
    is what the golden fixtures (SimpleCasesTest cases 9, 16-17, 47-48,
    51-52) encode. Runs are consumed 1:1 sequentially, approximated by
    keeping the earliest B per A and then the earliest A per B.
    """
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
    joined = a.join(b, on=[*keys], how="inner").where(
        (F.col("__b_si") <= F.col("__a_ei") + 1) & (F.col("__b_ei") >= F.col("__a_si"))
    )
    w_a = Window.partitionBy(*keys, "__a_si").orderBy("__b_si")
    w_b = Window.partitionBy(*keys, "__b_si").orderBy("__a_si")
    paired = (
        joined.withColumn("__rb", F.row_number().over(w_a))
        .where(F.col("__rb") == 1)
        .withColumn("__ra", F.row_number().over(w_b))
        .where(F.col("__ra") == 1)
    )
    return paired.select(
        *keys,
        F.col("__a_from").alias("from_ts"),
        F.col("__b_to").alias("to_ts"),
        F.col("__a_si").alias("start_idx"),
        F.greatest("__a_ei", "__b_ei").alias("end_idx"),
    )
