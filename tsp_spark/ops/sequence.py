"""The `andThen` sequence join — the one genuinely order-dependent operator.

Reference semantics (core/.../AndThenPattern.scala:42-94;
docs/writing-patterns.md:76-79): "A andThen B" succeeds on the interval
[start(A), end(B)] when a success interval of B begins no later than one
event after the success interval of A ends; a B that starts later (a gap
of failing events in between) does NOT match that A.

Spark-first strategy: islandize both operands (run-length encoding makes
the interval tables tiny relative to the event stream), then join island
tables per key on the match condition

    B.start_idx <= A.end_idx + 1  AND  B.end_idx >= A.start_idx

(not-gapped and not-late — overlapping runs DO match, including a B that
ends inside A). Both island tables derive from the same keyed shuffle;
the join keys are the partition keys, so at scale this is a
co-partitioned join of two small derived tables — with AQE it typically
executes as a broadcast join of the smaller side.

Assumes (keys…, ts) uniquely identifies a row, like the compiler's
join-back: duplicate timestamps within a key get nondeterministic
per-side row numbers and can corrupt the index-adjacency join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tsp_spark.ops.islands import DEFAULT_MAX_GAP_MS, islands


def and_then(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    cond_a: Column,
    cond_b: Column,
    max_gap_ms: int | None = DEFAULT_MAX_GAP_MS,
) -> DataFrame:
    """Match success runs of ``cond_a`` immediately followed by success
    runs of ``cond_b``; emit one row per A-run that matches:
    ``keys…, from_ts (=A start), to_ts (=B end)``.

    Series-split aware (review-caught): the reference resets ALL state
    at a gap > max_gap_ms (PatternProcessor.scala:33-56), so an A-run
    ending just before a split must not match a B-run starting right
    after it even though their indices are adjacent — the islandize and
    the join both run per (keys…, series)."""
    jkeys = list(keys)
    if max_gap_ms is not None:
        # same formula as the compiler's with_series
        w = Window.partitionBy(*keys).orderBy(ts)
        ms = F.unix_millis(F.col(ts))
        brk = (ms - F.lag(ms).over(w) > F.lit(max_gap_ms)).cast("int")
        df = df.withColumn(
            "__series_seq",
            F.sum(F.coalesce(brk, F.lit(0))).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        jkeys = [*keys, "__series_seq"]
    ia = islands(df, jkeys, ts, cond_a, max_gap_ms, with_idx=True)
    ib = islands(df, jkeys, ts, cond_b, max_gap_ms, with_idx=True)
    out = and_then_intervals(ia, ib, jkeys)
    return out.drop("__series_seq") if max_gap_ms is not None else out


def and_then_intervals(
    left: DataFrame, right: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Sequence-join two interval tables (each with keys…, from_ts, to_ts,
    n_rows, start_idx, end_idx). Used directly for chained
    ``A andThen B andThen C``: the previous result is the left side.

    Match rule (AndThenPattern.scala:69-88): a B-run matches an A-run
    unless B is late (B.end < A.start) or gapped (B.start > A.end + 1) —
    overlapping runs DO match. Reported interval follows the documented
    semantics (docs/writing-patterns.md:76-79): "from the timestamp when
    LHS starts to the timestamp when RHS ends" — [A.from, B.to] — which
    is what the golden fixtures (SimpleCasesTest cases 9, 16-17, 47-48,
    51-52) encode. Runs are consumed 1:1 sequentially, approximated by
    keeping the earliest B per A and then the earliest A per B (the
    known deviations from the reference's two-queue rewind on
    overlap-edge shapes are documented in docs/SEMANTICS.md §17).
    ``n_rows`` is the reported index span ``end_idx − start_idx + 1``
    (contiguous by the adjacency condition), keeping the
    compile_pattern output contract uniform across pattern shapes.
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
    end_idx = F.greatest("__a_ei", "__b_ei")
    return paired.select(
        *keys,
        F.col("__a_from").alias("from_ts"),
        F.col("__b_to").alias("to_ts"),
        (end_idx - F.col("__a_si") + 1).alias("n_rows"),
        F.col("__a_si").alias("start_idx"),
        end_idx.alias("end_idx"),
    )
