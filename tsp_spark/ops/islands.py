"""Island detection — the central kernel of the engine.

Run-length-encodes a boolean condition per partition key into maximal
time intervals ("islands") on which the condition is constant, splitting
a series whenever the gap between consecutive events exceeds
``max_gap_ms`` (the reference's ``eventsMaxGapMs`` series split,
streaming/.../mappers/PatternProcessor.scala:33-56).

This single kernel re-expresses five reference operators (see SURVEY §7.1):
SimplePattern RLE segmentization (core/.../SimplePattern.scala:27-37),
TimerPattern "X for T" (core/.../aggregators/TimerPattern.scala), the
eventsMaxGapMs series split, the AndThen operands
(core/.../AndThenPattern.scala), and incident sessionization
(core/.../Incident.scala:27-48).

Scale notes: one shuffle on the partition keys (unavoidable — the keyed
window needs co-location), then everything is a single window pass +
partial-aggregated groupBy that reuses the same partitioning, so Catalyst
plans ONE exchange for the whole islandization. Output is tiny relative
to input (one row per run), so downstream joins on islands are cheap.

Assumes (keys…, ts) uniquely identifies a row (like the compiler's
join-back): the windows order by ts alone, so duplicate timestamps
within a key get nondeterministic relative order — island membership and
``with_idx`` row numbers can differ between evaluations on such data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_MAX_GAP_MS = 60_000


def with_islands(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    cond: Column,
    max_gap_ms: int | None = DEFAULT_MAX_GAP_MS,
    island_col: str = "__island",
    cond_col: str = "__cond",
) -> DataFrame:
    """Append an island id column: a new island starts when the condition
    value changes, at the first row of a key, or after a time gap larger
    than ``max_gap_ms``. NULL condition (= trilean Fail) is its own state,
    distinct from both true and false.
    """
    w = Window.partitionBy(*keys).orderBy(ts)
    ms = F.unix_millis(F.col(ts))
    # NULL-safe change detection: eqNullSafe treats NULL==NULL as true.
    cond_changed = ~cond.eqNullSafe(F.lag(cond).over(w))
    boundary = cond_changed | F.lag(F.col(ts)).over(w).isNull()
    if max_gap_ms is not None:
        boundary = boundary | (ms - F.lag(ms).over(w) > F.lit(max_gap_ms))
    return df.withColumn(cond_col, cond).withColumn(
        island_col,
        F.sum(boundary.cast("int")).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def islands(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    cond: Column,
    max_gap_ms: int | None = DEFAULT_MAX_GAP_MS,
    keep: bool | None = True,
    with_idx: bool = False,
) -> DataFrame:
    """Collapse each island to one row: ``keys…, from_ts, to_ts, n_rows``.

    ``keep=True`` returns only islands where the condition held (the
    common case: success intervals); ``keep=None`` returns all islands
    with a ``cond_value`` column. ``with_idx=True`` additionally emits
    ``start_idx``/``end_idx`` (per-key row numbers), needed by the
    ``and_then`` sequence join.
    """
    base = df
    if with_idx and "__idx" not in base.columns:
        # callers may precompute __idx on a wider row set (e.g. raw
        # per-key indices before absent rows are dropped) — reuse it
        w = Window.partitionBy(*keys).orderBy(ts)
        base = base.withColumn("__idx", F.row_number().over(w))
    flagged = with_islands(base, keys, ts, cond, max_gap_ms)
    aggs = [
        F.min(ts).alias("from_ts"),
        F.max(ts).alias("to_ts"),
        F.count(F.lit(1)).alias("n_rows"),
    ]
    if with_idx:
        aggs += [F.min("__idx").alias("start_idx"), F.max("__idx").alias("end_idx")]
    grouped = flagged.groupBy(*keys, "__island", "__cond").agg(*aggs)
    # drop the internal island id — the docstring schema is
    # ``keys…, from_ts, to_ts, n_rows`` and leaking it forces every
    # caller to select around it (review-caught)
    if keep is not None:
        grouped = grouped.filter(F.col("__cond").eqNullSafe(F.lit(keep)))
        return grouped.drop("__cond", "__island")
    return grouped.withColumnRenamed("__cond", "cond_value").drop("__island")


def islands_sharded(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    cond: Column,
    max_gap_ms: int | None = DEFAULT_MAX_GAP_MS,
    keep: bool | None = True,
    shard_ms: int = 3_600_000,
) -> DataFrame:
    """``islands`` with the per-key row work spread over TIME SHARDS —
    the hot-key mitigation (see docs/SCALE.md skewed-soak note): a
    keyed window puts a key's entire series in one task, so a key
    carrying half the corpus Amdahl-bounds the stage no matter how
    many executors exist. Here rows partition by (key, ⌊ms/shard_ms⌋)
    — the hot key's scan parallelizes across its time range — and
    only the ISLAND-level stitch (rows = runs, orders of magnitude
    smaller) runs per-key.

    Exact by construction: ``keep=None`` islands TILE a key's rows in
    time order, so every within-shard boundary is already decided by
    the base kernel, and a cross-shard pair of adjacent islands
    re-evaluates the exact same boundary rule the row kernel would
    have applied to its boundary rows — condition changed (null-safe)
    or gap > max_gap_ms; adjacent same-shard islands are boundaries
    by construction. A per-key running sum over the island sequence
    then merges runs that straddle any number of shards
    (property-tested equal to ``islands`` across shard sizes from
    one-row-per-shard to one-shard-total).

    Same caveats as ``islands`` (unique (keys…, ts)); ``with_idx``
    is not offered — global per-key row numbers are precisely the
    serialization this variant exists to avoid. Choose ``shard_ms``
    ≫ max_gap_ms and ≫ typical run length so stitch chains stay
    short; any value is CORRECT (chains just grow), the choice only
    tunes parallelism."""
    if not isinstance(shard_ms, int) or shard_ms < 1:
        # shard_ms=0 would otherwise surface as an ANSI DIVIDE_BY_ZERO
        # mid-job (and replay forever in a retried context) instead of
        # a clean argument error (review-caught, r9)
        raise ValueError(f"shard_ms must be a positive int, got {shard_ms!r}")
    ms = F.unix_millis(F.col(ts))
    base = df.withColumn("__shard", F.floor(ms / F.lit(shard_ms)))
    part = islands(
        base, list(keys) + ["__shard"], ts, cond, max_gap_ms, keep=None
    )
    w = Window.partitionBy(*keys).orderBy("from_ts", "to_ts")
    prev_cond = F.lag("cond_value").over(w)
    prev_to = F.lag("to_ts").over(w)
    prev_shard = F.lag("__shard").over(w)
    gap = F.unix_millis(F.col("from_ts")) - F.unix_millis(prev_to)
    cross_boundary = ~F.col("cond_value").eqNullSafe(prev_cond)
    if max_gap_ms is not None:
        cross_boundary = cross_boundary | (gap > F.lit(max_gap_ms))
    new_island = (
        F.when(prev_to.isNull(), F.lit(1))               # first island
        .when(F.col("__shard").eqNullSafe(prev_shard), F.lit(1))
        .otherwise(cross_boundary.cast("int"))
    )
    merged = part.withColumn(
        "__mid",
        F.sum(new_island).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    grouped = merged.groupBy(*keys, "__mid", "cond_value").agg(
        F.min("from_ts").alias("from_ts"),
        F.max("to_ts").alias("to_ts"),
        F.sum("n_rows").alias("n_rows"),
    )
    if keep is not None:
        grouped = grouped.filter(F.col("cond_value").eqNullSafe(F.lit(keep)))
        return grouped.drop("cond_value", "__mid")
    return grouped.drop("__mid")


def with_run_start(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    cond: Column,
    max_gap_ms: int | None = DEFAULT_MAX_GAP_MS,
    run_start_col: str = "__run_start",
    island_col: str = "__island",
    cond_col: str = "__cond",
) -> DataFrame:
    """Append, to every row, the start timestamp of the current island.

    This is what makes TimerPattern ("cond holds continuously for T")
    row-level composable: a row satisfies the timer iff
    ``cond AND ts >= run_start + T`` — no join, just a second window
    over the same partitioning (no extra shuffle).

    The flag columns (``island_col``, ``cond_col``) stay in the output —
    override both names when composing two run-starts on one frame so
    the second call can't clobber the first's columns (review-caught:
    cond_col used to be hardwired to ``__cond``).
    """
    flagged = with_islands(
        df, keys, ts, cond, max_gap_ms,
        island_col=island_col, cond_col=cond_col,
    )
    w_island = Window.partitionBy(*keys, island_col)
    return flagged.withColumn(run_start_col, F.min(ts).over(w_island))
