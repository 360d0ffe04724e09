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
    shard_col: str | None = None,
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
    tunes parallelism.

    ``shard_col`` (r10): name of a PRE-COMPUTED shard column equal to
    ``floor(unix_millis(ts) / shard_ms)`` — callers that already
    partitioned rows by (key, shard) (timer_islands_sharded) pass it
    so the within-shard islandization reuses their exchange instead
    of hashing the row data a second time."""
    if not isinstance(shard_ms, int) or shard_ms < 1:
        # shard_ms=0 would otherwise surface as an ANSI DIVIDE_BY_ZERO
        # mid-job (and replay forever in a retried context) instead of
        # a clean argument error (review-caught, r9)
        raise ValueError(f"shard_ms must be a positive int, got {shard_ms!r}")
    ms = F.unix_millis(F.col(ts))
    if shard_col is None:
        shard_col = "__shard"
        base = df.withColumn(shard_col, F.floor(ms / F.lit(shard_ms)))
    else:
        base = df
    part = islands(
        base, list(keys) + [shard_col], ts, cond, max_gap_ms, keep=None
    )
    return stitch_sharded_islands(part, keys, max_gap_ms, keep, shard_col)


def stitch_sharded_islands(
    part: DataFrame,
    keys: Sequence[str],
    max_gap_ms: int | None,
    keep: bool | None,
    shard_col: str,
) -> DataFrame:
    """The island-level half of ``islands_sharded``: merge per-(key,
    shard) islands (``keys…, shard_col, cond_value, from_ts, to_ts,
    n_rows``) into global islands. Exposed so callers that build the
    within-shard islands themselves (the present-masked lag path,
    api._sharded_stateful_intervals) reuse the exact stitch rule.
    Rows here are RUNS, orders of magnitude fewer than events — every
    window below is cheap by construction."""
    w = Window.partitionBy(*keys).orderBy("from_ts", "to_ts")
    prev_cond = F.lag("cond_value").over(w)
    prev_to = F.lag("to_ts").over(w)
    prev_shard = F.lag(shard_col).over(w)
    gap = F.unix_millis(F.col("from_ts")) - F.unix_millis(prev_to)
    cross_boundary = ~F.col("cond_value").eqNullSafe(prev_cond)
    if max_gap_ms is not None:
        cross_boundary = cross_boundary | (gap > F.lit(max_gap_ms))
    new_island = (
        F.when(prev_to.isNull(), F.lit(1))               # first island
        .when(F.col(shard_col).eqNullSafe(prev_shard), F.lit(1))
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


def with_series_sharded(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    max_gap_ms: int,
    shard_ms: int = 3_600_000,
    series_col: str = "__gseries",
) -> DataFrame:
    """GLOBAL gap-delimited series ids without a per-key ordered scan —
    the sharded equivalent of the compiler's ``with_series`` (r10).

    Two-level decomposition: break flags and their cumulative count are
    per (key, time-shard) windows (a shard's first row can't see its
    raw predecessor, so its break flag is deferred); then ONE tiny
    per-(key, shard) table — break totals plus first/last row ts —
    resolves the cross-shard boundary breaks and the per-shard prefix
    with a window over SHARDS (rows = occupied shards per key, not
    events), broadcast back by joining on the (key, shard) partitioning
    the rows already have. A key with a billion rows contributes
    hours-count rows to the serial step instead of a billion.

    Equal to ``PatternCompiler.with_series`` at any shard size
    (property-tested)."""
    if not isinstance(shard_ms, int) or shard_ms < 1:
        raise ValueError(f"shard_ms must be a positive int, got {shard_ms!r}")
    if max_gap_ms is None:
        return df.withColumn(series_col, F.lit(0).cast("long"))
    ms = F.unix_millis(F.col(ts))
    base = df.withColumn("__wsh", F.floor(ms / F.lit(shard_ms)))
    w = Window.partitionBy(*keys, "__wsh").orderBy(ts)
    brk = (ms - F.lag(ms).over(w) > F.lit(max_gap_ms)).cast("long")
    base = base.withColumn(
        "__brk_cum",
        F.sum(F.coalesce(brk, F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    per_shard = base.groupBy(*keys, "__wsh").agg(
        F.max("__brk_cum").alias("__breaks"),
        F.min(ms).alias("__first_ms"),
        F.max(ms).alias("__last_ms"),
    )
    wsh = Window.partitionBy(*keys).orderBy("__wsh")
    boundary = (
        F.col("__first_ms") - F.lag("__last_ms").over(wsh)
        > F.lit(max_gap_ms)
    ).cast("long")
    prefix = per_shard.withColumn(
        "__prefix",
        F.coalesce(
            F.sum(F.coalesce(boundary, F.lit(0)) + F.col("__breaks")).over(
                wsh.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
        + F.coalesce(boundary, F.lit(0)),
    ).select(*keys, "__wsh", "__prefix")
    return (
        base.join(prefix, [*keys, "__wsh"])
        .withColumn(
            series_col, (F.col("__prefix") + F.col("__brk_cum")).cast("long")
        )
        .drop("__wsh", "__brk_cum", "__prefix")
    )


def timer_islands_sharded(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    cond: Column,
    window_ms: int,
    max_gap_ms: int = DEFAULT_MAX_GAP_MS,
    keep: bool | None = True,
    shard_ms: int = 3_600_000,
) -> DataFrame:
    """TimerPattern ``cond for T`` with the per-key row work sharded by
    time — extends the ``islands_sharded`` hot-key mitigation to the
    stateful timer grammar (r10; reference TimerPattern.scala).

    A timer row is true iff cond holds and the current run started at
    least ``window_ms`` ago, so its value depends on history — but only
    ``window_ms + max_gap_ms`` of it: if the run reaches back to
    ``ts - window_ms``, the gap rule guarantees a run row inside
    ``(ts - window_ms - max_gap_ms, ts - window_ms]`` (consecutive run
    rows are never more than max_gap apart), and any run break inside
    the lookback is itself visible. So each row is DUPLICATED into the
    following shard(s) whose lookback region contains it (a map-only
    explode, ~``1 + lookback/shard_ms`` copies — choose shard_ms ≫
    window+max_gap and the factor is ~1), the run start is computed
    per (key, shard) exactly as the compiler's _run_start_ms (trilean
    null-safe change / first row / gap boundary), overlap copies are
    dropped after their lookback job is done, and the per-row timer
    boolean — now exact on every owned row by the argument above — is
    stitched by ``islands_sharded`` reusing the same shard column.

    Requires the gap rule: with ``max_gap_ms=None`` the lookback is
    unbounded and only the ordered per-key scan is correct (callers
    fall back to the standard compiler path).
    """
    if not isinstance(shard_ms, int) or shard_ms < 1:
        raise ValueError(f"shard_ms must be a positive int, got {shard_ms!r}")
    if max_gap_ms is None:
        raise ValueError(
            "timer_islands_sharded requires max_gap_ms — without the gap "
            "rule the run-start lookback is unbounded"
        )
    if window_ms < 0:
        raise ValueError(f"window_ms must be >= 0, got {window_ms!r}")
    lookback = int(window_ms) + int(max_gap_ms)
    ms = F.unix_millis(F.col(ts))
    own = F.floor(ms / F.lit(shard_ms))
    expanded = df.withColumn(
        "__tshard",
        F.explode(
            F.sequence(own, F.floor((ms + F.lit(lookback)) / F.lit(shard_ms)))
        ),
    )
    w = Window.partitionBy(*keys, "__tshard").orderBy(ts)
    boundary = (
        ~cond.eqNullSafe(F.lag(cond).over(w))
        | F.lag(F.col(ts)).over(w).isNull()
        | (ms - F.lag(ms).over(w) > F.lit(max_gap_ms))
    )
    flagged = expanded.withColumn("__tb", boundary)
    run_start = F.max(F.when(F.col("__tb"), ms)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    timer = F.when(cond.isNull(), F.lit(None).cast("boolean")).otherwise(
        cond & (ms - run_start >= F.lit(window_ms))
    )
    owned = (
        flagged.withColumn("__timer", timer)
        .where(F.col("__tshard") == own)
        .drop("__tb")
    )
    return islands_sharded(
        owned, keys, ts, F.col("__timer"), max_gap_ms,
        keep=keep, shard_ms=shard_ms, shard_col="__tshard",
    )


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
