"""Trailing event-time window aggregates — the reference's aggregator layer.

Maps the reference's incremental sliding-window accumulators
(core/.../aggregators/GroupPattern.scala — sum/count/avg,
WindowStatistic.scala — truth stats, PreviousValue.scala — lag) onto
Spark ``Window.rangeBetween`` frames over epoch time. The reference's
O(1) evict-and-add loop becomes a vectorized codegen'd frame scan; same
partitioning as the island kernel so Catalyst fuses all of these into
one exchange + one window stage.

Window bounds (pinned by the reference's golden cases): GroupPattern
(sum/count/avg) uses the HALF-OPEN trailing window (t−W, t] — it evicts
elements with elem.time + W <= t (GroupPattern.scala:76) — while
WindowStatistic (truth stats) keeps the closed window [t−W, t]
(WindowStatistic.scala eviction is strict `<`). `half_open=True` on
``time_window`` selects the former.

Cost note (r12, helpers exported r13): with ``form="frame"`` the
``windowed_*`` helpers use Spark's literal sliding RANGE frame, which
re-aggregates its buffer per output row — O(rows-in-window) per row.
That is fine for short windows and sparse series, but a long window on
a dense series pays the measured 200-300×-at-24 h cliff (docs/SCALE.md
r12). Every helper here also exposes the engine's O(n) long-window
form directly (VERDICT r12 Next #2 — the compiler routed correctly but
the helper API still handed library users the cliff):

* ``windowed_sum/count/avg(..., form="prefix")`` — growing-frame
  difference (`_prefix_window_sum`; count is bit-exact, float sum/avg
  differ only in last-ulp association and assume FINITE inputs — the
  pattern compiler's form additionally recovers from NaN/±Inf);
* ``windowed_min_long`` / ``windowed_max_long`` — the two-block
  decomposition (`block_extreme`, bit-exact at any window length;
  df-in/df-out because it plants per-block sentinel rows);
* ``truth_stats`` — default ``form="prefix"`` since r12.
"""

from __future__ import annotations

from collections.abc import Sequence
from itertools import count as _count

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

_counter = _count()


def _tmp(prefix: str) -> str:
    return f"__{prefix}_{next(_counter)}"


def time_window(
    keys: Sequence[str],
    ts: str,
    window_s: float,
    leading: bool = False,
    half_open: bool = False,
) -> WindowSpec:
    """Trailing (or leading) event-time range frame of ``window_s`` seconds.

    Orders by epoch millis (long) so ``rangeBetween`` gets the integral
    bounds it requires while keeping sub-second resolution.
    ``half_open`` shrinks the trailing bound by 1 ms → (t−W, t].
    """
    # round, don't truncate: int(0.29 * 1000) == 289 silently shrinks
    # the frame by 1 ms for non-representable float seconds
    window_ms = round(window_s * 1000)
    w = Window.partitionBy(*keys).orderBy(F.unix_millis(F.col(ts)))
    if leading:
        # half-open leading = [t+1ms, t+W] — mirror of the trailing form
        return w.rangeBetween(1 if half_open else 0, window_ms)
    return w.rangeBetween(-(window_ms - 1) if half_open else -window_ms, 0)


def _prefix_window_sum(
    expr: Column,
    keys: Sequence[str],
    ts: str,
    window_ms: int,
    half_open: bool = True,
) -> tuple[Column, Column]:
    """(windowed sum of expr, windowed count of non-NULL expr) over the
    trailing window, each as the O(n) difference of two GROWING frames
    — Spark aggregates unbounded-preceding frames incrementally
    (UnboundedPrecedingWindowFunctionFrame), so the cost is flat in the
    window length where the sliding RANGE frame pays O(rows-in-window)
    per row. Complement bounds at integer millis: half-open (t−W, t]
    excludes rows with ms ≤ t−W (before-frame bound −W); closed
    [t−W, t] excludes ms ≤ t−W−1 (bound −(W+1)). The count lets callers
    reproduce the frame form's empty-window NULL (sum/avg over an empty
    or all-NULL frame is NULL, but a bare cum-difference would say 0)."""
    w_ord = Window.partitionBy(*keys).orderBy(F.unix_millis(F.col(ts)))
    wcum = w_ord.rangeBetween(Window.unboundedPreceding, 0)
    before = -window_ms if half_open else -(window_ms + 1)
    wbefore = w_ord.rangeBetween(Window.unboundedPreceding, before)

    def diff(contrib: Column) -> Column:
        return F.sum(contrib).over(wcum) - F.coalesce(
            F.sum(contrib).over(wbefore), F.lit(0)
        )

    return diff(expr), diff(F.when(expr.isNotNull(), 1).otherwise(0))


def _check_form(form: str) -> None:
    if form not in ("frame", "prefix"):
        raise ValueError(f"form must be 'frame' or 'prefix', got {form!r}")


def windowed_sum(
    col: Column, keys: Sequence[str], ts: str, window_s: float,
    form: str = "frame",
) -> Column:
    """Sum over the half-open trailing window (t−W, t]. ``form="prefix"``
    is the O(n) growing-frame difference for long/dense windows —
    bit-exact for integer inputs; float results can differ from the
    frame form in the last ulp of association, and non-finite inputs
    (NaN/±Inf) poison the running cumulative (use the pattern engine's
    ``avg(x, T)``/``sum`` for full non-finite recovery semantics)."""
    _check_form(form)
    if form == "prefix":
        s, n = _prefix_window_sum(col, keys, ts, round(window_s * 1000))
        return F.when(n > 0, s)
    return F.sum(col).over(time_window(keys, ts, window_s, half_open=True))


def windowed_count(
    col: Column, keys: Sequence[str], ts: str, window_s: float,
    form: str = "frame",
) -> Column:
    """Count of non-NULL values in (t−W, t]. The prefix form subtracts
    integer counts — bit-exact at any window length."""
    _check_form(form)
    if form == "prefix":
        _, n = _prefix_window_sum(col, keys, ts, round(window_s * 1000))
        return n
    return F.count(col).over(time_window(keys, ts, window_s, half_open=True))


def windowed_avg(
    col: Column, keys: Sequence[str], ts: str, window_s: float,
    form: str = "frame",
) -> Column:
    """Mean over (t−W, t]; NULL when the window holds no non-NULL value
    (both forms). Same float caveats as ``windowed_sum``."""
    _check_form(form)
    if form == "prefix":
        s, n = _prefix_window_sum(
            col.cast("double"), keys, ts, round(window_s * 1000)
        )
        return F.when(n > 0, s / n)
    return F.avg(col).over(time_window(keys, ts, window_s, half_open=True))


def windowed_min(col: Column, keys: Sequence[str], ts: str, window_s: float) -> Column:
    return F.min(col).over(time_window(keys, ts, window_s, half_open=True))


def windowed_max(col: Column, keys: Sequence[str], ts: str, window_s: float) -> Column:
    return F.max(col).over(time_window(keys, ts, window_s, half_open=True))


def block_extreme(
    df: DataFrame,
    value: Column,
    kind: str,
    window_ms: int,
    keys: Sequence[str],
    ts: str,
    leading: bool = False,
) -> tuple[DataFrame, Column]:
    """O(n) windowed min/max over the half-open trailing window
    (t−W, t] — the two-block decomposition (r12; moved here r13 so the
    compiler and the public helpers share ONE implementation). min/max
    are NOT subtractable, so the prefix-difference rewrite does not
    apply and the sliding RANGE frame re-aggregates its whole buffer
    per row — O(n × rows-in-window), 325 s for a 24 h window at 2M
    rows/1 Hz (tools/bench_window_frames.py). Instead, bucket event
    time into ALIGNED blocks of exactly the window width W. The
    half-open trailing window (t−W, t] then spans at most two blocks
    (b−1, b with b = ⌊t/W⌋), and

        win_extreme(t) = least/greatest(
            prefix extreme of block b up to t,          -- A
            suffix extreme of block b−1 after t−W )     -- B

    A is a growing frame within (keys, block). B is fetched as-of
    time t−W: per row, `sfx` = extreme of SAME-BLOCK rows strictly
    after it (growing frame over descending time), and B = last(sfx)
    over the growing frame up to t−W. A per-(keys, block) SENTINEL row
    at each block's start (value NULL, filtered back out afterwards)
    guarantees that as-of row always lands inside block b−1 even when
    the block has no real rows ≤ t−W — its sfx is then the whole block
    tail. Every frame grows, so Spark aggregates incrementally: O(n)
    per key regardless of W, plus one small distinct for the
    sentinels. min/max have no float-association caveat — the result
    is bit-identical to the frame form at any window length.

    ``leading=True`` computes the CLOSED leading window [t, t+W] by
    running the same machinery on negated time (closed [t, t+W] over
    ms == half-open (m−W', m] over m = −ms with W' = W+1 at integer
    millis).

    Ties are safe throughout: sfx and the cumulative frames are
    RANGE-based, so rows with equal timestamps (including a sentinel
    colliding with a real row at a block start) carry identical values
    and `last` over the as-of frame is deterministic. NULL values are
    skipped by min/max exactly as the frame form skips them, and
    least/greatest skip NULL operands, so an all-NULL window is NULL
    in both forms.

    Returns ``(df_with_internal_columns, result_column)`` — the df
    gains (and the caller should eventually drop via select) nothing
    visible: internal columns are dropped before return; sentinel rows
    are filtered back out. Callers wanting a named column: see
    ``windowed_min_long`` / ``windowed_max_long``."""
    ms = F.unix_millis(F.col(ts))
    fn = F.min if kind == "min" else F.max
    lg = F.least if kind == "min" else F.greatest
    ks = list(keys)
    W = window_ms + 1 if leading else window_ms
    msort = (-ms) if leading else ms
    vname, mname, flagname, bname = (
        _tmp("bxv"), _tmp("bxm"), _tmp("bxs"), _tmp("bxb"),
    )
    df2 = (
        df.withColumn(vname, value)
        .withColumn(mname, msort.cast("long"))
        .withColumn(flagname, F.lit(False))
    )
    # block id = floor(ms / W) in EXACT long arithmetic (r13, ADVICE
    # r12): pmod yields the non-negative remainder, so the numerator is
    # an exact multiple of W and integral `div` equals floor for ANY
    # long input — no double-rounding caveat at |ms| ≥ 2^53 (negated-
    # time `leading` mode included)
    df2 = df2.withColumn(
        bname, F.expr(f"({mname} - pmod({mname}, {W})) div {W}")
    )
    sent = (
        df2.select(*ks, (F.col(bname) - F.lit(1)).alias(bname))
        .distinct()
        .withColumn(mname, F.col(bname) * F.lit(W))
        .withColumn(flagname, F.lit(True))
    )
    un = df2.unionByName(sent, allowMissingColumns=True)
    negname, sfxname = _tmp("bxn"), _tmp("bxt")
    un = un.withColumn(negname, -F.col(mname))
    w_sfx = (
        Window.partitionBy(*ks, bname)
        .orderBy(negname)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    un = un.withColumn(sfxname, fn(F.col(vname)).over(w_sfx))
    w_pre = (
        Window.partitionBy(*ks, bname)
        .orderBy(mname)
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    w_asof = (
        Window.partitionBy(*ks)
        .orderBy(mname)
        .rangeBetween(Window.unboundedPreceding, -W)
    )
    rname = _tmp("bxr")
    un = un.withColumn(
        rname,
        lg(
            fn(F.col(vname)).over(w_pre),
            F.last(F.col(sfxname)).over(w_asof),
        ),
    )
    out = un.where(~F.col(flagname)).drop(
        vname, mname, flagname, bname, negname, sfxname
    )
    return out, F.col(rname)


def _windowed_extreme_long(
    df: DataFrame,
    out_col: str,
    value: Column,
    keys: Sequence[str],
    ts: str,
    window_s: float,
    kind: str,
) -> DataFrame:
    df2, col = block_extreme(df, value, kind, round(window_s * 1000), keys, ts)
    # name the result; the select drops the internal carrier column
    return df2.withColumn(out_col, col).select(*df.columns, out_col)


def windowed_min_long(
    df: DataFrame, out_col: str, value: Column,
    keys: Sequence[str], ts: str, window_s: float,
) -> DataFrame:
    """``windowed_min`` at O(n) for long/dense windows (two-block
    decomposition, bit-exact at any window length). df-in/df-out
    because the rewrite plants per-block sentinel rows; the result
    lands in ``out_col``."""
    return _windowed_extreme_long(df, out_col, value, keys, ts, window_s, "min")


def windowed_max_long(
    df: DataFrame, out_col: str, value: Column,
    keys: Sequence[str], ts: str, window_s: float,
) -> DataFrame:
    """``windowed_max`` at O(n) for long/dense windows — see
    ``windowed_min_long``."""
    return _windowed_extreme_long(df, out_col, value, keys, ts, window_s, "max")


def lag_value(col: Column, keys: Sequence[str], ts: str) -> Column:
    """Previous event's value (the reference's ``lag(x)``,
    core/.../aggregators/PreviousValue.scala with a 1-event window).
    Ordered by epoch millis like every sibling helper so Catalyst can
    fuse all of them into one Window stage."""
    return F.lag(col).over(
        Window.partitionBy(*keys).orderBy(F.unix_millis(F.col(ts)))
    )


def lag_time(col: Column, keys: Sequence[str], ts: str, window_s: float) -> Column:
    """CONTINUOUS value-as-of lookup: the last value at or before
    t − W. This is the simple utility form — the reference's
    ``lag(x, T)`` (PreviousValue.scala:42-73) is CONSUME-ONCE (each
    queued value emits at most once; an empty frame (t_prev−T, t−T]
    yields absent), which this helper deliberately does not reproduce:
    the reference-exact form lives in the pattern compiler's lag
    branch (compile/compiler.py) and the streaming kernel. Use this
    one when a stale re-emitted value is acceptable (dashboards,
    feature engineering), the compiler for pattern semantics."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.unix_millis(F.col(ts)))
        .rangeBetween(Window.unboundedPreceding, -round(window_s * 1000))
    )
    return F.last(col, ignorenulls=True).over(w)


def _closed_window_sum(
    expr: Column, keys: Sequence[str], ts: str, window_ms: int
) -> Column:
    """O(n) sum of ``expr`` over the CLOSED trailing window [t−w, t] as
    the difference of two GROWING frames (r12 — same rewrite as the
    pattern compiler's ``_prefix_closed_sum``; the sliding RANGE frame
    re-aggregates its buffer per output row, O(n × rows-in-window),
    measured 271× at 24 h windows in tools/bench_window_frames.py).
    Growing frames aggregate incrementally in Spark's
    UnboundedPrecedingWindowFunctionFrame. Closed-window complement at
    integer millis: ms < t−w ⟺ ms ≤ t−w−1, hence −(w+1). Truth-stat
    inputs are integer counts/millis, so the subtraction is bit-exact."""
    w_ord = Window.partitionBy(*keys).orderBy(F.unix_millis(F.col(ts)))
    wcum = w_ord.rangeBetween(Window.unboundedPreceding, 0)
    wbefore = w_ord.rangeBetween(Window.unboundedPreceding, -(window_ms + 1))
    return F.sum(expr).over(wcum) - F.coalesce(F.sum(expr).over(wbefore), F.lit(0))


def truth_stats(
    cond: Column,
    keys: Sequence[str],
    ts: str,
    window_s: float,
    prefix: str = "truth",
    form: str = "prefix",
) -> dict[str, Column]:
    """The reference's WindowStatistic: success/fail counts and durations
    within the trailing window (core/.../aggregators/WindowStatistic.scala).

    Durations attribute to each event its FULL inter-event delta (time
    since the key's previous event) — the engine-wide convention shared
    with the pattern compiler's `for T ≥ N sec` and pinned by the
    DuckDB oracles. The reference additionally rewrites the EARLIEST
    in-window event's delta to exactly the distance from the window
    start (WindowStatistic.scala's eviction "correction", which both
    clips long deltas and stretches short ones so total time saturates
    at the window) — a deliberate deviation documented in
    docs/SEMANTICS.md §12-13; with series-splitting on, a delta is
    bounded by eventsMaxGapMs, which bounds the difference.

    ``form="prefix"`` (default, r12) computes each sum in O(n) via the
    growing-frame difference (bit-exact for these integer inputs; the
    reference's own accumulator subtracts evicted elements the same
    way). ``form="frame"`` keeps the literal sliding RANGE frame —
    O(n × rows-in-window), for parity testing only.
    """
    window_ms = round(window_s * 1000)
    w_row = Window.partitionBy(*keys).orderBy(F.unix_millis(F.col(ts)))
    delta_ms = F.unix_millis(F.col(ts)) - F.lag(F.unix_millis(F.col(ts))).over(w_row)
    c = cond.cast("boolean")
    if form == "prefix":
        def _sum(expr: Column) -> Column:
            return _closed_window_sum(expr, keys, ts, window_ms)
    else:
        w = time_window(keys, ts, window_s)

        def _sum(expr: Column) -> Column:
            return F.sum(expr).over(w)
    return {
        f"{prefix}_count": _sum(F.when(c, 1).otherwise(0)),
        f"{prefix}_millis": _sum(F.when(c, delta_ms).otherwise(0)),
        f"{prefix}_fail_count": _sum(F.when(~c | c.isNull(), 1).otherwise(0)),
        f"{prefix}_fail_millis": _sum(F.when(~c | c.isNull(), delta_ms).otherwise(0)),
    }
