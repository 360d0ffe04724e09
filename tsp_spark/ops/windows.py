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

Cost note (r12): the ``windowed_*`` helpers use Spark's literal
sliding RANGE frame, which re-aggregates its buffer per output row —
O(rows-in-window) per row. That is fine for short windows and sparse
series, but a long window on a dense series pays the measured
200-300×-at-24 h cliff (docs/SCALE.md r12). For those, use the
pattern engine (`search_incidents` / `compile_pattern`, whose
``window_agg="auto"`` switches to O(n) prefix/two-block forms at
≥5 min windows) or ``truth_stats`` here, whose default
``form="prefix"`` already computes the O(n) growing-frame difference.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


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


def windowed_sum(col: Column, keys: Sequence[str], ts: str, window_s: float) -> Column:
    return F.sum(col).over(time_window(keys, ts, window_s, half_open=True))


def windowed_count(col: Column, keys: Sequence[str], ts: str, window_s: float) -> Column:
    return F.count(col).over(time_window(keys, ts, window_s, half_open=True))


def windowed_avg(col: Column, keys: Sequence[str], ts: str, window_s: float) -> Column:
    return F.avg(col).over(time_window(keys, ts, window_s, half_open=True))


def windowed_min(col: Column, keys: Sequence[str], ts: str, window_s: float) -> Column:
    return F.min(col).over(time_window(keys, ts, window_s, half_open=True))


def windowed_max(col: Column, keys: Sequence[str], ts: str, window_s: float) -> Column:
    return F.max(col).over(time_window(keys, ts, window_s, half_open=True))


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
