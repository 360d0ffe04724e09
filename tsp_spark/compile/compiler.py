"""Compile TSP pattern ASTs to declarative Spark DataFrame plans.

The same compiler shape as the reference's ASTPatternGenerator
(dsl/.../ASTPatternGenerator.scala:47-200) but emitting pyspark Column
expressions + window frames instead of state machines. Design (SURVEY §7):

* Every node except AndThen compiles to a ROW-LEVEL trilean boolean
  column (NULL = Fail). Pattern-level operators become window
  expressions over the keyed event-time ordering:
    - Timer "X for T":  cond AND ts >= current_run_start + T, where
      run_start = last boundary timestamp (change/gap/first row) —
      one cumulative window, no extra shuffle.
    - ForWithInterval "X for T <op> N times / T'": trailing-window truth
      stats + inclusive interval check (+ the reference's `exactly`
      full-window-elapsed rule).
    - Wait "wait(T, X)": leading-window max of X over [t, t+T].
    - Until "X until B": islands of (X and not B) — the reference
      desugars to and(Timer(X, [0,max]), assert(not B)).
* AndThen operates on interval tables: islandize both operands and
  sequence-join (ops/sequence.py).
* Trilean algebra (FunctionRegistry.scala:278-324): `or` tolerates a
  one-sided Fail (coalesce(a|b, a, b)); `and`/`xor`/comparisons/arith
  propagate Fail (SQL NULL semantics, with an explicit NULL for
  false-AND-NULL which SQL would otherwise resolve to false).

Window-function nesting: Spark forbids a window expression inside
another window's argument, so the compiler tracks `has_window` per
compiled fragment and materializes (withColumn) before wrapping in
another windowed op. All windows share the same partitionBy(keys)
ordering → Catalyst plans a single exchange + chained window stages.
"""

from __future__ import annotations

import itertools
from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tsp_spark.dsl import ast as A
from tsp_spark.compile.registry import (
    FunctionRegistry,
    DEFAULT_REGISTRY,
    numeric_result_type,
    spark_type_name,
)
from tsp_spark.ops.islands import islands
from tsp_spark.ops.sequence import and_then_exact, and_then_intervals

_counter = itertools.count()


def rowwise_reduce(name: str, filtered: Column) -> tuple[Column, str]:
    """Row-wise N-ary reducer over a pre-filtered double array
    (ReducePattern semantics, FunctionRegistry.scala:456-518):
    ``filtered`` holds the non-null elements passing the `_`-condition.

    An EMPTY reduction is NOT Fail — the reference left-folds from a
    typed initial value (ReducePattern.scala:60: sumOf/countOf → 0,
    minOf → Double.MaxValue, maxOf → Double.MinValue = −MaxValue,
    avgOf → 0/0 = NaN), so e.g. ``maxOf(a, b; _ > 50) < 70`` is TRUE
    when no argument passes the constraint."""
    n = F.size(filtered)
    dbl_max = 1.7976931348623157e308
    if name == "sumof":
        return F.aggregate(filtered, F.lit(0.0), lambda acc, x: acc + x), "float64"
    if name == "minof":
        # the reference folds Math.min, which PROPAGATES NaN
        # (FunctionRegistry.scala:473-485) — Spark's array_min instead
        # skips NaN under its NaN-greatest total order, silently
        # dropping a NULL-float argument from the fold (review-caught;
        # Math.max happens to agree with array_max, so only min needs
        # the explicit NaN gate)
        has_nan = F.exists(filtered, lambda x: F.isnan(x))
        return (
            F.coalesce(
                F.when(has_nan, F.lit(float("nan"))).otherwise(
                    F.array_min(filtered)
                ),
                F.lit(dbl_max),
            ),
            "float64",
        )
    if name == "maxof":
        return F.coalesce(F.array_max(filtered), F.lit(-dbl_max)), "float64"
    if name == "countof":
        return n.cast("long"), "int64"
    if name == "avgof":
        s = F.aggregate(filtered, F.lit(0.0), lambda acc, x: acc + x)
        return F.when(n > 0, s / n).otherwise(F.lit(float("nan"))), "float64"
    raise ValueError(f"Unknown reducer {name}")


# "auto" window_agg switches sum/avg to the O(n) prefix-difference form
# at windows this long or longer (count switches always — it subtracts
# exactly). Below it, the O(n × rows-in-window) sliding frame is cheap
# and bit-identical to the oracle's frame aggregation. 5 min: at 1 Hz
# that is a 300-row frame, where the measured crossover already favors
# the prefix form (tools/bench_window_frames.py — the 10 min frame leg
# ran 2.7× slower than the 2 hr prefix leg at equal row count).
PREFIX_WINDOW_AGG_MIN_MS = 300_000

# Rate-aware sibling gate (r13, VERDICT r12 Next #1): when the caller
# supplies a measured event rate (search_incidents' auto-probe), `auto`
# also switches once the ESTIMATED ROWS PER FRAME (window_ms × rate)
# reaches this, catching the high-rate/short-window regime the
# wall-clock floor misses (100 Hz × 2 min = 12,000-row frames). 1,000
# rows ≈ the measured point where the frame form's per-row re-scan
# clearly loses to the O(n) forms' fixed overhead
# (tools/bench_window_frames.py: the 300-row frame already crossed).
PREFIX_WINDOW_AGG_MIN_ROWS = 1_000


def _tmp(prefix: str) -> str:
    return f"__{prefix}_{next(_counter)}"


@dataclass
class Compiled:
    df: DataFrame
    col: Column
    dtype: str
    has_window: bool = False
    # Trilean "absent" tracking: where the reference pattern emits NO
    # IdxValue at an index (e.g. consume-once lag), the index is
    # invisible downstream — runs merge across it (SegmentizerPattern
    # merges equal values regardless of idx adjacency), unlike Fail
    # which breaks a run. None = defined everywhere. Combinators AND
    # presents (Couple zips by idx intersection).
    present: Column | None = None


_INT_CAST_BITS = {"int8": 8, "int16": 16, "int32": 32, "int64": 64}


def _jvm_cast(col: Column, src_dtype: str | None, dst_dtype: str) -> Column:
    """Reference cast semantics for `x as <type>`: the generator wraps
    the inner in MapPattern(decodeToInt/...) (ASTPatternGenerator.scala
    :181-189), whose Double→Int decoder is Scala's `d.toInt`
    (BasicDecoders.scala:89-91) — i.e. JVM numeric conversion: NaN → 0,
    float sources SATURATE (then truncate toward zero), int sources
    NARROW by low-bits wrap. Spark's ANSI cast instead throws on NaN
    and overflow, so integer targets are rebuilt from when/clamp/pmod.
    (Float saturation uses the largest double below 2^63 for int64 —
    exact for every representable input; string/bool/float targets keep
    the plain cast, whose failure modes match parseInt/toString.)"""
    bits = _INT_CAST_BITS.get(dst_dtype)
    src = src_dtype or "float64"
    if bits is None or src in ("string", "boolean"):
        target = spark_type_name(dst_dtype) or dst_dtype
        if src == "string" and dst_dtype != "string":
            # unparseable string → Result.fail in the reference
            # (BasicDecoders parse failure), i.e. NULL here — and that
            # must hold under the CALLER's session even with Spark 4's
            # ANSI default, where a plain cast would THROW on the first
            # bad row (r14, same library-vs-session class as _jvm_div)
            return col.try_cast(target)
        return col.cast(target)
    if src in ("float32", "float64"):
        z = F.when(F.isnan(col), F.lit(0.0)).otherwise(col)
        if bits == 64:
            # saturation zone first: the clamp bound itself must be a
            # representable double, and the largest double < 2^63 is
            # 1023 below Long.MAX — (long)d yields Long.MAX exactly
            # for any d ≥ 2^63 (review-caught, matches _jvm_int)
            return (
                F.when(
                    z >= F.lit(9223372036854775808.0),
                    F.lit(9223372036854775807).cast("bigint"),
                )
                .when(
                    z <= F.lit(-9223372036854775808.0),
                    F.lit(-9223372036854775808).cast("bigint"),
                )
                .otherwise(z.cast("bigint"))
            )
        # NULL guard around the clamp (r14 §20, probe-caught):
        # greatest/least SKIP null operands, so a NULL reaching the
        # int32 clamp came back as the clamp BOUND (-2147483648) — and
        # as 0 after int8/16 narrowing — instead of staying NULL
        # (Result.fail, the per-row kernel's None). The int64 branch is
        # immune: its when-chain falls through to a null-propagating
        # cast.
        clamped = F.when(
            z.isNull(), F.lit(None).cast("double")
        ).otherwise(
            F.least(F.greatest(z, F.lit(-2147483648.0)), F.lit(2147483647.0))
        )
        col = clamped.cast("int")
        if bits == 32:
            return col
        # int8/int16: (int)d narrowed — low-bits wrap of the saturated int
        return _narrow_wrap(col, bits, dst_dtype)
    # integer source → integer target: JVM narrowing (low bits, signed)
    if bits == 64:
        return col.cast("bigint")
    return _narrow_wrap(col, bits, dst_dtype)


def _narrow_wrap(col: Column, bits: int, dst_dtype: str) -> Column:
    """Signed low-bits narrowing, overflow-free: pmod keeps every
    intermediate inside [0, 2^bits) (adding half BEFORE the pmod would
    overflow ANSI bigint at Long.MAX)."""
    half, span = 1 << (bits - 1), 1 << bits
    p = F.pmod(col.cast("bigint"), F.lit(span))
    return (
        F.when(p >= F.lit(half), p - F.lit(span)).otherwise(p)
    ).cast(spark_type_name(dst_dtype))


def _and_presents(presents: Sequence[Column | None]) -> Column | None:
    ps = [p for p in presents if p is not None]
    if not ps:
        return None
    out = ps[0]
    for p in ps[1:]:
        out = out & p
    return out


class PatternCompiler:
    """Compiles one pattern AST against a keyed event DataFrame.

    Parameters mirror the reference job config: ``keys`` =
    partitionFields, ``ts`` = datetimeField, ``max_gap_ms`` =
    eventsMaxGapMs (gaps split series and reset pattern state).
    """

    def __init__(
        self,
        keys: Sequence[str],
        ts: str,
        fields_types: dict[str, str] | None = None,
        max_gap_ms: int | None = 60_000,
        registry: FunctionRegistry = DEFAULT_REGISTRY,
        andthen_mode: str = "fused",
        window_agg: str = "auto",
        event_rate_hz: float | None = None,
    ):
        if andthen_mode not in ("fused", "exact"):
            raise ValueError(f"andthen_mode must be 'fused' or 'exact', got {andthen_mode!r}")
        if window_agg not in ("auto", "frame", "prefix"):
            raise ValueError(
                f"window_agg must be 'auto', 'frame' or 'prefix', got {window_agg!r}"
            )
        self.keys = list(keys)
        self.ts = ts
        self.fields = fields_types or {}
        self.max_gap_ms = max_gap_ms
        self.registry = registry
        self.andthen_mode = andthen_mode
        self.window_agg = window_agg
        # measured hot-key event rate (rows/second), when a caller has
        # one (search_incidents feeds the auto-probe's measurement in);
        # lets `auto` switch to the O(n) window forms by estimated
        # ROWS-IN-WINDOW, not wall-clock window length — see
        # _long_window (r13, VERDICT r12 Next #1)
        self.event_rate_hz = event_rate_hz
        # per-aggregate form decisions (r14, VERDICT r13 Next #8):
        # which physical form each windowed aggregate actually got —
        # "frame" (literal sliding RANGE), "prefix" (global
        # prefix-difference, integer-exact sites only since r14), or
        # "block" (two-piece block-anchored). search_incidents copies
        # this into its decision sink and the service exposes it per
        # job, so a wrong-form suspicion is operator-visible instead
        # of a plan autopsy.
        self.window_forms: list[dict] = []

    def _note_window_form(self, kind: str, window_ms: int, form: str) -> None:
        self.window_forms.append(
            {"kind": kind, "window_ms": window_ms, "form": form}
        )

    def _long_window(self, window_ms: int) -> bool:
        """Should ``window_agg="auto"`` route this window to the O(n)
        forms (prefix-difference / two-block)? The frame form's cost is
        O(rows-in-window) PER ROW, so the real gate is estimated frame
        size, not wall-clock width: a 100 Hz series under a 2-min
        window holds 12,000 rows/frame — the exact cliff the long-form
        rewrites kill — while a 1/min series under the same window
        holds 2. Two triggers, either sufficient:

        * with a MEASURED rate (the auto-shard probe's hot-key
          rows/span — the HOTTEST key, i.e. the worst frame), the
          estimated rows-per-frame decides in BOTH directions:
          window_ms × event_rate ≥ PREFIX_WINDOW_AGG_MIN_ROWS routes
          to the O(n) forms, below it the frame form wins. r14: the
          downgrade direction matters too — a one-event-per-10-hours
          key under a 6 hr window holds < 1 row per frame, where the
          O(n) forms' fixed pipeline (sentinel distinct + 3 window
          specs + ~17 codegen spans) measured 2.7× the frame form's
          wall and ~40× its executor time at the sf0.1 gate scale
          (`avg(value, 6 hr)`: frame 0.70 s / 0.40 s exec-run vs
          block 1.89 s / 17.9 s exec-run);
        * with NO measured rate, the conservative wall-clock floor:
          window ≥ PREFIX_WINDOW_AGG_MIN_MS (5 min) — at 100 TB an
          unknown-rate source must not risk the O(n·w) cliff, so
          unknown rates keep the O(n) forms past this width."""
        if self.event_rate_hz is not None:
            return (
                window_ms * self.event_rate_hz
                >= PREFIX_WINDOW_AGG_MIN_ROWS * 1000.0
            )
        return window_ms >= PREFIX_WINDOW_AGG_MIN_MS

    # ------------------------------------------------------------------
    # window helpers (all share partitionBy(keys[, series]) → one exchange)
    # ------------------------------------------------------------------
    SERIES_COL = "__series_seq"

    def with_series(self, df: DataFrame) -> DataFrame:
        """Add the gap-delimited sub-series id: the reference splits a
        key's stream wherever ts(next) − ts(prev) > eventsMaxGapMs and
        resets ALL pattern state (PatternProcessor.scala:33-56), so
        every window/lag must be confined to its sub-series, not the
        whole key. Same window spec as every other operator → no extra
        shuffle."""
        if self.SERIES_COL in df.columns:
            return df
        if self.max_gap_ms is None:
            # no gap splitting: one series per key. The column must
            # still exist — the lag branches use its ABSENCE to detect
            # probe compiles (raw frames) and skip the Segmentizer
            # bridge, so a None max_gap evaluation without it would
            # silently lose bridging (review-caught)
            return df.withColumn(self.SERIES_COL, F.lit(0).cast("long"))
        w = Window.partitionBy(*self.keys).orderBy(self.ts)
        ms = F.unix_millis(F.col(self.ts))
        brk = (ms - F.lag(ms).over(w) > self.max_gap_ms).cast("int")
        return df.withColumn(
            self.SERIES_COL,
            F.sum(F.coalesce(brk, F.lit(0))).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )

    def _series_keys(self) -> list[str]:
        return [*self.keys, self.SERIES_COL] if self.max_gap_ms is not None else self.keys

    def _w_order(self) -> Window:
        return Window.partitionBy(*self._series_keys()).orderBy(self.ts)

    def _w_cum(self) -> Window:
        return self._w_order().rowsBetween(Window.unboundedPreceding, 0)

    # r14 (guide §2.4): every RANGE window sorts by epoch-millis. When
    # each window spec inlines its own `unix_millis(ts)` expression,
    # Catalyst extracts a FRESH `_wN` sort alias per Window node, so
    # adjacent range windows get distinct specs — no CollapseWindow
    # merge, and a separate 100%-redundant Sort per node (measured: 3
    # Sorts + 3 Window nodes for the flagship's three range aggregates).
    # Materializing ONE shared ms column makes the specs attribute-equal:
    # independent range windows collapse into one node and the extra
    # Sorts vanish (child ordering already satisfies).
    MS_COL = "__ms_ord"

    def _ensure_ms(self, df: DataFrame) -> DataFrame:
        if self.MS_COL in df.columns:
            return df
        return df.withColumn(self.MS_COL, F.unix_millis(F.col(self.ts)))

    def _w_range(self, window_ms: int, leading: bool = False) -> Window:
        # order by epoch millis (long) — rangeBetween requires integral
        # bounds; millis keep sub-second resolution. Callers must have
        # run the frame through _ensure_ms.
        w = Window.partitionBy(*self._series_keys()).orderBy(
            F.col(self.MS_COL)
        )
        return w.rangeBetween(0, window_ms) if leading else w.rangeBetween(-window_ms, 0)

    def _ms(self) -> Column:
        return F.unix_millis(F.col(self.ts))

    def _segmentizer_bridge(self, ename: str) -> tuple[Column, Column]:
        """Shared Segmentizer semantics for both lag forms
        (Patterns.scala:123 wraps PreviousValue in SegmentizerPattern):
        consecutive EQUAL-valued emissions merge into one idx span, so
        an absent row sandwiched between two equal emitted values
        INHERITS that value. Spark's `=` already treats NaN = NaN as
        TRUE, matching the Segmentizer's `.equals` (boxed Double) merge
        rule — NaN emissions bridge like any other value (r6c,
        oracle-caught via nested lags; unobservable for a single lag
        because the bridged row's condition equals its neighbors').
        present = emitted OR bridged; the INNER's presence must NOT be
        ANDed in — a bridge legitimately covers rows where the inner
        was absent (the span runs between adjacent emissions regardless
        of why the interior rows didn't emit) — r6c, oracle-fuzz-caught.
        ``ename`` must be a MATERIALIZED emission column (no
        window-in-window). Returns (value col, present mask).

        Frame-shape note (r11, a measured per-key scale cliff): the
        nearest FOLLOWING emission must NOT be
        ``first(...).over(rowsBetween(1, unboundedFollowing))`` —
        Spark's shrinking frame (moving lower bound, unbounded upper)
        cannot decrement an aggregate, so WindowExec re-scans from the
        current row to the partition end for EVERY row: O(n²) per
        (key, series). Measured: ``lag(x, 5 sec) < 0.5`` on 2M uniform
        rows took 109 s, and halving group size (sharding) HALVED
        per-row cost — the quadratic signature. The equivalent GROWING
        frame over a DESCENDING order (``last(...).over(orderBy(desc)
        .rowsBetween(unboundedPreceding, -1))``) is incremental —
        O(n) plus one extra local sort: 109 s → 4 s."""
        wp = (
            Window.partitionBy(*self._series_keys())
            .orderBy(self.ts)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        wn = (
            Window.partitionBy(*self._series_keys())
            .orderBy(F.col(self.ts).desc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        prev_v = F.last(F.col(ename), ignorenulls=True).over(wp)
        next_v = F.last(F.col(ename), ignorenulls=True).over(wn)
        fill_ok = prev_v == next_v
        col = F.coalesce(F.col(ename), F.when(fill_ok, prev_v))
        present = F.col(ename).isNotNull() | F.coalesce(
            fill_ok, F.lit(False)
        )
        return col, present

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------
    def compile_intervals(self, df: DataFrame, node: A.Node) -> DataFrame:
        """Full pattern → interval table (keys…, from_ts, to_ts, n_rows,
        start_idx, end_idx)."""
        df = self.with_series(df)
        if isinstance(node, A.AndThen):
            if self.andthen_mode == "exact":
                return self._compile_andthen_exact(df, node)
            left = self.compile_intervals(df, node.left)
            right = self._islandize(df, node.right)
            # sequence-join within a gap-delimited sub-series only: the
            # reference resets ALL pattern state at a series split
            # (PatternProcessor.scala:33-56), so an A-run ending just
            # before a gap must NOT match a B-run starting right after it
            # even though their raw indices are adjacent.
            return and_then_intervals(left, right, self._series_keys())
        return self._islandize(df, node)

    def compile_intervals_multi(
        self, df: DataFrame, tagged_nodes: list[tuple[int, A.Node]]
    ) -> tuple[DataFrame | None, list[int]]:
        """Cross-pattern common-subexpression sharing (r13, VERDICT r12
        Next #5; SURVEY §4.1 names it the one cheap optimizer win the
        reference lacks too): compile MANY patterns' interval tables
        out of ONE shared scan + keyed exchange instead of N
        independent plan branches.

        Per-pattern ``compile_intervals`` branches cannot share work:
        Catalyst prunes each branch to its own columns, so the
        canonicalized Exchange subtrees differ and ReuseExchange never
        fires — a 3-pattern job plans 3 scans + 3 keyed exchanges over
        the SAME source (measured; see search_incidents). Here instead:

        1. every pattern's trilean boolean compiles onto one THREADED
           frame (pattern i+1 compiles over pattern i's frame — extra
           columns are invisible to it), so all window expressions
           share one partitioning and Catalyst fuses them into one
           exchange + chained Window stages;
        2. per-slot island ids (the RLE boundaries of `_islandize`,
           same null-safe change/gap/first-row rule) are more window
           columns on that frame;
        3. ONE map-side ``inline`` explodes (slot, cond, island)
           triples — P copies of the narrow stack columns, no shuffle,
           immediately filtered to cond=true rows — and ONE groupBy
           collapses every pattern's runs together (partial agg, runs
           are ~0.1% of rows);
        4. plain boolean patterns come back as a single BULK table
           tagged ``__tag`` (one plan branch for all of them — a
           per-pattern ``where(slot=i)`` would push below the
           aggregate and re-diverge the subtrees); fused ``andThen``
           chains join per-slot views of the runs table, which is
           persisted first (RLE-tiny; the raw frame is NOT barriered —
           that was measured 36% slower, see search_incidents).

        Returns ``(bulk, fallback_tags)``: ``bulk`` has columns
        (__tag, *series_keys, from_ts, to_ts, n_rows, start_idx,
        end_idx) covering every stacked node (None if nothing
        stacked); ``fallback_tags`` lists nodes the caller must send
        through the per-pattern path — currently EMPTY for every
        grammar shape: present-producing compiles (consume-once lag)
        stack via per-slot islandization of PRESENT rows against the
        last present state (the Segmentizer merge-across-absent rule
        with the gap term off, mirroring ``_islandize``), and
        exact-mode ``andThen`` stacks as keep=None slot queues
        (cond_value carried through the shared groupBy) feeding the
        same two-queue merge as ``_compile_andthen_exact``. The
        mechanism stays for future non-stackable node kinds."""
        df = self.with_series(df)
        cur = df
        # per slot: (cond column name, present column name | None)
        slot_conds: list[tuple[str, str | None]] = []

        def alloc(c: Compiled) -> int:
            nonlocal cur
            name = _tmp("slot")
            cur = c.df.withColumn(name, c.col)
            pname = None
            if c.present is not None:
                pname = _tmp("slotp")
                cur = cur.withColumn(pname, c.present)
            slot_conds.append((name, pname))
            return len(slot_conds) - 1

        # per tag: ("leaf", slot) | ("seq", [slots...]) |
        # ("xseq", [slots...], tree) for exact-mode andThen (keep=None
        # operand queues + the two-queue merge, associativity preserved)
        plans: dict[int, tuple] = {}
        fallback: list[int] = []
        for tag, node in tagged_nodes:
            if isinstance(node, A.AndThen):
                if self.andthen_mode == "exact":
                    # mirror _compile_andthen_exact: leaves in shape
                    # order, tree as nested 2-tuples over leaf indices
                    leaves: list[A.Node] = []

                    def shape(n):
                        if isinstance(n, A.AndThen):
                            return (shape(n.left), shape(n.right))
                        leaves.append(n)
                        return len(leaves) - 1

                    tree = shape(node)
                    plans[tag] = (
                        "xseq",
                        [alloc(self.compile_bool(cur, ln)) for ln in leaves],
                        tree,
                    )
                    continue
                # flatten the LEFT spine exactly as compile_intervals
                # recurses (right operands may themselves be AndThen —
                # compile_bool handles those via _compile_andthen_bool)
                ops: list[A.Node] = []
                n: A.Node = node
                while isinstance(n, A.AndThen):
                    ops.append(n.right)
                    n = n.left
                ops.append(n)
                ops.reverse()
                plans[tag] = (
                    "seq",
                    [alloc(self.compile_bool(cur, opn)) for opn in ops],
                )
            else:
                plans[tag] = ("leaf", alloc(self.compile_bool(cur, node)))
        if not plans:
            return None, fallback

        # island ids per slot. Present-FREE slots use the
        # _islandize/with_islands boundary rule (null-safe change |
        # first row | gap > max_gap; the gap term is defense in depth
        # under series partitioning). PRESENT slots (r13b: consume-once
        # lag et al.) mirror _islandize's present path — islandize the
        # PRESENT rows only, with NO gap rule (absence may stretch two
        # adjacent present rows past max_gap, which must not fake a
        # series split; the series id in the partition keys already
        # encodes real splits): a boundary is a present row whose
        # trilean state differs from the LAST present state (absent
        # rows are invisible, so equal-valued runs merge across them —
        # the Segmentizer semantics).
        w_ord = self._w_order()
        w_cum = self._w_cum()
        ms = self._ms()
        gap_b = F.lag(F.col(self.ts)).over(w_ord).isNull()
        if self.max_gap_ms is not None:
            gap_b = gap_b | (ms - F.lag(ms).over(w_ord) > F.lit(self.max_gap_ms))
        w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)

        # r14 (guide §1.2/§2.4): the per-slot loop used to chain ONE
        # withColumn per island id, interleaving a lag Window node and
        # a cumsum Window node per slot — 2 Window passes (each
        # re-buffering the whole frame) times the slot count, with the
        # gap lags re-inlined (and re-evaluated) in every slot. Batch
        # instead: pass 1 materializes every slot's lag/last window
        # value (plus the gap boundary ONCE) in a single withColumns —
        # Catalyst extracts them into ONE Window node — and pass 2
        # computes every island cumsum in a second single node. 7-slot
        # flagship: 16 Window nodes → 2.
        def _state(cname: str, pname: str) -> Column:
            # trilean state on present rows (true/false/Fail as 1/0/2),
            # NULL elsewhere so last(ignorenulls) skips absent rows
            cnd = F.col(cname)
            return F.when(
                F.col(pname),
                F.when(cnd, 1).when(~cnd, 0).otherwise(2),
            )

        gap_name = _tmp("gapb")
        lag_cols: dict[str, Column] = {gap_name: gap_b}
        slot_lag: list[str] = []
        for cname, pname in slot_conds:
            nm = _tmp("slg")
            if pname is None:
                lag_cols[nm] = F.lag(F.col(cname)).over(w_ord)
            else:
                lag_cols[nm] = F.last(
                    _state(cname, pname), ignorenulls=True
                ).over(w_prev)
            slot_lag.append(nm)
        cur = cur.withColumns(lag_cols)

        isl_cols: dict[str, Column] = {}
        for (cname, pname), nm in zip(slot_conds, slot_lag):
            cnd = F.col(cname)
            if pname is None:
                boundary = ~cnd.eqNullSafe(F.col(nm)) | F.col(gap_name)
            else:
                boundary = F.col(pname) & (
                    F.col(nm).isNull() | (_state(cname, pname) != F.col(nm))
                )
            isl_cols[_tmp("sisl")] = F.sum(boundary.cast("int")).over(w_cum)
        cur = cur.withColumns(isl_cols)
        isl_names: list[str] = list(isl_cols.keys())
        if "__idx" not in cur.columns:
            # r14 (guide §2.4): index per SERIES, not per key — same
            # row space for every within-series idx comparison (runs
            # never span a series; and_then adjacency joins on the
            # series keys), but the row_number now shares the island
            # windows' (keys, series, ts) sort instead of forcing a
            # sort down to (keys, ts) and back (2 Sorts of the full
            # frame in the stacked chain).
            w_keys = Window.partitionBy(*self._series_keys()).orderBy(self.ts)
            cur = cur.withColumn("__idx", F.row_number().over(w_keys))
        triples = [
            F.struct(
                F.lit(i).alias("__slot"),
                F.col(cname).alias("__scond"),
                (F.lit(True) if pname is None else F.col(pname)).alias(
                    "__spres"
                ),
                F.col(iname).alias("__sisl"),
            )
            for i, ((cname, pname), iname) in enumerate(
                zip(slot_conds, isl_names)
            )
        ]
        stacked = cur.select(
            *self._series_keys(), self.ts, "__idx",
            F.inline(F.array(*triples)),
        )
        # exact-mode chains consume the FULL RLE queue (keep=None —
        # true/false/Fail runs all present, cond_value carried), so
        # when any exist the cond filter moves ABOVE the aggregation;
        # keep=True consumers re-filter on cond_value below. Runs are
        # RLE-small either way.
        has_xseq = any(p[0] == "xseq" for p in plans.values())
        pre = stacked.where(F.col("__spres").eqNullSafe(F.lit(True)))
        if not has_xseq:
            pre = pre.where(F.col("__scond").eqNullSafe(F.lit(True)))
        aggs = [
            F.min(self.ts).alias("from_ts"),
            F.max(self.ts).alias("to_ts"),
            F.count(F.lit(1)).alias("n_rows"),
            F.min("__idx").alias("start_idx"),
            F.max("__idx").alias("end_idx"),
        ]
        if has_xseq:
            # constant within a run (the island id changes whenever the
            # trilean state does), so first() is deterministic
            aggs.append(F.first("__scond").alias("cond_value"))
        runs = pre.groupBy(*self._series_keys(), "__slot", "__sisl").agg(*aggs)

        def keep_true(t: DataFrame) -> DataFrame:
            if has_xseq:
                return t.where(
                    F.col("cond_value").eqNullSafe(F.lit(True))
                ).drop("cond_value")
            return t

        seq_plans = [p for p in plans.values() if p[0] in ("seq", "xseq")]
        if seq_plans:
            # andThen operand views each filter runs by slot, and that
            # filter pushes below the aggregate (slot is a group key),
            # re-diverging the subtrees — materialize the RLE table so
            # the scan/window work runs once and every view reads it.
            # This is NOT the measured-slower full-frame barrier: runs
            # is one row per run (~0.1% of input). localCheckpoint, not
            # persist(): CacheManager holds a STRONG reference to every
            # persisted plan until explicit unpersist, so a long-lived
            # service calling multi-andThen jobs would leak cached
            # tables unboundedly (and CacheManager's canonical-plan
            # matching silently serves one job's runs to a later
            # identical job — correct for static sources but a
            # benchmarking trap); a localCheckpoint is RDD-scoped and
            # the ContextCleaner reclaims it when the plan is GC'd —
            # the same trade neardup_clusters makes for its edge sets.
            # Caveat (shared with neardup_clusters): localCheckpoint
            # truncates lineage, so on a real cluster a lost executor
            # cannot recompute the truncated partitions — the job
            # fails and retries from the source instead of recovering
            # partition-by-partition. Acceptable for an interactive/
            # batch job (the runs table is tiny and rebuilds in one
            # pass); a deployment with aggressive preemption can trade
            # back via spark.sparkContext.setCheckpointDir + reliable
            # checkpointing at the cost of a DFS write.
            runs = runs.localCheckpoint(eager=False)

        def slot_table(i: int) -> DataFrame:
            return runs.where(F.col("__slot") == i).drop("__slot", "__sisl")

        leaf_items = [(tag, p[1]) for tag, p in plans.items() if p[0] == "leaf"]
        parts: list[DataFrame] = []
        if leaf_items:
            tag_col: Column = F.lit(None).cast("int")
            for tag, slot in leaf_items:
                tag_col = F.when(F.col("__slot") == slot, F.lit(tag)).otherwise(tag_col)
            parts.append(
                keep_true(
                    runs.where(
                        F.col("__slot").isin([s for _, s in leaf_items])
                    )
                )
                .withColumn("__tag", tag_col)
                .drop("__slot", "__sisl")
            )
        for tag, p in plans.items():
            if p[0] == "seq":
                iv = keep_true(slot_table(p[1][0]))
                for j in p[1][1:]:
                    iv = and_then_intervals(
                        iv, keep_true(slot_table(j)), self._series_keys()
                    )
                parts.append(iv.withColumn("__tag", F.lit(tag)))
            elif p[0] == "xseq":
                iv = and_then_exact(
                    cur, [slot_table(j) for j in p[1]], p[2],
                    self._series_keys(), self.ts,
                )
                parts.append(iv.withColumn("__tag", F.lit(tag)))
        bulk = parts[0]
        for extra in parts[1:]:
            bulk = bulk.unionByName(extra)
        return bulk, fallback

    def _compile_andthen_exact(self, df: DataFrame, node: A.AndThen) -> DataFrame:
        """Reference-exact ``andThen`` chain: each operand islandizes
        with keep=None (its full RLE queue — true/false/NULL runs, the
        ``enqueueWithUniting`` entries of an assert-mapped boolean),
        then ops.sequence.and_then_exact runs the two-queue
        union+rewind merge (AndThenPattern.scala:42-94) per
        (key, series) preserving the AST's associativity. Verified
        against tools/ref_oracle.py by fuzz on overlap-dense series
        (tests/test_fuzz_oracle.py); operands whose reference queue
        granularity is not a plain boolean RLE (a Timer's per-window
        emissions, a consume-once lag) may still deviate on edges —
        the fused default stays golden-pinned for those."""
        leaves: list[A.Node] = []

        def shape(n):
            if isinstance(n, A.AndThen):
                return (shape(n.left), shape(n.right))
            leaves.append(n)
            return len(leaves) - 1

        tree = shape(node)
        tables = [self._islandize(df, n, keep=None) for n in leaves]
        # per-series idx (r14): see compile_intervals_multi — identical
        # within-series comparisons, one shared sort order
        w = Window.partitionBy(*self._series_keys()).orderBy(self.ts)
        indexed = df.withColumn("__idx", F.row_number().over(w))
        return and_then_exact(
            indexed, tables, tree, self._series_keys(), self.ts
        )

    def _islandize(
        self, df: DataFrame, node: A.Node, keep: bool | None = True
    ) -> DataFrame:
        """Islandize a boolean pattern; the result carries the series id
        (consumers select the columns they need, AndThen joins on it).
        ``keep=None`` (the exact andThen mode) returns ALL runs with a
        ``cond_value`` column — the operand's full PQueue entry list."""
        c = self.compile_bool(df, node)
        c = self._maybe_materialize(c)
        # Raw per-SERIES idx FIRST, shared by every operand of a
        # sequence — AndThenPattern adjacency counts raw input indices,
        # so both sides must index the same row space even when one
        # side drops absent rows below. Per-series (r14): runs never
        # span a series and adjacency joins carry the series keys, so
        # within-series idx arithmetic is offset-invariant — and the
        # row_number shares the (keys, series, ts) sort every other
        # window in the chain already established.
        w = Window.partitionBy(*self._series_keys()).orderBy(self.ts)
        d = c.df.withColumn("__idx", F.row_number().over(w))
        if c.present is None:
            return islands(
                d, self._series_keys(), self.ts, c.col, self.max_gap_ms,
                keep=keep, with_idx=True,
            )
        # Absent rows (the pattern emitted no IdxValue there, e.g. the
        # consume-once lag) are invisible downstream: equal-valued runs
        # merge across them (SegmentizerPattern.scala). Drop them, then
        # islandize splitting on the precomputed series id only —
        # absence may stretch two adjacent present rows past max_gap,
        # which must NOT fake a series split.
        return islands(
            d.where(c.present), self._series_keys(), self.ts, c.col, None,
            keep=keep, with_idx=True,
        )

    def compile_bool(self, df: DataFrame, node: A.Node) -> Compiled:
        """Pattern → row-level trilean boolean column."""
        c = self._compile(df, node)
        if c.dtype != "boolean":
            # non-boolean top level (e.g. bare sensor `for` …): nonzero =
            # true. Keep the present mask — dropping it would turn a
            # lag's absent rows into Fail run-breaks instead of
            # invisible indices (review-caught; the Assert branch
            # already forwards it)
            c = Compiled(
                c.df, c.col.cast("boolean"), "boolean", c.has_window,
                c.present,
            )
        return c

    # ------------------------------------------------------------------
    # internals
    # ------------------------------------------------------------------
    def _materialize(self, c: Compiled, prefix: str = "m") -> Compiled:
        name = _tmp(prefix)
        df = c.df.withColumn(name, c.col)
        present = None
        if c.present is not None:
            pname = _tmp(prefix + "p")
            df = df.withColumn(pname, c.present)
            present = F.col(pname)
        return Compiled(df, F.col(name), c.dtype, False, present)

    def _maybe_materialize(self, c: Compiled) -> Compiled:
        return self._materialize(c) if c.has_window else c

    def _compile(self, df: DataFrame, node: A.Node, underscore: Column | None = None) -> Compiled:
        if isinstance(node, A.Constant):
            v = node.value
            dtype = (
                "boolean"
                if isinstance(v, bool)
                else "int64"
                if isinstance(v, int)
                else "float64"
                if isinstance(v, float)
                else "string"
            )
            return Compiled(df, F.lit(v), dtype)

        if isinstance(node, A.Identifier):
            if node.name == "_":
                if underscore is None:
                    raise ValueError("'_' used outside a reducer constraint")
                return Compiled(df, underscore, "float64")
            dtype = node.dtype or self.fields.get(node.name, "float64")
            col = F.col(node.name)
            sname = spark_type_name(dtype)
            if sname is not None:
                col = col.cast(sname)
            if dtype in ("float32", "float64"):
                # BasicDecoders.scala:17-30: a NULL/bad numeric decodes to
                # Double.NaN (not Fail) — and NaN then follows Scala's
                # total-order comparisons, which Spark's native NaN
                # semantics (NaN greatest, NaN = NaN) reproduce exactly.
                col = F.coalesce(col, F.lit(float("nan")).cast(sname))
            elif dtype == "string":
                # decodeToString: null → "[NULL]" (AnyDecodersInstances)
                col = F.coalesce(col, F.lit("[NULL]"))
            return Compiled(df, col, dtype)

        if isinstance(node, A.Cast):
            c = self._compile(df, node.inner, underscore)
            col = _jvm_cast(c.col, c.dtype, node.dtype)
            return Compiled(
                c.df, col, node.dtype, c.has_window, c.present
            )

        if isinstance(node, A.Assert):
            c = self._compile(df, node.inner, underscore)
            return Compiled(c.df, c.col.cast("boolean"), "boolean", c.has_window, c.present)

        if isinstance(node, A.FunctionCall):
            return self._compile_function(df, node, underscore)

        if isinstance(node, A.ReducerCall):
            return self._compile_reducer(df, node, underscore)

        if isinstance(node, A.AggregateCall):
            return self._compile_aggregate(df, node, underscore)

        if isinstance(node, A.Timer):
            return self._compile_timer(df, node)

        if isinstance(node, A.ForWithInterval):
            return self._compile_for_interval(df, node)

        if isinstance(node, A.Wait):
            return self._compile_wait(df, node)

        if isinstance(node, A.Until):
            return self._compile_until(df, node)

        if isinstance(node, A.AndThen):
            return self._compile_andthen_bool(df, node)

        raise ValueError(f"Unhandled AST node: {node!r}")

    def _compile_function(self, df: DataFrame, node: A.FunctionCall, underscore) -> Compiled:
        compiled: list[Compiled] = []
        cur = df
        for arg in node.args:
            c = self._compile(cur, arg, underscore)
            # r14 (guide §1.2 per-task work): builders reference an
            # operand Column several times (the NULL/NaN comparison
            # lattice inlines it 3-4×), and an inlined WINDOW
            # expression is COMPUTED once per copy — the bench plan
            # showed one Window node evaluating the identical 30-s
            # RANGE avg three times. Project window operands to a
            # concrete column first so they evaluate exactly once.
            c = self._maybe_materialize(c)
            cur = c.df
            compiled.append(c)
        cols = [c.col for c in compiled]
        dtypes = [c.dtype for c in compiled]
        has_window = any(c.has_window for c in compiled)
        col, dtype = self.registry.build(node.name, cols, dtypes)
        present = _and_presents([c.present for c in compiled])
        return Compiled(cur, col, dtype, has_window, present)

    def _compile_reducer(self, df: DataFrame, node: A.ReducerCall, underscore) -> Compiled:
        compiled: list[Compiled] = []
        cur = df
        for arg in node.args:
            c = self._compile(cur, arg, underscore)
            c = self._maybe_materialize(c)  # same single-eval rule as above
            cur = c.df
            compiled.append(c)
        has_window = any(c.has_window for c in compiled)
        # try_cast, not cast: a non-numeric string argument must become
        # NULL and drop from the fold (ReducePattern drops elements the
        # decoder can't produce); under ANSI mode (Spark 4 default) a
        # plain cast would throw CAST_INVALID_INPUT and kill the task.
        arr = F.array(*[c.col.try_cast("double") for c in compiled])

        if node.cond is not None:
            def cond_fn(x: Column) -> Column:
                # compile the underscore constraint against element x;
                # constraint is a pure expression → df unchanged
                cc = self._compile(cur, node.cond, underscore=x)
                return cc.col.cast("boolean")

            filtered = F.filter(arr, lambda x: x.isNotNull() & cond_fn(x))
        else:
            filtered = F.filter(arr, lambda x: x.isNotNull())

        col, dtype = rowwise_reduce(node.name, filtered)
        present = _and_presents([c.present for c in compiled])
        return Compiled(cur, col, dtype, has_window, present)

    def _compile_aggregate(self, df: DataFrame, node: A.AggregateCall, underscore) -> Compiled:
        c = self._compile(df, node.inner, underscore)
        c = self._maybe_materialize(c)
        if node.kind == "lag" and node.window_ms == 0:
            # PreviousValue with a 1 ms window ≡ previous row (spacing is
            # always ≥ 1 ms). Absent (not Fail) when the series has no
            # previous row or the previous value was Fail — the queue
            # drops Fail entries without emitting (PreviousValue.scala:57).
            if c.present is None:
                col = F.lag(c.col).over(self._w_order())
                emitted = F.lag(F.when(c.col.isNotNull(), F.lit(1))).over(
                    self._w_order()
                ).isNotNull()
                present = _and_presents([c.present, emitted])
                return Compiled(c.df, col, c.dtype, True, present)
            # Masked inner (its own lag terms leave absent rows): the
            # outer PreviousValue consumes the inner's EMITTED IdxValue
            # stream only (AccumPattern folds over the inner's spans),
            # so "previous" means the previous inner-PRESENT row, not
            # the previous raw row — absent rows are invisible to this
            # term (r6c, oracle-fuzz-caught on lag(lag(v, T))). The
            # term's OWN Segmentizer then bridges its non-emitted rows
            # between equal adjacent emissions, exactly like lag(x, T).
            wp = self._w_order().rowsBetween(
                Window.unboundedPreceding, -1
            )
            prev_entry = F.last(
                F.when(c.present, F.struct(c.col.alias("v"))),
                ignorenulls=True,
            ).over(wp)
            lval = prev_entry["v"]
            emitted = (
                F.coalesce(c.present, F.lit(False))
                & prev_entry.isNotNull()
                & lval.isNotNull()
            )
            if self.SERIES_COL not in c.df.columns:
                # probe compile on a raw frame (see the lag(x, T)
                # branch below) — un-bridged lazy form
                return Compiled(
                    c.df, F.when(emitted, lval), c.dtype, True, emitted
                )
            ename = _tmp("lag1v")
            df2 = c.df.withColumn(ename, F.when(emitted, lval))
            col, present = self._segmentizer_bridge(ename)
            return Compiled(df2, col, c.dtype, True, present)
        if node.kind == "lag":
            # PreviousValue.scala:42-73 is CONSUME-ONCE, not a continuous
            # "value as of t − T": each queued value is emitted at the
            # first event whose time passes value_ts + T and is then
            # dequeued, so an event emits the newest value whose
            # timestamp lies in the half-open frame (t_prev − T, t_now − T]
            # and yields nothing when that frame is empty. Partitioned by
            # (keys, series) like every other window: the reference
            # resets PreviousValue state at a >maxGap split
            # (PatternProcessor.scala:33-56), so neither the lookback nor
            # t_prev reaches into the previous sub-series.
            ms = self._ms()
            w = (
                Window.partitionBy(*self._series_keys())
                .orderBy(ms)
                .rangeBetween(Window.unboundedPreceding, -node.window_ms)
            )
            # only the inner's EMITTED stream enqueues: an aggregate
            # inner keeps its window VALUE at absent rows (presence is
            # a separate mask), so gate the frame source on presence
            # or those values would leak into the outer queue (r6c)
            src = c.col if c.present is None else F.when(c.present, c.col)
            val = F.last(src, ignorenulls=True).over(w)
            val_ms = F.last(F.when(src.isNotNull(), ms), ignorenulls=True).over(w)
            # t_prev is the previous element of the INNER'S EMITTED
            # stream: a masked inner's absent rows are not processed by
            # the outer PreviousValue at all (no pop, no frame), so
            # they must not advance t_prev (r6c, oracle-fuzz-caught)
            prev_ms = (
                F.lag(ms).over(self._w_order())
                if c.present is None
                else F.last(F.when(c.present, ms), ignorenulls=True).over(
                    self._w_order().rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                )
            )
            emitted = val_ms.isNotNull() & (
                prev_ms.isNull() | (val_ms > prev_ms - node.window_ms)
            )
            if c.present is not None:
                # emission can only happen at a PROCESSED (inner-
                # present) row — without this gate a due value "pops"
                # at an inner-absent row and the leaked column value
                # feeds the next nesting level (r6c, oracle-caught)
                emitted = emitted & F.coalesce(c.present, F.lit(False))
            # Segmentizer bridging (equal-valued emission merge, NaN
            # bridges with NaN) is shared with the lag1 branch — see
            # _segmentizer_bridge. Emissions must be materialized
            # before its neighbor-fill windows (no window-in-window).
            if self.SERIES_COL not in c.df.columns:
                # Probe compile on a raw frame (streaming router's
                # kernel-eligibility check): the window columns above
                # reference the series tag, so materializing them here
                # would fail analysis. Return the un-bridged lazy form —
                # has_window=True already routes this to the carry
                # buffer, and every evaluating path applies with_series
                # first.
                present = _and_presents([c.present, emitted])
                return Compiled(c.df, F.when(emitted, val), c.dtype, True, present)
            ename = _tmp("lagv")
            df2 = c.df.withColumn(ename, F.when(emitted, val))
            col, present = self._segmentizer_bridge(ename)
            return Compiled(df2, col, c.dtype, True, present)
        # GroupPattern's sliding window is HALF-OPEN (t−w, t]: it evicts
        # elements with elem.time + window <= time (GroupPattern.scala:76)
        # — unlike WindowStatistic which keeps [t−w, t] inclusive. Pinned
        # by golden case 13 (`avg(SpeedThrustMin, 2 sec) = 22`).
        dtype = (
            "int64"
            if node.kind == "count"
            else "float64"
            if node.kind in ("avg",)
            else numeric_result_type(c.dtype, c.dtype)
        )
        # Frame-shape choice (r11, the Segmentizer lesson's sibling):
        # Spark's sliding RANGE frame cannot decrement an aggregate, so
        # WindowExec re-aggregates the whole in-frame buffer per output
        # row — O(n × rows-in-window) per key. Measured at fixed 2M
        # rows / 1 Hz keys: `avg(x, 30 sec)` 1.4 s but `avg(x, 24 hr)`
        # 325 s (tools/bench_window_frames.py) — a day-long window on a
        # 1 Hz sensor pays ~86,000× per row. Long/dense windows
        # therefore route to O(n) forms (gate: _long_window; override
        # with window_agg='prefix'/'frame'), picked per dtype:
        #   * count / integer sum — global prefix-difference (two
        #     GROWING frames: running cumulative minus its value at or
        #     before t−w). Integer subtraction is BIT-EXACT, and this
        #     matches the reference's own add/evict running sums
        #     (GroupPattern.scala:76).
        #   * FLOAT sum/avg — block-anchored two-piece sums (r14,
        #     VERDICT r13 #1: the global cumulative's rounding grows
        #     with key lifetime and flipped a threshold at sf1; the
        #     block form's error is bounded by the window sum).
        #   * min/max — not subtractable at all; the two-block
        #     decomposition (_block_extreme), bit-exact at any window.
        # All behind the same auto threshold since the O(n) forms'
        # fixed cost (extra growing frames; sentinel distinct for the
        # block forms) only pays off once frames get long.
        if node.kind in ("min", "max") and (
            self.window_agg == "prefix"
            or (
                self.window_agg == "auto"
                and self._long_window(node.window_ms)
            )
        ):
            df3, col = self._block_extreme(
                c.df, c.col, node.kind, node.window_ms
            )
            self._note_window_form(node.kind, node.window_ms, "block")
            return Compiled(df3, col, dtype, False, c.present)
        use_prefix = node.kind in ("avg", "sum", "count") and (
            self.window_agg == "prefix"
            or (
                self.window_agg == "auto"
                and (
                    # count defaults to the O(n) prefix (bit-exact
                    # integer subtraction, no drift risk) unless a
                    # measured rate says frames are sparse — then the
                    # single sliding frame is cheaper (r14; counts are
                    # integers, so the two forms are bit-identical)
                    (node.kind == "count" and self.event_rate_hz is None)
                    or self._long_window(node.window_ms)
                )
            )
        )
        if use_prefix:
            int_sum = dtype.startswith("int")
            if node.kind != "count" and not int_sum:
                # FLOAT sum/avg: block-anchored two-piece sums (r14,
                # VERDICT r13 Next #1). The r12 whole-history
                # prefix-difference drifted with key lifetime — at sf1
                # its cumulative-sum rounding flipped
                # `avg(value, 6 hr) > 100.3` on 4 boundary rows
                # (judge-reproduced, 84,217 vs DuckDB/frame 84,213).
                # The block form adds exactly the in-window terms
                # (error bounded by the WINDOW sum, not the
                # cumulative), still O(n), and gives frame-form
                # NaN/±Inf semantics for free — a non-finite row
                # poisons precisely the windows that contain it, so
                # the r12 NaN/±Inf counter reconstitution is gone.
                from tsp_spark.ops.windows import block_window_sums

                contribs = {
                    "cnt": F.when(
                        c.col.isNotNull(), F.lit(1)
                    ).otherwise(F.lit(0)),
                    "sum": c.col.cast("double"),
                }
                df2, res = block_window_sums(
                    c.df, contribs, node.window_ms,
                    self._series_keys(), self.ts,
                )
                cnt_win = F.coalesce(res["cnt"], F.lit(0))
                # empty half-open frame -> NULL, matching F.sum/F.avg
                col = F.when(
                    cnt_win > 0,
                    res["sum"] if node.kind == "sum"
                    else res["sum"] / cnt_win,
                )
                self._note_window_form(node.kind, node.window_ms, "block")
                return Compiled(df2, col, dtype, False, c.present)
            # count / integer sum: the global prefix-difference is
            # BIT-EXACT (integer subtraction) and needs no sentinel
            # union — keep it.
            ms = self._ms()
            wcum = (
                Window.partitionBy(*self._series_keys())
                .orderBy(ms)
                .rangeBetween(Window.unboundedPreceding, 0)
            )
            wprev = (
                Window.partitionBy(*self._series_keys())
                .orderBy(ms)
                .rangeBetween(Window.unboundedPreceding, -node.window_ms)
            )
            cnt_name, sum_name = _tmp("wcnt"), _tmp("wsum")
            df2 = c.df.withColumn(
                cnt_name,
                F.sum(
                    F.when(c.col.isNotNull(), F.lit(1)).otherwise(F.lit(0))
                ).over(wcum),
            )

            def _win(name: str, zero: Column) -> Column:
                prev = F.coalesce(F.last(F.col(name)).over(wprev), zero)
                return F.col(name) - prev

            if node.kind != "count":
                # the cumulative runs over the key's WHOLE history, so a
                # long-typed running sum can pass 2^63 even when every
                # window sum fits — an ANSI session then THROWS
                # ARITHMETIC_OVERFLOW mid-job (non-ANSI silently wrapped,
                # which the subtraction survives mod 2^64). Accumulate in
                # decimal(30,0) instead: exact to 10^30, never trips
                # ANSI, and the difference wraps back into long range
                # like Scala would (r14, docs/SEMANTICS.md §20).
                acc = F.coalesce(c.col.cast("long"), F.lit(0).cast("long"))
                df2 = df2.withColumn(
                    sum_name, F.sum(acc.cast("decimal(20,0)")).over(wcum)
                )
            cnt_win = _win(cnt_name, F.lit(0))
            if node.kind == "count":
                col = cnt_win
            else:
                from tsp_spark.compile.registry import wrap64_to_long

                sum_win = wrap64_to_long(
                    _win(sum_name, F.lit(0).cast("decimal(30,0)"))
                )
                # empty half-open frame -> NULL, matching F.sum
                col = F.when(cnt_win > 0, sum_win)
            self._note_window_form(node.kind, node.window_ms, "prefix")
            return Compiled(df2, col, dtype, True, c.present)
        w = self._w_range(node.window_ms - 1)
        fn = {"avg": F.avg, "sum": F.sum, "count": F.count, "min": F.min, "max": F.max}[
            node.kind
        ]
        col = fn(c.col).over(w)
        self._note_window_form(node.kind, node.window_ms, "frame")
        # inner absent rows carry NULL (when(emitted, …)) which the frame
        # aggregate skips — values match GroupPattern consuming only
        # emitted inputs; the output exists per emitted input idx.
        return Compiled(self._ensure_ms(c.df), col, dtype, True, c.present)

    # --- pattern-level operators --------------------------------------
    def _run_start_ms(self, df: DataFrame, cond: Column) -> tuple[DataFrame, Column]:
        """Materialize boundary flags for the cond's runs; return the
        current run's start epoch-ms as a window column.

        Sibling of ops/islands.with_run_start, kept separate on
        purpose: this form is a cumulative max over the compiler's ONE
        shared window spec (no island-keyed repartitioning), so every
        Window node chains behind the same Exchange. The max_gap
        boundary term is defense in depth — under series partitioning
        (_series_keys includes the series id) no intra-partition gap
        can exceed max_gap, so it only matters if a caller ever feeds
        a frame that skipped with_series."""
        w = self._w_order()
        ms = self._ms()
        boundary = (
            ~cond.eqNullSafe(F.lag(cond).over(w))
            | F.lag(F.col(self.ts)).over(w).isNull()
        )
        if self.max_gap_ms is not None:
            boundary = boundary | (ms - F.lag(ms).over(w) > F.lit(self.max_gap_ms))
        bname = _tmp("boundary")
        df2 = df.withColumn(bname, boundary)
        run_start = F.max(F.when(F.col(bname), F.unix_millis(F.col(self.ts)))).over(
            self._w_cum()
        )
        return df2, run_start

    def _compile_timer(self, df: DataFrame, node: A.Timer) -> Compiled:
        c = self.compile_bool(df, node.inner)
        c = self._materialize(c)  # both prior branches reduced to this
        df2, run_start = self._run_start_ms(c.df, c.col)
        held_ms = self._ms() - run_start
        col = F.when(
            c.col.isNull(), F.lit(None).cast("boolean")
        ).otherwise(c.col & (held_ms >= F.lit(node.window_ms)))
        return Compiled(df2, col, "boolean", True)

    def _prefix_closed_sum(self, expr: Column, window_ms: int) -> Column:
        """O(n) sum of ``expr`` over the CLOSED trailing window [t−w, t]
        (WindowStatistic's eviction is strict `<`, so its window keeps
        the boundary event — unlike GroupPattern's half-open frame).

        r12, closing the r11b gap: Spark's sliding RANGE frame cannot
        decrement, so `F.sum(..).over(rangeBetween(−w, 0))` re-sums the
        whole buffer per row — O(n × rows-in-window); the r11b sweep
        measured 271× at 24 h windows (tools/bench_window_frames.py).
        Both frames here GROW (unbounded lower bound), which Spark's
        UnboundedPrecedingWindowFunctionFrame aggregates incrementally
        — O(n) per key regardless of window length. Closed-window
        complement at integer millis: rows with ms < t−w ⟺
        ms ≤ t−w−1, hence the −(w+1) upper bound. The truth-stat
        inputs are integer counts / integer millis, so the subtraction
        is bit-exact — no float-association gate needed (contrast
        sum/avg, PREFIX_WINDOW_AGG_MIN_MS). NULL contributions (a
        key's first row has no inter-event delta) are skipped by both
        growing sums exactly as the frame form skips them, and a
        frame whose contributions are all NULL yields NULL in both
        forms (cum is NULL only while every value so far is NULL, and
        the before-window term coalesces to 0).

        Delegates to ops.windows._closed_window_sum so the −(w+1)
        boundary arithmetic exists in exactly ONE place for both the
        compiler and the standalone truth_stats helper."""
        from tsp_spark.ops.windows import _closed_window_sum

        # order by the shared materialized ms attribute (r14) — see
        # _w_range: per-node inline unix_millis sort keys block
        # CollapseWindow and cost one redundant Sort per range window.
        # Callers _ensure_ms the frame before using the result.
        return _closed_window_sum(
            expr, self._series_keys(), self.ts, window_ms,
            order_col=F.col(self.MS_COL),
        )

    def _block_extreme(
        self,
        df: DataFrame,
        value: Column,
        kind: str,
        window_ms: int,
        leading: bool = False,
    ) -> tuple[DataFrame, Column]:
        """O(n) windowed min/max — the two-block decomposition (r12,
        closing the last of the r11b frame-cliff class; VERDICT r11
        Next #3). min/max are NOT subtractable, so the prefix-difference
        rewrite (sum/count/avg, `_prefix_closed_sum`) does not apply and
        the sliding RANGE frame re-aggregates its whole buffer per row —
        O(n × rows-in-window); the rewrite buckets time into aligned
        window-width blocks so every frame GROWS (incremental in
        Spark's window exec), bit-exact at any window length.

        Thin delegate since r13 (VERDICT r12 Next #2): the full
        algorithm and its correctness notes live in
        ops.windows.block_extreme so the compiler and the public
        helpers (`windowed_min_long`/`windowed_max_long`) share ONE
        implementation. ``leading=True`` computes `wait`'s CLOSED
        leading window [t, t+W] on negated time."""
        from tsp_spark.ops.windows import block_extreme

        return block_extreme(
            df, value, kind, window_ms, self._series_keys(), self.ts,
            leading=leading,
        )

    def _compile_for_interval(self, df: DataFrame, node: A.ForWithInterval) -> Compiled:
        c = self.compile_bool(df, node.inner)
        c = self._materialize(c)
        cur = c.df
        ms = self._ms()
        use_prefix = self.window_agg != "frame"
        self._note_window_form(
            f"for_{node.kind}", node.window_ms,
            "prefix" if use_prefix else "frame",
        )
        if node.kind == "times":
            contrib = F.when(c.col, 1).otherwise(0)
            cur = self._ensure_ms(cur)
            if use_prefix:
                stat = self._prefix_closed_sum(contrib, node.window_ms).cast("double")
            else:
                stat = F.sum(contrib).over(self._w_range(node.window_ms)).cast("double")
        else:
            w_row = self._w_order()
            delta = ms - F.lag(ms).over(w_row)
            dname = _tmp("delta")
            cur = cur.withColumn(dname, delta)
            contrib = F.when(c.col, F.col(dname)).otherwise(0)
            cur = self._ensure_ms(cur)
            if use_prefix:
                stat = self._prefix_closed_sum(contrib, node.window_ms).cast("double")
            else:
                stat = F.sum(contrib).over(self._w_range(node.window_ms)).cast("double")
        # reference `exactly` rule: wait for a full window when exactly,
        # or when the upper bound can be violated by more data — for
        # `times` any finite hi, for time-kind only hi < window
        # (a time bound ≥ window can never be exceeded).
        if node.kind == "times":
            exactly = node.exactly or node.hi is not None
        else:
            exactly = node.exactly or (
                node.hi is not None and node.hi < node.window_ms
            )
        check = F.lit(True)
        if node.lo is not None and node.lo > 0:
            check = check & (stat >= F.lit(float(node.lo)))
        if node.hi is not None:
            check = check & (stat <= F.lit(float(node.hi)))
        if exactly:
            # full-window test: WindowStatistic's total_millis measures
            # elapsed SERIES time saturating at window (the stub before
            # the oldest retained event is counted back in,
            # WindowStatistic.scala eviction correction) — so the gate
            # is "window elapsed since the series started", NOT the
            # distance to the oldest in-frame event.
            total = ms - F.min(ms).over(self._w_cum())
            check = check & (total >= F.lit(node.window_ms))
        return Compiled(cur, check, "boolean", True)

    def _compile_wait(self, df: DataFrame, node: A.Wait) -> Compiled:
        c = self.compile_bool(df, node.inner)
        c = self._materialize(c)
        # r12: the closed leading frame [t, t+W] is a SLIDING frame
        # (both bounds move) — same O(n × rows-in-window) cliff as the
        # trailing aggregates. Route long windows through the two-block
        # form on negated time (bit-exact; see _block_extreme).
        if self.window_agg == "prefix" or (
            self.window_agg == "auto"
            and self._long_window(node.window_ms)
        ):
            df3, col = self._block_extreme(
                c.df, c.col, "max", node.window_ms, leading=True
            )
            self._note_window_form("wait", node.window_ms, "block")
            return Compiled(df3, col, "boolean", False)
        col = F.max(c.col).over(self._w_range(node.window_ms, leading=True))
        self._note_window_form("wait", node.window_ms, "frame")
        return Compiled(self._ensure_ms(c.df), col, "boolean", True)

    def _compile_andthen_bool(self, df: DataFrame, node: A.AndThen) -> Compiled:
        """`andThen` nested inside a boolean context (e.g. inside wait):
        mark each row as true when it lies inside some matched sequence
        interval [start(A), end(B)].

        Requires (keys, ts) to uniquely identify a row (true for keyed
        time series). The interval table is tiny after RLE, so the
        range-semi-join is cheap; the join-back is on the exact (keys,
        ts) equi-key."""
        iv = self.compile_intervals(df, node)
        ivs = iv.select(
            *self.keys,
            F.col("from_ts").alias("__seq_from"),
            F.col("to_ts").alias("__seq_to"),
        )
        rows = df.select(*self.keys, self.ts)
        cond = [rows[k] == ivs[k] for k in self.keys] + [
            rows[self.ts] >= ivs["__seq_from"],
            rows[self.ts] <= ivs["__seq_to"],
        ]
        matched = (
            rows.join(ivs, on=cond, how="left_semi")
            .withColumn("__seq_hit", F.lit(True))
        )
        name = _tmp("seq")
        df2 = df.join(matched, on=[*self.keys, self.ts], how="left").withColumn(
            name, F.coalesce(F.col("__seq_hit"), F.lit(False))
        ).drop("__seq_hit")
        return Compiled(df2, F.col(name), "boolean", False)

    def _compile_until(self, df: DataFrame, node: A.Until) -> Compiled:
        cl = self.compile_bool(df, node.left)
        cl = self._maybe_materialize(cl)
        cr = self.compile_bool(cl.df, node.right)
        col = cl.col & ~cr.col.cast("boolean")
        return Compiled(cr.df, col, "boolean", cl.has_window or cr.has_window)


def compile_pattern(
    df: DataFrame,
    pattern: str | A.Node,
    keys: Sequence[str],
    ts: str,
    fields_types: dict[str, str] | None = None,
    max_gap_ms: int | None = 60_000,
    tolerance_fraction: float = 0.0,
    window_agg: str = "auto",
) -> DataFrame:
    """Parse (if needed) and compile a pattern to its success-interval
    DataFrame: ``keys…, from_ts, to_ts, n_rows, start_idx, end_idx``."""
    from tsp_spark.dsl.parser import parse_pattern

    node = (
        parse_pattern(pattern, fields_types, tolerance_fraction)
        if isinstance(pattern, str)
        else pattern
    )
    return PatternCompiler(
        keys, ts, fields_types, max_gap_ms, window_agg=window_agg
    ).compile_intervals(df, node)
