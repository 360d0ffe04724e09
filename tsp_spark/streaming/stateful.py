"""True incremental streaming pattern kernels with per-key state.

The carry-buffer mode (streaming/job.py) re-evaluates a bounded window
of history per micro-batch — simple, one code path with batch. This
module is the genuinely *incremental* alternative via
``applyInPandasWithState``, built as ONE multi-pattern kernel
(``stateful_multi``): Spark permits a single stateful operator per
streaming query, and the reference runs exactly this topology anyway —
one keyed stream fanned into N per-key pattern state machines
(PatternProcessor.scala:23-59). So N patterns cost one shuffle and one
state store, with per-pattern state encoded side by side.

Three state-machine families cover the patterns whose state is O(open
runs): islands (row-level boolean), timer (``cond for T``), and the
andThen sequence join. Windowed sub-expressions (``avg(x, T) > c``,
truth stats ``for T <op> N times`` / ``<op> T'``) run through sliding
condition *programs* (below) whose per-key state is the window's event
deque — the reference's QueueStatsCounter shape
(core/.../aggregators/GroupPattern.scala:56-93,
WindowStatistic.scala:45-103): amortized O(1) queue maintenance per
event, state bounded by window occupancy, never the stream length, and
series-scoped like every batch window (a >maxGap split clears it).
Aggregates are recomputed from the deque (left-to-right, the batch
window-frame order) rather than via running add/subtract accumulators,
so streamed values are bit-identical to the batch plan — the
reference's running-sum trade (FP drift for O(1) math) is documented
here but not taken, because the oracle harness compares exact values.
``lag`` (PreviousValue) stays on the carry buffer: its batch semantics
are consume-once emission with forward-looking equal-value bridging,
which needs the NEXT emission — unbounded lookahead a streaming kernel
doesn't have.

State encoding: each machine serializes to a list[int] (epoch millis
and indices; -1 encodes None; doubles bit-cast to int64), one
ArrayType(LongType) struct field per pattern carrying
``[len(sm_state)] + sm_state + cond program states`` — no raw history
beyond open windows is ever retained.
"""

from __future__ import annotations

import math
import struct as _struct
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

_NONE = -1


def _enc(v):
    return _NONE if v is None else int(v)


def _dec(v):
    return None if v == _NONE else int(v)


def _fbits(v: float) -> int:
    """Bit-cast double → int64 (lossless state encoding for floats)."""
    return _struct.unpack(">q", _struct.pack(">d", float(v)))[0]


def _bitsf(b: int) -> float:
    return _struct.unpack(">d", _struct.pack(">q", int(b)))[0]


class _IslandSM:
    """SimplePattern RLE: one open run of true cond per key."""

    n_conds = 1

    def init(self) -> list[int]:
        return [_NONE, _NONE, 0]  # run_start, last, n_rows

    def step(self, st, ms, conds, gap_split):
        run_start, last, n = _dec(st[0]), _dec(st[1]), st[2]
        closed = []
        cond = conds[0]
        if run_start is not None and (gap_split or not cond):
            closed.append((run_start, last, n))
            run_start, n = None, 0
        if cond and run_start is None:
            run_start, n = ms, 0
        if run_start is not None:
            n += 1
        return [_enc(run_start), _enc(ms), n], closed

    def flush(self, st):
        run_start, last, n = _dec(st[0]), _dec(st[1]), st[2]
        return [(run_start, last, n)] if run_start is not None else []


class _TimerSM:
    """TimerPattern ``cond for T``: the open run plus its qualifying
    suffix (first event held ≥ window)."""

    n_conds = 1

    def __init__(self, window_ms: int):
        self.window_ms = window_ms

    def init(self) -> list[int]:
        return [_NONE, _NONE, _NONE, 0]  # run_start, hold_start, last, n

    def step(self, st, ms, conds, gap_split):
        run_start, hold_start, last, n = (
            _dec(st[0]), _dec(st[1]), _dec(st[2]), st[3],
        )
        closed = []
        cond = conds[0]
        if run_start is not None and (gap_split or not cond):
            if hold_start is not None:
                closed.append((hold_start, last, n))
            run_start, hold_start, n = None, None, 0
        if cond and run_start is None:
            run_start = ms
        if run_start is not None and ms - run_start >= self.window_ms:
            if hold_start is None:
                hold_start, n = ms, 0
            n += 1
        return [_enc(run_start), _enc(hold_start), _enc(ms), n], closed

    def flush(self, st):
        _rs, hold_start, last, n = _dec(st[0]), _dec(st[1]), _dec(st[2]), st[3]
        return [(hold_start, last, n)] if hold_start is not None else []


class _AndThenSM:
    """AndThen sequence join (AndThenPattern.scala:69-88 via
    ops/sequence.py): closed A-runs pair 1:1 with the earliest closed
    B-run satisfying ``b_si <= a_ei + 1 AND b_ei >= a_si`` within one
    gap-delimited sub-series; a split resets everything. Pending runs
    are pruned the moment no future counterpart can match; consumed
    B-runs stay as tombstones so a later A whose earliest satisfying B
    was taken stays unmatched — the batch row_number pairing.

    State layout: [next_idx, a_si, a_from, b_si, b_from,
                   n_pend_a, (a 4-tuples…), (b 5-tuples…)]
    """

    n_conds = 2

    def init(self) -> list[int]:
        return [1, _NONE, _NONE, _NONE, _NONE, 0]

    @staticmethod
    def _unpack(st):
        next_idx = st[0]
        a_open = (st[1], st[2]) if st[1] != _NONE else None
        b_open = (st[3], st[4]) if st[3] != _NONE else None
        n_a = st[5]
        flat = st[6:]
        pend_a = [tuple(flat[i : i + 4]) for i in range(0, n_a * 4, 4)]
        rest = flat[n_a * 4 :]
        pend_b = [tuple(rest[i : i + 5]) for i in range(0, len(rest), 5)]
        return next_idx, a_open, b_open, pend_a, pend_b

    @staticmethod
    def _pack(next_idx, a_open, b_open, pend_a, pend_b):
        st = [
            next_idx,
            a_open[0] if a_open else _NONE,
            a_open[1] if a_open else _NONE,
            b_open[0] if b_open else _NONE,
            b_open[1] if b_open else _NONE,
            len(pend_a),
        ]
        for a in pend_a:
            st.extend(a)
        for b in pend_b:
            st.extend(b)
        return [int(x) for x in st]

    @staticmethod
    def _match(pend_a, pend_b, matched):
        out_a = []
        for a in pend_a:
            a_si, a_ei, a_from, _a_to = a
            hit = next(
                (b for b in pend_b if b[0] <= a_ei + 1 and b[1] >= a_si), None
            )
            if hit is None:
                out_a.append(a)  # earliest satisfying B not closed yet
            elif not hit[4]:
                matched.append((a_from, hit[3], None))
                pend_b[pend_b.index(hit)] = (*hit[:4], 1)
            # else: earliest satisfying B already consumed → A dead
        return out_a

    def step(self, st, ms, conds, gap_split, last):
        next_idx, a_open, b_open, pend_a, pend_b = self._unpack(st)
        matched: list[tuple] = []
        if gap_split:
            if a_open:
                pend_a.append((a_open[0], next_idx - 1, a_open[1], last))
            if b_open:
                pend_b.append((b_open[0], next_idx - 1, b_open[1], last, 0))
            self._match(pend_a, pend_b, matched)
            next_idx, a_open, b_open, pend_a, pend_b = 1, None, None, [], []
        idx = next_idx
        next_idx += 1
        ca, cb = conds
        if a_open and not ca:
            pend_a.append((a_open[0], idx - 1, a_open[1], last))
            a_open = None
        if ca and not a_open:
            a_open = (idx, ms)
        if b_open and not cb:
            pend_b.append((b_open[0], idx - 1, b_open[1], last, 0))
            b_open = None
        if cb and not b_open:
            b_open = (idx, ms)
        pend_a = self._match(pend_a, pend_b, matched)
        # prune dead runs: the earliest future B starts at b_open.si (if
        # open) else >= next_idx; a B (tombstone or not) whose b_ei
        # precedes every possible future a_si is likewise dead
        b_floor = b_open[0] if b_open else next_idx
        pend_a = [a for a in pend_a if a[1] + 1 >= b_floor]
        a_floor = a_open[0] if a_open else next_idx
        pend_b = [b for b in pend_b if b[1] >= a_floor]
        return self._pack(next_idx, a_open, b_open, pend_a, pend_b), matched

    def flush(self, st, last):
        next_idx, a_open, b_open, pend_a, pend_b = self._unpack(st)
        matched: list[tuple] = []
        if a_open:
            pend_a.append((a_open[0], next_idx - 1, a_open[1], last))
        if b_open:
            pend_b.append((b_open[0], next_idx - 1, b_open[1], last, 0))
        self._match(pend_a, pend_b, matched)
        return matched


# ------------------------------------------------- windowed cond programs


_CMP_FNS = {"gt", "ge", "lt", "le", "eq", "ne"}
_ARITH_FNS = {"add", "sub", "mul", "div"}
_BOOL_FNS = {"and", "or", "xor", "not"}
# lag (PreviousValue) is deliberately ABSENT: the batch compiler gives it
# consume-once emission with forward-looking equal-value bridging
# (SegmentizerPattern) — the bridge needs the NEXT emission, which a
# streaming kernel cannot see without unbounded lookahead, so lag
# patterns stay on the carry buffer where the full batch compiler runs.
_AGG_KINDS = {"avg", "sum", "count", "min", "max"}


def _contains_agg(node) -> bool:
    """Does any AggregateCall appear anywhere under ``node``? Generic
    dataclass walk — used for routing only (never raises)."""
    import dataclasses

    from tsp_spark.dsl import ast as A

    if isinstance(node, A.AggregateCall):
        return True
    if not dataclasses.is_dataclass(node):
        return False
    for f in dataclasses.fields(node):
        v = getattr(node, f.name)
        for x in v if isinstance(v, tuple) else (v,):
            if isinstance(x, A.Node) and _contains_agg(x):
                return True
    return False


def _collect_aggs(node) -> list:
    """All AggregateCall nodes in pre-order (stable extraction order —
    the state layout depends on it)."""
    from tsp_spark.dsl import ast as A

    out = []

    def walk(n):
        if isinstance(n, A.AggregateCall):
            out.append(n)
            walk(n.inner)
        elif isinstance(n, A.FunctionCall):
            for a in n.args:
                walk(a)
        elif isinstance(n, (A.Cast, A.Assert)):
            walk(n.inner)
        elif isinstance(n, (A.Constant, A.Identifier)):
            pass
        else:
            raise ValueError(
                f"{type(n).__name__} inside a windowed boolean is not "
                f"supported by the incremental kernel — use the "
                f"carry-buffer streaming mode (streaming/job.py)"
            )

    walk(node)
    return out


def _eval_row(node, row, aggvals):
    """Kleene evaluation of a row-level/windowed boolean AST. ``aggvals``
    maps id(AggregateCall) → current window value. Mirrors the batch
    column semantics: None propagates through arithmetic/comparisons;
    IEEE NaN compares false (ne true); and/or are three-valued."""
    from tsp_spark.dsl import ast as A

    if isinstance(node, A.Assert):
        return _eval_row(node.inner, row, aggvals)
    if isinstance(node, A.Constant):
        return node.value
    if isinstance(node, A.Identifier):
        v = row[node.name]
        return None if pd.isna(v) else v
    if isinstance(node, A.Cast):
        v = _eval_row(node.inner, row, aggvals)
        if v is None:
            return None
        if node.dtype == "boolean":
            return bool(v)
        if node.dtype in ("float32", "float64"):
            return float(v)
        if node.dtype == "string":
            return str(v)
        return int(v)
    if isinstance(node, A.AggregateCall):
        return aggvals[id(node)]
    if isinstance(node, A.FunctionCall):
        name = node.name
        if name == "not":
            v = _eval_row(node.args[0], row, aggvals)
            return None if v is None else not bool(v)
        a = _eval_row(node.args[0], row, aggvals)
        b = _eval_row(node.args[1], row, aggvals) if len(node.args) > 1 else None
        if name in _BOOL_FNS:
            av = None if a is None else bool(a)
            bv = None if b is None else bool(b)
            if name == "and":
                if av is False or bv is False:
                    return False
                return None if av is None or bv is None else True
            if name == "or":
                if av is True or bv is True:
                    return True
                return None if av is None or bv is None else False
            return None if av is None or bv is None else av != bv  # xor
        if a is None or b is None:
            return None
        if name in _CMP_FNS:
            # Mirror registry._cmp: the float()/NaN path applies only to
            # numeric operands; strings compare natively (Spark's UTF8
            # binary order == Python's codepoint order for the DSL's
            # ASCII values). A mixed string/number comparison follows
            # Spark's implicit coercion — the string side casts to
            # double, a non-numeric string becomes NULL.
            if isinstance(a, str) != isinstance(b, str):
                try:
                    a = float(a) if isinstance(a, str) else a
                    b = float(b) if isinstance(b, str) else b
                except ValueError:
                    return None
            if isinstance(a, str):
                return {
                    "gt": a > b, "ge": a >= b, "lt": a < b,
                    "le": a <= b, "eq": a == b, "ne": a != b,
                }[name]
            fa, fb = float(a), float(b)
            if math.isnan(fa) or math.isnan(fb):
                return name == "ne"
            return {
                "gt": fa > fb, "ge": fa >= fb, "lt": fa < fb,
                "le": fa <= fb, "eq": fa == fb, "ne": fa != fb,
            }[name]
        if name in _ARITH_FNS:
            if name == "add":
                return a + b
            if name == "sub":
                return a - b
            if name == "mul":
                return a * b
            # Int/Int integer division mirrors the registry's rule
            if isinstance(a, int) and isinstance(b, int):
                return None if b == 0 else int(a / b)
            return float("nan") if b == 0 else a / b
        raise ValueError(
            f"function '{name}' inside a windowed boolean is not "
            f"supported by the incremental kernel"
        )
    raise ValueError(f"unsupported node {type(node).__name__}")


class _SlidingAggState:
    """Mutable per-key state for ONE AggregateCall term: the deque of
    (ms, value) pairs currently inside the trailing window. Lives as a
    plain object for the duration of one micro-batch; (de)serializes to
    ints."""

    __slots__ = ("q",)

    def __init__(self):
        self.q: list[tuple[int, float]] = []

    def encode(self) -> list[int]:
        out = [len(self.q)]
        for ms, v in self.q:
            out.extend((ms, _fbits(v)))
        return out

    @classmethod
    def decode(cls, st: list[int], pos: int) -> tuple["_SlidingAggState", int]:
        obj = cls()
        n = st[pos]
        pos += 1
        for _ in range(n):
            obj.q.append((st[pos], _bitsf(st[pos + 1])))
            pos += 2
        return obj, pos


class _WindowedCondProgram:
    """Boolean condition containing windowed aggregate terms, evaluated
    incrementally per event (GroupPattern.scala:56-93 accumulator shape):
    avg/sum/count/min/max(x, T) over the half-open trailing window
    (t−W, t] — the batch compiler's `_w_range(W−1)` frame — with values
    recomputed from the deque in event order so they're bit-identical
    to the batch plan. Windows are SERIES-scoped like every batch
    window (partitionBy(keys, series)): a >maxGap split clears the
    deques, mirroring the reference's per-sub-series state reset
    (PatternProcessor.scala:33-56).

    Config-only object; per-key state is passed in/out explicitly.
    """

    def __init__(self, node):
        self.node = node
        self.aggs = _collect_aggs(node)
        for a in self.aggs:
            if a.kind not in _AGG_KINDS:
                raise ValueError(
                    f"windowed aggregate '{a.kind}' is not supported by "
                    f"the incremental kernel — use the carry-buffer "
                    f"streaming mode (streaming/job.py)"
                )
            if _collect_aggs(a.inner):
                raise ValueError(
                    "nested windowed aggregates are not supported by the "
                    "incremental kernel — use the carry-buffer streaming "
                    "mode (streaming/job.py)"
                )

    # -- state ------------------------------------------------------------
    def load(self, st: list[int], pos: int) -> tuple[list, int]:
        objs = []
        for _ in self.aggs:
            obj, pos = _SlidingAggState.decode(st, pos)
            objs.append(obj)
        return objs, pos

    def init(self) -> list:
        return [_SlidingAggState() for _ in self.aggs]

    @staticmethod
    def dump(objs: list) -> list[int]:
        out: list[int] = []
        for o in objs:
            out.extend(o.encode())
        return out

    # -- evaluation -------------------------------------------------------
    def step(self, objs: list, ms: int, row, gap_split: bool) -> object:
        aggvals: dict[int, object] = {}
        for a, o in zip(self.aggs, objs):
            if gap_split:
                o.q.clear()  # batch windows are series-scoped
            iv = _eval_row(a.inner, row, {})
            # trailing (t−W, t] frame: admit current, evict ms ≤ t−W
            if iv is not None:
                o.q.append((ms, float(iv)))
            lo = ms - a.window_ms
            while o.q and o.q[0][0] <= lo:
                o.q.pop(0)
            vals = [v for _, v in o.q]
            if a.kind == "count":
                aggvals[id(a)] = len(vals)
            elif not vals:
                aggvals[id(a)] = None
            elif a.kind == "sum":
                aggvals[id(a)] = _seq_sum(vals)
            elif a.kind == "avg":
                aggvals[id(a)] = _seq_sum(vals) / len(vals)
            elif a.kind == "min":
                aggvals[id(a)] = min(vals, key=_nan_key)
            else:  # max
                aggvals[id(a)] = max(vals, key=_nan_key)
        return _eval_row(self.node, row, aggvals)


def _seq_sum(vals: list[float]) -> float:
    """Left-to-right sum — the batch window frame's accumulation order."""
    acc = 0.0
    for v in vals:
        acc += v
    return acc


def _nan_key(v: float):
    """Spark ordering: NaN sorts greatest."""
    return (math.isnan(v), v)


class _TruthStatProgram:
    """WindowStatistic truth-stat condition (``X for T <op> N times`` /
    ``<op> T'``, WindowStatistic.scala:45-103): sliding deque of per-
    event contributions in the CLOSED trailing window [t−W, t] (the
    batch `_w_range(W)` frame). kind='times' contributes 1 per true
    event; kind='time' contributes the inter-event delta (ms since the
    previous event of the same sub-series, 0 for the series head) when
    the cond is true — exactly the batch `sum(when(cond, delta))`.
    Windows and deltas are series-scoped: a >maxGap split clears state.

    ``exactly`` mirrors the compiler's full-window rule (compiler.py
    _compile_for_interval): when set, the condition additionally
    requires window_ms of SERIES time elapsed since the sub-series
    head — tracked here as series_start."""

    def __init__(self, inner, window_ms: int, lo, hi, kind: str, exactly: bool):
        # inner: column name (row-level fast path) or _WindowedCondProgram
        self.inner = inner
        self.window_ms = window_ms
        self.lo = lo
        self.hi = hi
        self.kind = kind
        self.exactly = exactly

    def load(self, st: list[int], pos: int) -> tuple[list, int]:
        series_start = _dec(st[pos])
        prev_ms = _dec(st[pos + 1])
        n = st[pos + 2]
        pos += 3
        q = [(st[pos + 2 * i], st[pos + 2 * i + 1]) for i in range(n)]
        pos += 2 * n
        if isinstance(self.inner, _WindowedCondProgram):
            iobjs, pos = self.inner.load(st, pos)
        else:
            iobjs = None
        return [q, iobjs, series_start, prev_ms], pos

    def init(self) -> list:
        return [
            [],
            self.inner.init()
            if isinstance(self.inner, _WindowedCondProgram)
            else None,
            None,
            None,
        ]

    def dump(self, objs: list) -> list[int]:
        q, iobjs, series_start, prev_ms = objs
        out = [_enc(series_start), _enc(prev_ms), len(q)]
        for ms, c in q:
            out.extend((ms, c))
        if isinstance(self.inner, _WindowedCondProgram):
            out.extend(self.inner.dump(iobjs))
        return out

    def step(self, objs: list, ms: int, row, gap_split: bool) -> object:
        q, iobjs, series_start, prev_ms = objs
        if gap_split:
            q = []
            series_start, prev_ms = None, None
        if series_start is None:
            series_start = ms
        if isinstance(self.inner, _WindowedCondProgram):
            cv = self.inner.step(iobjs, ms, row, gap_split)
        else:
            v = row[self.inner]
            cv = (not pd.isna(v)) and bool(v)
        truthy = cv is not None and bool(cv)
        if self.kind == "times":
            contrib = 1 if truthy else 0
        else:  # 'time': inter-event delta, series head contributes 0
            delta = 0 if prev_ms is None else ms - prev_ms
            contrib = delta if truthy else 0
        q.append((ms, contrib))
        lo_ms = ms - self.window_ms
        while q and q[0][0] < lo_ms:
            q.pop(0)
        stat = sum(c for _, c in q)
        ok = True
        if self.lo is not None and self.lo > 0:
            ok = ok and stat >= self.lo
        if self.hi is not None:
            ok = ok and stat <= self.hi
        if self.exactly:
            ok = ok and (ms - series_start >= self.window_ms)
        objs[0], objs[2], objs[3] = q, series_start, ms
        return ok


@dataclass
class PatternSpec:
    """One pattern routed into the multi kernel. ``cond_cols`` entries
    are either precomputed boolean column names (JVM fast path) or
    windowed condition programs evaluated per event in the kernel."""

    pattern_id: int
    subunit: int
    sm: object  # _IslandSM | _TimerSM | _AndThenSM
    cond_cols: list  # list[str | _WindowedCondProgram | _TruthCountProgram]


def stateful_multi(
    stream: DataFrame,
    specs: Sequence[PatternSpec],
    keys: Sequence[str],
    ts: str,
    max_gap_ms: int = 60_000,
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """Run every spec's state machine over one keyed stream — a single
    applyInPandasWithState (Spark allows exactly one per query), one
    shuffle, one state store. Emits closed intervals:
    (pattern_id, subunit, keys…, from_ts, to_ts, n_rows)."""
    key_fields = [stream.schema[k] for k in keys]
    out_schema = T.StructType(
        [
            T.StructField("pattern_id", T.IntegerType()),
            T.StructField("subunit", T.IntegerType()),
            *key_fields,
            T.StructField("from_ts", T.TimestampType()),
            T.StructField("to_ts", T.TimestampType()),
            T.StructField("n_rows", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("last_ms", T.LongType())]
        + [
            T.StructField(f"p{i}", T.ArrayType(T.LongType()))
            for i in range(len(specs))
        ]
    )
    out_cols = [
        "pattern_id", "subunit", *keys, "from_ts", "to_ts", "n_rows",
    ]
    specs = list(specs)

    def _programs(spec):
        return [c for c in spec.cond_cols if not isinstance(c, str)]

    def _unpack_state(spec, arr):
        """[len(sm_st)] + sm_st + program states → (sm_st, prog_objs)."""
        arr = list(arr)
        n = arr[0]
        sm_st = arr[1 : 1 + n]
        pos = 1 + n
        prog_objs = []
        for prog in _programs(spec):
            objs, pos = prog.load(arr, pos)
            prog_objs.append(objs)
        return sm_st, prog_objs

    def _pack_state(spec, sm_st, prog_objs):
        out = [len(sm_st)] + [int(x) for x in sm_st]
        for prog, objs in zip(_programs(spec), prog_objs):
            out.extend(prog.dump(objs))
        return out

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        closed: list[tuple] = []

        def emit(spec, items):
            for it in items:
                f, t_, n = it
                closed.append((spec.pattern_id, spec.subunit, *key, f, t_, n))

        if state.hasTimedOut:
            if state.exists:
                got = state.get
                last = got[0]
                for i, spec in enumerate(specs):
                    st, _objs = _unpack_state(spec, got[1 + i])
                    if isinstance(spec.sm, _AndThenSM):
                        emit(
                            spec,
                            [(f, t_, None) for f, t_, _ in spec.sm.flush(st, last)],
                        )
                    else:
                        emit(spec, spec.sm.flush(st))
            state.remove()
            yield _pdf(closed, out_cols)
            return

        if state.exists:
            got = state.get
            last = _dec(got[0])
            sts, progs = [], []
            for i, spec in enumerate(specs):
                st, objs = _unpack_state(spec, got[1 + i])
                sts.append(st)
                progs.append(objs)
        else:
            last = None
            sts = [spec.sm.init() for spec in specs]
            progs = [
                [prog.init() for prog in _programs(spec)] for spec in specs
            ]

        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(ts)
        for _, row in rows.iterrows():
            ms = int(row[ts].value // 1_000_000)
            gap_split = last is not None and ms - last > max_gap_ms
            for i, spec in enumerate(specs):
                conds = []
                pi = 0
                for c in spec.cond_cols:
                    if isinstance(c, str):
                        v = row[c]
                        conds.append((not pd.isna(v)) and bool(v))
                    else:
                        v = c.step(progs[i][pi], ms, row, gap_split)
                        pi += 1
                        conds.append(bool(v) if v is not None else False)
                if isinstance(spec.sm, _AndThenSM):
                    sts[i], items = spec.sm.step(sts[i], ms, conds, gap_split, last)
                else:
                    sts[i], items = spec.sm.step(sts[i], ms, conds, gap_split)
                emit(spec, items)
            last = ms

        state.update(
            (
                last,
                *[
                    _pack_state(spec, sts[i], progs[i])
                    for i, spec in enumerate(specs)
                ],
            )
        )
        state.setTimeoutTimestamp(last + max_gap_ms)
        yield _pdf(closed, out_cols)

    return (
        stream.withWatermark(ts, watermark_delay)
        .groupBy(*keys)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _pdf(rows, cols):
    if not rows:
        return pd.DataFrame({c: [] for c in cols})
    df = pd.DataFrame(rows, columns=cols)
    for c in ("from_ts", "to_ts"):
        df[c] = pd.to_datetime(df[c], unit="ms")
    return df


# ------------------------------------------------------- single wrappers


def stateful_islands(
    stream: DataFrame,
    keys: Sequence[str],
    ts: str,
    cond_col: str,
    max_gap_ms: int = 60_000,
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """Incremental island/RLE kernel; see stateful_multi."""
    spec = PatternSpec(0, 0, _IslandSM(), [cond_col])
    return stateful_multi(
        stream, [spec], keys, ts, max_gap_ms, watermark_delay
    ).select(*keys, "from_ts", "to_ts", "n_rows")


def stateful_timer(
    stream: DataFrame,
    keys: Sequence[str],
    ts: str,
    cond_col: str,
    window_ms: int,
    max_gap_ms: int = 60_000,
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """Incremental TimerPattern ``cond for T``; see stateful_multi."""
    spec = PatternSpec(0, 0, _TimerSM(window_ms), [cond_col])
    return stateful_multi(
        stream, [spec], keys, ts, max_gap_ms, watermark_delay
    ).select(*keys, "from_ts", "to_ts", "n_rows")


def stateful_andthen(
    stream: DataFrame,
    keys: Sequence[str],
    ts: str,
    cond_a_col: str,
    cond_b_col: str,
    max_gap_ms: int = 60_000,
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """Incremental AndThen sequence join; see stateful_multi."""
    spec = PatternSpec(0, 0, _AndThenSM(), [cond_a_col, cond_b_col])
    return stateful_multi(
        stream, [spec], keys, ts, max_gap_ms, watermark_delay
    ).select(*keys, "from_ts", "to_ts")


# ------------------------------------------------------------ DSL router


def build_spec(
    stream: DataFrame,
    pattern: str,
    keys: Sequence[str],
    ts: str,
    fields_types: dict[str, str] | None = None,
    max_gap_ms: int = 60_000,
    pattern_id: int = 0,
    subunit: int = 0,
) -> tuple[DataFrame, PatternSpec]:
    """Compile a DSL pattern into (stream + cond sources, PatternSpec)
    for the multi kernel. Row-level booleans compile to JVM columns (the
    fast path); booleans containing windowed aggregates (``avg(x, T)``
    and friends) become sliding condition programs evaluated inside the
    kernel, and ``for T <op> N times`` / ``<op> T'`` becomes a truth-
    stat program (WindowStatistic) with the compiler's full-window
    "exactly" gate. Raises ValueError only for shapes that genuinely
    need the carry-buffer mode (streaming/job.py): nested andThen, lag
    (consume-once + bridging semantics), until/wait, nested window
    aggregates."""
    from tsp_spark.compile.compiler import PatternCompiler
    from tsp_spark.dsl import ast as A
    from tsp_spark.dsl.parser import parse_pattern

    node = (
        parse_pattern(pattern, fields_types or {})
        if isinstance(pattern, str)
        else pattern
    )
    comp = PatternCompiler(keys, ts, fields_types, max_gap_ms=max_gap_ms)

    s = stream
    n_cols = 0

    def cond_source(n):
        """Boolean sub-AST → column name (row-level) or program (windowed)."""
        nonlocal s, n_cols
        if _contains_agg(n):
            return _WindowedCondProgram(n)
        c = comp.compile_bool(stream, n)
        if c.has_window or c.present is not None or c.df is not stream:
            raise ValueError(
                "pattern sub-expression needs windowed evaluation the "
                "incremental kernel can't express — use the carry-buffer "
                "streaming mode (streaming/job.py)"
            )
        name = f"__p{pattern_id}c{n_cols}"
        n_cols += 1
        s = s.withColumn(name, c.col)
        return name

    if isinstance(node, A.AndThen):
        if isinstance(node.left, A.AndThen) or isinstance(node.right, A.AndThen):
            raise ValueError(
                "nested andThen chains are not supported by the "
                "incremental stateful kernel — use the carry-buffer "
                "streaming mode (streaming/job.py), which evaluates the "
                "full batch compiler over bounded history"
            )
        ca, cb = cond_source(node.left), cond_source(node.right)
        return s, PatternSpec(pattern_id, subunit, _AndThenSM(), [ca, cb])
    if isinstance(node, A.Timer):
        cc = cond_source(node.inner)
        return s, PatternSpec(
            pattern_id, subunit, _TimerSM(node.window_ms), [cc]
        )
    if isinstance(node, A.ForWithInterval):
        inner = cond_source(node.inner)
        # the compiler's full-window ("exactly") rule: wait for a full
        # window when exactly, or when more data could still violate a
        # finite upper bound (_compile_for_interval)
        if node.kind == "times":
            exactly = node.exactly or node.hi is not None
        else:
            exactly = node.exactly or (
                node.hi is not None and node.hi < node.window_ms
            )
        prog = _TruthStatProgram(
            inner, node.window_ms, node.lo, node.hi, node.kind, exactly
        )
        return s, PatternSpec(pattern_id, subunit, _IslandSM(), [prog])
    cc = cond_source(node)
    return s, PatternSpec(pattern_id, subunit, _IslandSM(), [cc])


def stateful_pattern(
    stream: DataFrame,
    pattern: str,
    keys: Sequence[str],
    ts: str,
    fields_types: dict[str, str] | None = None,
    max_gap_ms: int = 60_000,
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """Route a single DSL pattern to its incremental kernel."""
    s, spec = build_spec(stream, pattern, keys, ts, fields_types, max_gap_ms)
    out = stateful_multi(s, [spec], keys, ts, max_gap_ms, watermark_delay)
    if isinstance(spec.sm, _AndThenSM):
        return out.select(*keys, "from_ts", "to_ts")
    return out.select(*keys, "from_ts", "to_ts", "n_rows")