"""Reference-faithful TSP state-machine oracle (pure Python, no Spark).

A line-by-line port of the reference engine's core semantics, used ONLY
as a test oracle to pin down interval-reporting behavior for the Spark
compiler (it is NOT part of the production engine). Sources:

* Result/Succ/Fail           core/.../Result.scala
* IdxValue, PQueue           core/.../Pattern.scala:45-50, PQueue.scala
* SimplePattern (RLE fold)   core/.../SimplePattern.scala:10-66
* CouplePattern (idx zip)    core/.../CouplePattern.scala:37-64
* MapPattern (lazy queue)    core/.../MapPattern.scala
* AndThenPattern             core/.../AndThenPattern.scala:42-94
* ReducePattern              core/.../ReducePattern.scala:38-71
* SegmentizerPattern         core/.../SegmentizerPattern.scala
* AccumPattern framework     core/.../aggregators/AccumPattern.scala
* TimestampsAdderPattern     core/.../aggregators/TimestampsAdderPattern.scala
* TimerPattern               core/.../aggregators/TimerPattern.scala
* WaitPattern                core/.../aggregators/WaitPattern.scala
* WindowStatistic            core/.../aggregators/WindowStatistic.scala
* GroupPattern               core/.../aggregators/GroupPattern.scala
* PreviousValue              core/.../aggregators/PreviousValue.scala
* Optimizer fusion rules     core/.../optimizations/Optimizer.scala:45-82
* ASTPatternGenerator        dsl/.../ASTPatternGenerator.scala:47-200
* function semantics         dsl/.../FunctionRegistry.scala (incl. the
  Fail-tolerant `or` at 299-309 and Scala total-order Double compare)
* PatternProcessor pipeline  streaming/.../mappers/PatternProcessor.scala,
  ProcessorCombinator.scala (1-based idx reassignment),
  PatternsSearchJob.reduceIncidents (incident sessionization)
* SparseRowsDataAccumulator  streaming/.../transformers/SparseRowsDataAccumulator.scala

Events are (idx, ms, row-dict); comparisons on doubles follow Java
total order (NaN greatest, NaN == NaN), matching Scala's default
`Ordering[Double]` used by the registry.
"""

from __future__ import annotations

import math
from collections import deque
from dataclasses import dataclass

MAX_WINDOW = (1 << 63) - 1  # Time.MaxWindow


def _wrap64(x: int) -> int:
    """Scala Long arithmetic wraps on overflow; TimerPattern with
    window=MaxWindow relies on it (t + MaxWindow < t)."""
    return (x + (1 << 63)) % (1 << 64) - (1 << 63)


# ---------------------------------------------------------------- Result

class _Fail:
    __slots__ = ()

    def __repr__(self):
        return "Fail"


FAIL = _Fail()


def _java_eq(a, b) -> bool:
    """Boxed-Java equality: NaN equals NaN (Double.equals semantics)."""
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_java_eq(x, y) for x, y in zip(a, b))
    return a == b


class Succ:
    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __eq__(self, o):
        return isinstance(o, Succ) and _java_eq(self.v, o.v)

    def __hash__(self):  # pragma: no cover
        return 1

    def __repr__(self):
        return f"Succ({self.v!r})"


def is_fail(r) -> bool:
    return r is FAIL


def res_map(r, f):
    return FAIL if r is FAIL else f(r.v)  # f returns a Result


# ---------------------------------------------------------------- queues

@dataclass
class IdxValue:
    start: int
    end: int
    value: object  # Succ | FAIL

    def map(self, f):
        return IdxValue(self.start, self.end, res_map(self.value, f))


class PQueue:
    """MutablePQueue: ArrayDeque with RLE-uniting enqueue (PQueue.scala:96-105)."""

    def __init__(self, items=()):
        self.q = deque(items)

    # -- inspection
    @property
    def size(self):
        return len(self.q)

    def head(self):
        return self.q[0] if self.q else None

    def to_seq(self):
        return list(self.q)

    # -- mutation (all return self, mirroring the Scala mutable queue)
    def behead(self):
        self.q.popleft()
        return self

    def dequeue_opt(self):
        if not self.q:
            return None
        return self.q.popleft(), self

    def enqueue(self, *ivs):
        for iv in ivs:
            self._enqueue_uniting(iv)
        return self

    def _enqueue_uniting(self, iv: IdxValue):
        if self.q:
            last = self.q[-1]
            lv, nv = last.value, iv.value
            eq = (lv is FAIL and nv is FAIL) or (
                lv is not FAIL and nv is not FAIL and lv == nv
            )
            if eq:
                self.q.pop()
                self.q.append(
                    IdxValue(min(last.start, iv.start), max(last.end, iv.end), lv)
                )
                return
        self.q.append(iv)

    def rewind_to(self, new_start: int):
        while self.q:
            h = self.q[0]
            if h.start > new_start:
                return self
            if h.end < new_start:
                self.q.popleft()
                continue
            self.q[0] = IdxValue(new_start, h.end, h.value)
            return self
        return self

    def __repr__(self):  # pragma: no cover
        return f"PQueue({list(self.q)!r})"


class MapPQueue:
    """Lazy mapped view (PQueue.scala:120-142). func: IdxValue -> Result."""

    def __init__(self, queue, func):
        self.queue = queue
        self.func = func

    @property
    def size(self):
        return self.queue.size

    def _m(self, iv):
        return IdxValue(iv.start, iv.end, FAIL if iv.value is FAIL else self.func(iv))

    def head(self):
        h = self.queue.head()
        return None if h is None else self._m(h)

    def to_seq(self):
        return [self._m(x) for x in self.queue.to_seq()]

    def behead(self):
        self.queue.behead()
        return self

    def dequeue_opt(self):
        r = self.queue.dequeue_opt()
        if r is None:
            return None
        return self._m(r[0]), self

    def rewind_to(self, new_start):
        self.queue.rewind_to(new_start)
        return self

    def enqueue(self, *ivs):  # pragma: no cover
        raise TypeError("Cannot enqueue to MapPQueue")


def unwind_while(queue, pred):
    while True:
        h = queue.head()
        if h is not None and pred(h):
            queue.behead()
        else:
            return queue


def spill(src, dst):
    while True:
        r = src.dequeue_opt()
        if r is None:
            return dst
        dst.enqueue(r[0])


def take_while_deque(q: deque, pred):
    out = deque()
    while q and pred(q[0]):
        out.append(q.popleft())
    return out, q


def split_at_idx(q: deque, idx: int, margin_to_first=False):
    if margin_to_first:
        return take_while_deque(q, lambda it: it[0] <= idx)
    return take_while_deque(q, lambda it: it[0] < idx)


# ---------------------------------------------------------------- events

@dataclass
class Ev:
    idx: int
    ms: int
    row: dict


# ---------------------------------------------------------------- patterns

class Pattern:
    def initial_state(self):
        raise NotImplementedError

    def apply(self, state, queue, events):
        raise NotImplementedError


class SimpleP(Pattern):
    """SimplePattern.scala:10-66 — per-event f with RLE merge on the fold."""

    def __init__(self, f):
        self.f = f  # Ev -> Result

    def initial_state(self):
        return None

    def apply(self, state, queue, events):
        last = None
        for e in events:
            value = self.f(e)
            if last is None:
                last = IdxValue(e.idx, e.idx, value)
            else:
                same = (last.value is FAIL and value is FAIL) or (
                    last.value is not FAIL and value is not FAIL and value == last.value
                )
                if same:
                    last = IdxValue(last.start, e.idx, last.value)
                else:
                    queue.enqueue(last)
                    last = IdxValue(e.idx, e.idx, value)
        if last is not None:
            queue.enqueue(last)
        return None, queue


class ConstP(SimpleP):
    def __init__(self, value):
        super().__init__(lambda _e: value)
        self.value = value


class MapP(Pattern):
    """MapPattern.scala — reuses the previous MapPQueue's inner queue."""

    def __init__(self, inner, func):
        self.inner = inner
        self.func = func  # value -> Result

    def initial_state(self):
        return self.inner.initial_state()

    def apply(self, state, queue, events):
        inner_q = queue.queue if isinstance(queue, MapPQueue) else queue
        new_state, new_q = self.inner.apply(state, inner_q, events)
        f = self.func
        return new_state, MapPQueue(new_q, lambda iv: res_map(iv.value, f))


class CoupleP(Pattern):
    """CouplePattern.scala:37-64."""

    def __init__(self, left, right, func):
        self.left = left
        self.right = right
        self.func = func  # (Result, Result) -> Result

    def initial_state(self):
        return (self.left.initial_state(), PQueue(), self.right.initial_state(), PQueue())

    def apply(self, state, queue, events):
        ls, lq, rs, rq = state
        nls, nlq = self.left.apply(ls, lq, events)
        nrs, nrq = self.right.apply(rs, rq, events)
        first, second, total = nlq, nrq, queue
        while True:
            h1, h2 = first.head(), second.head()
            if h1 is None or h2 is None:
                break
            if h1.start == h2.start:
                result = self.func(h1.value, h2.value)
                min_end = min(h1.end, h2.end)
                ns = min_end + 1
                first.rewind_to(ns)
                second.rewind_to(ns)
                total.enqueue(IdxValue(h1.start, min_end, result))
            else:
                cut_to = max(h1.start, h2.start)
                first.rewind_to(cut_to)
                second.rewind_to(cut_to)
        return (nls, first, nrs, second), total


class AndThenP(Pattern):
    """AndThenPattern.scala:42-94."""

    def __init__(self, first, second):
        self.first = first
        self.second = second

    def initial_state(self):
        return (self.first.initial_state(), PQueue(), self.second.initial_state(), PQueue())

    def apply(self, state, queue, events):
        fs, fq, ss, sq = state
        nfs, nfq = self.first.apply(fs, fq, events)
        nss, nsq = self.second.apply(ss, sq, events)
        first, second, total = nfq, nsq, queue
        while True:
            h1, h2 = first.head(), second.head()
            if h1 is None or h2 is None:
                break
            start1, end1, v1 = h1.start, h1.end, h1.value
            start2, end2, v2 = h2.start, h2.end, h2.value
            if v1 is FAIL:
                first.behead()
                unwind_while(second, lambda x: x.end <= start1)
                total.enqueue(IdxValue(start1, end1, FAIL))
            elif v2 is FAIL:
                if first.size == 1:
                    first.rewind_to(end2 + 1)
                    second.behead()
                    total.enqueue(IdxValue(start1, end2, FAIL))
                else:
                    second.behead()
            else:
                if start1 > end2:  # late second
                    second.behead()
                    total.enqueue(IdxValue(start2, end2, FAIL))
                elif end1 + 1 < start2:  # gap
                    first.behead()
                    total.enqueue(IdxValue(start1, end1, FAIL))
                else:  # intersect -> union
                    end = max(end1 + 1, end2)
                    start = min(start1, start2)
                    total.enqueue(IdxValue(start, end, Succ((start, end))))
                    first.rewind_to(end + 1)
                    second.rewind_to(end + 1)
        return (nfs, first, nss, second), total


class ReduceP(Pattern):
    """ReducePattern.scala:38-71."""

    def __init__(self, patterns, func, transform, filter_cond, initial):
        self.patterns = patterns
        self.func = func  # (Result_acc, value) -> Result
        self.transform = transform  # Result -> Result
        self.filter_cond = filter_cond  # Result -> bool
        self.initial = initial  # Result

    def initial_state(self):
        return [(p.initial_state(), PQueue()) for p in self.patterns]

    def apply(self, state, queue, events):
        outs = [p.apply(s, q, events) for p, (s, q) in zip(self.patterns, state)]
        queues = [q for _, q in outs]
        result = queue
        while True:
            heads = [q.head() for q in queues]
            if any(h is None for h in heads):
                break
            common_start = max(h.start for h in heads)
            common_end = min(h.end for h in heads)
            values = [h.value for h in heads]
            for q in queues:
                q.rewind_to(common_end + 1)
            if common_end >= common_start:
                acc = self.initial
                for v in values:
                    if self.filter_cond(v):
                        if v is FAIL:
                            acc = FAIL
                        else:
                            acc = self.func(acc, v.v)
                result.enqueue(IdxValue(common_start, common_end, self.transform(acc)))
        return [(o[0], q) for o, q in zip(outs, queues)], result


class SegmentizerP(Pattern):
    """SegmentizerPattern.scala — merge consecutive equal-valued results."""

    def __init__(self, inner):
        self.inner = inner

    def initial_state(self):
        return (self.inner.initial_state(), PQueue())

    def apply(self, state, queue, events):
        istate, iqueue = state
        nis, niq = self.inner.apply(istate, iqueue, events)
        r = niq.dequeue_opt()
        if r is None:
            return (nis, niq), queue
        head, tail = r
        last = head
        while True:
            n = tail.dequeue_opt()
            if n is None:
                break
            nh, tail = n
            same = (nh.value is FAIL and last.value is FAIL) or (
                nh.value is not FAIL and last.value is not FAIL and nh.value == last.value
            )
            if same:
                last = IdxValue(last.start, nh.end, last.value)
            else:
                queue.enqueue(last)
                last = nh
        queue.enqueue(last)
        return (nis, PQueue()), queue


class AccumP(Pattern):
    """AccumPattern.scala framework. astate must implement
    updated(window, times_deque, idx_value) -> (astate, PQueue)."""

    window = MAX_WINDOW

    def __init__(self, inner):
        self.inner = inner

    def make_astate(self):
        raise NotImplementedError

    def initial_state(self):
        return (self.inner.initial_state(), PQueue(), self.make_astate(), deque())

    def apply(self, state, queue, events):
        istate, iqueue, astate, itmap = state
        for e in events:
            itmap.append((e.idx, e.ms))
        nis, niq = self.inner.apply(istate, iqueue, events)
        while True:
            r = niq.dequeue_opt()
            if r is None:
                break
            iv, niq = r
            _, rewound = split_at_idx(itmap, iv.start)
            times_for_value, itmap = split_at_idx(rewound, iv.end, margin_to_first=True)
            astate, results = astate.updated(self.window, times_for_value, iv)
            spill(results, queue)
        return (nis, niq, astate, itmap), queue


class TimestampsAdderP(AccumP):
    """TimestampsAdderPattern.scala — IdxValue -> Segment(times.head, times.last)."""

    class _AState:
        def updated(self, window, times, iv):
            if not times:
                return self, PQueue()
            seg = (times[0][1], times[-1][1])
            return TimestampsAdderP._AState(), PQueue([iv.map(lambda _v: Succ(seg))])

    def make_astate(self):
        return TimestampsAdderP._AState()


class TimerP(AccumP):
    """TimerPattern.scala."""

    def __init__(self, inner, window_ms, events_max_gap_ms):
        super().__init__(inner)
        self.window = window_ms
        self.gap = events_max_gap_ms

    class _AState:
        def __init__(self, gap, wq=None, last_end=(0, 0), last_value=FAIL):
            self.gap = gap
            self.wq = wq if wq is not None else deque()
            self.last_end = last_end  # (idx, ms)
            self.last_value = last_value

        def updated(self, window, times, iv):
            if iv.value is FAIL:
                wq2 = deque(self.wq)
                while wq2 and wq2[0][0] <= self.last_end[0]:
                    wq2.popleft()
                opt_start = wq2[0] if wq2 else (times[0] if times else None)
                opt_end = times[-1] if times else None
                head_ms = times[0][1] if times else -(1 << 62)
                ok = not (
                    self.last_value is FAIL
                    or head_ms < _wrap64(self.last_end[1] + window)
                )
                value = Succ(True) if ok else FAIL
                out = PQueue()
                if opt_start is not None and opt_end is not None:
                    out.enqueue(IdxValue(opt_start[0], opt_end[0], value))
                return TimerP._AState(self.gap, deque(), times[-1] if times else self.last_end, FAIL), out
            start_ms = _wrap64(times[0][1] + window)
            end_ms = times[-1][1]
            wq = self.wq
            last_in_old_queue = wq[-1][1] if wq else MAX_WINDOW
            for t in times:
                wq.append(t)

            def can_output(t_ms):
                return (
                    window != MAX_WINDOW
                    or t_ms < last_in_old_queue
                    or _wrap64(last_in_old_queue + self.gap) < start_ms
                )

            fail_outputs, cleaned = take_while_deque(
                wq, lambda it: it[1] < start_ms and can_output(it[1])
            )
            outputs, updated_wq = take_while_deque(
                cleaned, lambda it: _wrap64(it[1] + window) <= end_ms and can_output(it[1])
            )
            if not cleaned and times and times[0][1] - self.last_end[1] < self.gap:
                updated_wq.extend(fail_outputs)
                return TimerP._AState(self.gap, updated_wq, times[-1], iv.value), PQueue()
            out = PQueue()
            if fail_outputs:
                out.enqueue(IdxValue(fail_outputs[0][0], fail_outputs[-1][0], FAIL))
            # windowQueueWithNewPoints is the SAME mutable deque as
            # updated_wq after both splits (takeWhileFromQueue mutates), so
            # the .headOption fallback reads the post-split queue head.
            succ_start = outputs[0] if outputs else (updated_wq[0] if updated_wq else None)
            if succ_start is not None:
                out.enqueue(IdxValue(succ_start[0], iv.end, Succ(True)))
            return TimerP._AState(self.gap, updated_wq, times[-1] if times else self.last_end, iv.value), out

    def make_astate(self):
        return TimerP._AState(self.gap)


class WaitP(AccumP):
    """WaitPattern.scala."""

    def __init__(self, inner, window_ms):
        super().__init__(inner)
        self.window = window_ms

    class _AState:
        def __init__(self, wq=None, last_fail=False, last_time=(0, 0)):
            self.wq = wq if wq is not None else deque()
            self.last_fail = last_fail
            self.last_time = last_time

        def updated(self, window, times, iv):
            if not times or iv.end < iv.start:
                return self, PQueue()
            start = times[0][1] - window if self.last_fail else times[0][1]
            end = times[-1][1] - window if iv.value is FAIL else times[-1][1]
            wq = self.wq
            for t in times:
                wq.append(t)
            while len(wq) > 1 and wq[1][1] < start:
                wq.popleft()
            outputs, updated_wq = take_while_deque(wq, lambda it: it[1] <= end)
            if (
                self.last_time[1] != 0
                and outputs
                and outputs[0][1] + window <= outputs[-1][1]
            ):
                wait_start = outputs[0]
            else:
                wait_start = updated_wq[-1] if updated_wq else self.last_time
            wait_end = outputs[-1] if outputs else None
            out = PQueue()
            if wait_start is not None and wait_end is not None and wait_start[0] <= wait_end[0]:
                out.enqueue(IdxValue(wait_start[0], wait_end[0], iv.value))
            return WaitP._AState(updated_wq, iv.value is FAIL, times[-1]), out

    def make_astate(self):
        return WaitP._AState()


@dataclass
class WSResult:
    idx: int
    ms: int
    last_was_success: bool
    success_count: int
    success_millis: int
    fail_count: int
    fail_millis: int

    @property
    def total_millis(self):
        return self.success_millis + self.fail_millis


@dataclass
class WSQueueInstance:
    idx: int
    ms: int
    is_success: bool
    succ_from_prev: int = 0
    fail_from_prev: int = 0


class WindowStatisticP(AccumP):
    """WindowStatistic.scala."""

    def __init__(self, inner, window_ms):
        super().__init__(inner)
        self.window = window_ms

    class _AState:
        def __init__(self, last_value=None, wq=None):
            self.last_value = last_value
            self.wq = wq if wq is not None else deque()

        def updated(self, window, times, iv):
            is_success = iv.value is not FAIL
            out = PQueue()
            lv, wq = self.last_value, self.wq
            for idx, ms in times:
                lv, wq, out = self._add_one(ms, idx, window, is_success, lv, wq, out)
            return WindowStatisticP._AState(lv, wq), out

        @staticmethod
        def _add_one(ms, idx, window, is_success, last_value, wq, out):
            if last_value is not None:
                elem = WSQueueInstance(
                    idx=idx,
                    ms=ms,
                    is_success=is_success,
                    succ_from_prev=(ms - last_value.ms) if last_value.last_was_success else 0,
                    fail_from_prev=(ms - last_value.ms) if not last_value.last_was_success else 0,
                )
                nlv = WSResult(
                    idx=last_value.idx,
                    ms=ms,
                    last_was_success=is_success,
                    success_count=last_value.success_count + (1 if elem.is_success else 0),
                    success_millis=last_value.success_millis + min(elem.succ_from_prev, window),
                    fail_count=last_value.fail_count + (0 if elem.is_success else 1),
                    fail_millis=last_value.fail_millis + min(elem.fail_from_prev, window),
                )
            else:
                nlv = WSResult(idx, ms, is_success, 1 if is_success else 0, 0, 0 if is_success else 1, 0)
                elem = WSQueueInstance(idx, ms, is_success)
            outputs, wq = take_while_deque(wq, lambda e: e.ms + window < ms)
            for e in outputs:
                past = nlv.ms - e.ms
                max_change = max(0, window - past)
                nlv = WSResult(
                    idx=nlv.idx,
                    ms=nlv.ms,
                    last_was_success=nlv.last_was_success,
                    success_count=nlv.success_count - (1 if e.is_success else 0),
                    success_millis=nlv.success_millis - min(max_change, e.succ_from_prev),
                    fail_count=nlv.fail_count - (0 if e.is_success else 1),
                    fail_millis=nlv.fail_millis - min(max_change, e.fail_from_prev),
                )
            corrected = nlv
            if wq:
                h = wq[0]
                max_change_time = window - (nlv.ms - h.ms)
                succ_corr = 0 if h.succ_from_prev == 0 else h.succ_from_prev - max_change_time
                fail_corr = 0 if h.fail_from_prev == 0 else h.fail_from_prev - max_change_time
                corrected = WSResult(
                    idx=nlv.idx,
                    ms=nlv.ms,
                    last_was_success=nlv.last_was_success,
                    success_count=nlv.success_count,
                    success_millis=nlv.success_millis - succ_corr,
                    fail_count=nlv.fail_count,
                    fail_millis=nlv.fail_millis - fail_corr,
                )
            wq.append(elem)
            out.enqueue(IdxValue(idx, idx, Succ(corrected)))
            return corrected, wq, out

    def make_astate(self):
        return WindowStatisticP._AState()


class GroupP(AccumP):
    """GroupPattern.scala — O(1) sliding sum/count; half-open (t-w, t] window."""

    def __init__(self, inner, window_ms):
        super().__init__(inner)
        self.window = window_ms

    class _AState:
        def __init__(self, last_value=None, wq=None):
            self.last_value = last_value  # (sum, count) | None
            self.wq = wq if wq is not None else deque()

        def updated(self, window, times, iv):
            out = PQueue()
            lv, wq = self.last_value, self.wq
            for idx, ms in times:
                if iv.value is FAIL:
                    continue
                t = iv.value.v
                if lv is None:
                    lv = (t, 1)
                else:
                    lv = (lv[0] + t, lv[1] + 1)
                outputs, wq = take_while_deque(wq, lambda e: e[1] + window <= ms)
                for _eidx, _ems, ev in outputs:
                    lv = (lv[0] - ev, lv[1] - 1)
                wq.append((idx, ms, t))
                out.enqueue(IdxValue(idx, idx, Succ(lv)))
            return GroupP._AState(lv, wq), out

    def make_astate(self):
        return GroupP._AState()


class PreviousValueP(AccumP):
    """PreviousValue.scala — value actual as of (t - window)."""

    def __init__(self, inner, window_ms):
        super().__init__(inner)
        self.window = window_ms

    class _AState:
        def __init__(self, queue=None):
            self.queue = queue if queue is not None else PQueue()

        def updated(self, window, times, iv):
            out = PQueue()
            q = self.queue
            for idx, ms in times:
                new_value = None
                while True:
                    h = q.head()
                    if h is None:
                        break
                    if h.value is FAIL:
                        q.behead()
                        continue
                    t_ms, result = h.value.v
                    if t_ms + window <= ms:
                        new_value = result
                        q.behead()
                    else:
                        break
                q.enqueue(IdxValue(idx, idx, res_map(iv.value, lambda v: Succ((ms, v)))))
                if new_value is not None:
                    out.enqueue(IdxValue(idx, idx, Succ(new_value)))
            return PreviousValueP._AState(q), out

    def make_astate(self):
        return PreviousValueP._AState()


# ------------------------------------------------------------- optimizer

def optimize(p):
    """Optimizer.scala:45-82 fusion rules, to fixpoint (cap 10)."""
    for _ in range(10):
        p2, changed = _opt(p)
        p = p2
        if not changed:
            break
    return p


def _opt(p):
    changed = False

    def rec(x):
        nonlocal changed
        y, ch = _opt(x)
        changed = changed or ch
        return y

    if isinstance(p, CoupleP):
        left, right, fn = rec(p.left), rec(p.right), p.func
        if isinstance(left, ConstP) and isinstance(right, ConstP):
            return ConstP(fn(left.value, right.value)), True
        if isinstance(left, SimpleP) and isinstance(right, SimpleP):
            lf, rf = left.f, right.f
            return SimpleP(lambda e, lf=lf, rf=rf, fn=fn: fn(lf(e), rf(e))), True
        if isinstance(left, SimpleP) and isinstance(right, ConstP):
            lf, rv = left.f, right.value
            return SimpleP(lambda e, lf=lf, rv=rv, fn=fn: fn(lf(e), rv)), True
        if isinstance(left, ConstP) and isinstance(right, SimpleP):
            lv, rf = left.value, right.f
            return SimpleP(lambda e, lv=lv, rf=rf, fn=fn: fn(lv, rf(e))), True
        if isinstance(right, ConstP):
            rv = right.value
            return MapP(left, lambda t, rv=rv, fn=fn: fn(Succ(t), rv)), True
        if isinstance(left, ConstP):
            lv = left.value
            return MapP(right, lambda t, lv=lv, fn=fn: fn(lv, Succ(t))), True
        return CoupleP(left, right, fn), changed
    if isinstance(p, MapP):
        inner, fn = rec(p.inner), p.func
        if isinstance(inner, ConstP):
            return ConstP(res_map(inner.value, fn)), True
        if isinstance(inner, SimpleP):
            inf = inner.f
            return SimpleP(lambda e, inf=inf, fn=fn: res_map(inf(e), fn)), True
        if isinstance(inner, MapP):
            ifn, iin = inner.func, inner.inner
            return MapP(iin, lambda t, ifn=ifn, fn=fn: _chain(ifn, fn, t)), True
        return MapP(inner, fn), changed
    if isinstance(p, AndThenP):
        return AndThenP(rec(p.first), rec(p.second)), changed
    if isinstance(p, ReduceP):
        return (
            ReduceP([rec(x) for x in p.patterns], p.func, p.transform, p.filter_cond, p.initial),
            changed,
        )
    if isinstance(p, SegmentizerP):
        q = SegmentizerP(rec(p.inner))
        return q, changed
    if isinstance(p, AccumP):
        inner = rec(p.inner)
        q = type(p).__new__(type(p))
        q.__dict__.update(p.__dict__)
        q.inner = inner
        return q, changed
    return p, changed


def _chain(ifn, fn, t):
    r = ifn(t)
    return FAIL if r is FAIL else fn(r.v)


# ------------------------------------------------- function semantics

def _tot_cmp(a, b):
    """Java total-order compare for doubles; plain compare otherwise."""
    if isinstance(a, float) or isinstance(b, float):
        a, b = float(a), float(b)
        an, bn = math.isnan(a), math.isnan(b)
        if an and bn:
            return 0
        if an:
            return 1
        if bn:
            return -1
    return (a > b) - (a < b)


def lift2(op):
    def f(x, y):
        if x is FAIL or y is FAIL:
            return FAIL
        return Succ(op(x.v, y.v))

    return f


def lift1(op):
    def f(x):
        return Succ(op(x))

    return f


def _ieee_cmp(op):
    """IEEE NaN comparisons (golden-era semantics, docs/SEMANTICS.md §3:
    `!=` true on NaN, every other comparison false). NB the *current*
    reference code would total-order NaN via Scala's default
    `Ordering[Double]`; the golden fixtures pin IEEE, which is what the
    Spark engine implements — the oracle follows the engine here."""

    def f(a, b):
        if isinstance(a, float) and math.isnan(a) or isinstance(b, float) and math.isnan(b):
            return op == "ne"
        c = (a > b) - (a < b)
        return {"lt": c < 0, "le": c <= 0, "gt": c > 0, "ge": c >= 0, "eq": c == 0, "ne": c != 0}[op]

    return lift2(f)


def _jvm_arith(name, a, b):
    """JVM arithmetic (r14 §20, matches registry/_jvm_arith in all
    three engines): Long add/sub/mul wrap mod 2^64
    (Numeric[Long], FunctionRegistry.scala:538-551), Long division is
    exact truncation toward zero (fractionalLong.div = x / y) with
    Long.MIN / -1 wrapping (JLS 15.17.2); Long /0 is the engine's
    pinned Double.toLong saturation (the reference throws
    ArithmeticException there). Double division: x/0 → ±Inf by the
    dividend's sign, 0/0 → NaN."""
    both_int = isinstance(a, int) and isinstance(b, int)
    if name == "add":
        return _wrap64(a + b) if both_int else a + b
    if name == "sub":
        return _wrap64(a - b) if both_int else a - b
    if name == "mul":
        return _wrap64(a * b) if both_int else a * b
    if both_int:
        if b == 0:
            return 0 if a == 0 else ((1 << 63) - 1 if a > 0 else -(1 << 63))
        q = abs(a) // abs(b)
        if (a < 0) != (b < 0):
            q = -q
        return _wrap64(q)
    if b == 0:
        return math.copysign(math.inf, a) if a else math.nan
    return a / b


_BIN = {
    # 2-arg sigmoid extension: 1/(1+exp(-2·k·v)) with k the SECOND arg
    # (registry.py default_registry sigmoid builder)
    "sigmoid": lift2(lambda v, k: 1.0 / (1.0 + _safe_exp(-2.0 * k * v))),
    "add": lift2(lambda a, b: _jvm_arith("add", a, b)),
    "sub": lift2(lambda a, b: _jvm_arith("sub", a, b)),
    "mul": lift2(lambda a, b: _jvm_arith("mul", a, b)),
    "div": lift2(lambda a, b: _jvm_arith("div", a, b)),
    **{op: _ieee_cmp(op) for op in ("lt", "le", "gt", "ge", "eq", "ne")},
}


def _logical(sym, x, y):
    """FunctionRegistry.scala:278-324 (Fail-tolerant or)."""
    if x is not FAIL and y is not FAIL:
        a, b = bool(x.v), bool(y.v)
        return Succ(
            {"and": a and b, "or": a or b, "xor": a != b, "eq": a == b, "neq": a != b}[sym]
        )
    if x is not FAIL and y is FAIL:
        return Succ(x.v) if sym == "or" else FAIL
    if x is FAIL and y is not FAIL:
        return Succ(y.v) if sym == "or" else FAIL
    return FAIL


def _cot(t: float) -> float:
    # JVM 1.0 / tan(x): Scala Double division by ±0.0 is ±Inf — the
    # bare Python `1.0 / math.tan(v)` would raise ZeroDivisionError at
    # an exact zero, a port bug vs the Scala semantics (r14 §20)
    return math.copysign(math.inf, t) if t == 0.0 else 1.0 / t


def _safe_exp(x: float) -> float:
    try:
        return math.exp(x)
    except OverflowError:
        return math.inf


def _jvm_ln(x: float, base10: bool = False) -> float:
    # JVM Math.log/log10 edges (r14 §20): ±0 → -Inf, negative → NaN
    if math.isnan(x):
        return math.nan
    if x == 0:
        return -math.inf
    if x < 0:
        return math.nan
    if math.isinf(x):
        return math.inf
    return math.log10(x) if base10 else math.log(x)


_UNARY = {
    "abs": lambda v: _wrap64(abs(v)) if isinstance(v, int) else abs(v),
    "sin": math.sin,
    "cos": math.cos,
    "tan": math.tan,
    "tg": math.tan,
    "cot": lambda v: _cot(math.tan(v)),
    "ctg": lambda v: _cot(math.tan(v)),
    "sind": lambda v: math.sin(math.radians(v)),
    "cosd": lambda v: math.cos(math.radians(v)),
    "tand": lambda v: math.tan(math.radians(v)),
    "tgd": lambda v: math.tan(math.radians(v)),
    "cotd": lambda v: _cot(math.tan(math.radians(v))),
    "ctgd": lambda v: _cot(math.tan(math.radians(v))),
    # the documented-but-unimplemented extensions (registry r14 §20 —
    # JVM libm edges; engine/kernels/oracle all share these rules).
    # NB transcendental INTERIOR values are libm-vs-JVM 1-ulp
    # territory; fuzz thresholds sit away from attainable boundaries,
    # and the pinned EDGES (±0, negatives, ±Inf, NaN) are exact.
    "exp": _safe_exp,
    "ln": _jvm_ln,
    "log": lambda v: _jvm_ln(v, base10=True),
    "sqrt": lambda v: math.nan if v < 0 else math.sqrt(v),
    "sigmoid": lambda v: 1.0 / (1.0 + _safe_exp(-2.0 * v)),
}

def _jvm_min(a: float, x: float) -> float:
    # Math.min PROPAGATES NaN (FunctionRegistry.scala:473-485) —
    # Python's min(a, x) is order-dependent and silently IGNORED a NaN
    # second argument, which made the oracle drop NULL-float reducer
    # args the engine correctly poisons (r14, caught by the un-cond'ed
    # minOf/maxOf fuzz rows: 23/40 cases diverged)
    return math.nan if (math.isnan(a) or math.isnan(x)) else min(a, x)


def _jvm_max(a: float, x: float) -> float:
    return math.nan if (math.isnan(a) or math.isnan(x)) else max(a, x)


_DBL_MAX = 1.7976931348623157e308

_REDUCERS = {
    # name -> (fold(acc_value, x) , initial, transform(Result)->Result)
    # initials are the reference's TYPED values (ReducePattern.scala:60,
    # scala Double.MinValue = -MaxValue — NOT ±Inf, and NOT Java's
    # subnormal Double.MIN_VALUE)
    "sumof": (lambda a, x: a + x, 0.0, lambda r: r),
    "minof": (_jvm_min, _DBL_MAX, lambda r: r),
    "maxof": (_jvm_max, -_DBL_MAX, lambda r: r),
    "countof": (lambda a, x: a + 1, 0.0, lambda r: r),
}


# ---------------------------------------------------------- generator

def _assert_result(b):
    return Succ(b) if bool(b) else FAIL


class OracleGenerator:
    """ASTPatternGenerator.scala:47-200, over tsp_spark.dsl.ast nodes.

    The reference grammar inserts Assert at trilean *factor* positions
    (ASTBuilder.scala:73: ``booleanExpr ~> Assert``); my parser keeps raw
    boolean ASTs, so the generator re-inserts asserts where the grammar
    would have: top level, andThen sides, trilean and/or/xor operands,
    Timer / ForWithInterval / Until inners.
    """

    def __init__(self, fields: dict[str, str], events_max_gap_ms: int = 60000):
        self.fields = {k.lower(): (k, v) for k, v in fields.items()}
        self.gap = events_max_gap_ms

    def build(self, node):
        return TimestampsAdderP(SegmentizerP(optimize(self.gen_trilean(node))))

    # -- trilean layer -------------------------------------------------
    def _is_trilean(self, node) -> bool:
        from tsp_spark.dsl import ast as A

        if isinstance(node, (A.AndThen, A.Timer, A.Wait, A.ForWithInterval, A.Until, A.Assert)):
            return True
        if isinstance(node, A.FunctionCall) and node.name in ("and", "or", "xor"):
            return any(self._is_trilean(a) for a in node.args)
        return False

    def gen_trilean(self, node):
        from tsp_spark.dsl import ast as A

        if (
            isinstance(node, A.FunctionCall)
            and node.name in ("and", "or", "xor")
            and self._is_trilean(node)
        ):
            left = self.gen_trilean(node.args[0])
            right = self.gen_trilean(node.args[1])
            return CoupleP(left, right, lambda x, y, n=node.name: _logical(n, x, y))
        if self._is_trilean(node):
            return self.gen(node)
        return MapP(self.gen(node), _assert_result)

    def _assert_gen(self, node):
        """Assert(X) at a trilean-factor position (bool or nested trilean)."""
        inner = self.gen_trilean(node) if self._is_trilean(node) else self.gen(node)
        return MapP(inner, _assert_result)

    def gen(self, node):
        from tsp_spark.dsl import ast as A

        if isinstance(node, A.Assert):
            inner = self.gen(node.inner)
            return MapP(inner, lambda b: Succ(b) if bool(b) else FAIL)
        if isinstance(node, A.Constant):
            v = node.value
            if isinstance(v, bool):
                return ConstP(Succ(v))
            return ConstP(Succ(float(v) if isinstance(v, (int, float)) else v))
        if isinstance(node, A.Identifier):
            name = node.name
            key, dtype = self.fields.get(name.lower(), (name, "float64"))
            if dtype == "string":
                def f(e, key=key):
                    v = e.row.get(key)
                    return Succ("[NULL]" if v is None else str(v))
            else:
                def f(e, key=key):
                    v = e.row.get(key)
                    return Succ(math.nan if v is None else float(v))
            return SimpleP(f)
        if isinstance(node, A.Cast):
            inner = self.gen(node.inner)
            t = node.dtype
            if t == "boolean":
                return MapP(inner, lambda v: Succ(_to_bool(v)))
            if t in ("int8", "int16", "int32", "int64"):
                # decodeToInt is Scala's `d.toInt` (BasicDecoders.scala:
                # 89-91): NaN → 0, floats saturate, ints narrow — plain
                # int() raised on NaN (r14, caught by the lag-cast fuzz
                # rows; same JVM conversion as the engine kernels)
                from tsp_spark.streaming.stateful import _jvm_int

                return MapP(inner, lambda v, t=t: Succ(_jvm_int(v, t)))
            if t == "string":
                return MapP(inner, lambda v: Succ(str(v)))
            return MapP(inner, lambda v: Succ(float(v)))
        if isinstance(node, A.FunctionCall):
            name = node.name
            if len(node.args) == 1:
                inner = self.gen(node.args[0])
                if name == "not":
                    return MapP(inner, lambda v: Succ(not bool(v)))
                op = _UNARY[name]
                return MapP(inner, lambda v, op=op: Succ(op(v)))
            if len(node.args) == 2:
                left, right = self.gen(node.args[0]), self.gen(node.args[1])
                if name in ("and", "or", "xor"):
                    return CoupleP(left, right, lambda x, y, n=name: _logical(n, x, y))
                fn = _BIN[name]
                return CoupleP(left, right, fn)
            raise ValueError(f"3+ arg function {name}")
        if isinstance(node, A.ReducerCall):
            pats = [self.gen(a) for a in node.args]
            cond = self._reducer_cond(node.cond)
            if node.name == "avgof":
                def fold(acc_res, x):
                    if acc_res is FAIL:
                        return FAIL
                    s, c = acc_res.v
                    return Succ((s + x, c + 1))

                def transform(r):
                    if r is FAIL:
                        return FAIL
                    s, c = r.v
                    return Succ(s / c if c else math.nan)

                return ReduceP(pats, fold, transform, cond, Succ((0.0, 0.0)))
            op, init, transform = _REDUCERS[node.name]

            def fold2(acc_res, x, op=op):
                if acc_res is FAIL:
                    return FAIL
                return Succ(op(acc_res.v, x))

            return ReduceP(pats, fold2, transform, cond, Succ(init))
        if isinstance(node, A.AggregateCall):
            inner = self.gen(node.inner)
            if node.kind == "lag":
                w = node.window_ms if node.window_ms > 0 else 1
                return SegmentizerP(PreviousValueP(inner, w))
            if node.kind in ("avg", "sum", "count"):
                gp = GroupP(inner, node.window_ms)
                if node.kind == "sum":
                    return MapP(gp, lambda sc: Succ(sc[0]))
                if node.kind == "count":
                    return MapP(gp, lambda sc: Succ(sc[1]))
                return MapP(gp, lambda sc: Succ(sc[0] / sc[1]))
            raise NotImplementedError(f"aggregate {node.kind} not in reference")
        if isinstance(node, A.AndThen):
            p = AndThenP(self.gen_trilean(node.left), self.gen_trilean(node.right))
            return MapP(p, lambda v: Succ(True))
        if isinstance(node, A.Timer):
            return TimerP(self._assert_gen(node.inner), node.window_ms, self.gap)
        if isinstance(node, A.Until):
            timed = TimerP(self._assert_gen(node.left), MAX_WINDOW, self.gap)
            not_b = self._assert_gen(A.FunctionCall("not", (node.right,)))
            return CoupleP(timed, not_b, lambda x, y: _logical("and", x, y))
        if isinstance(node, A.Wait):
            return WaitP(self.gen_trilean(node.inner), node.window_ms)
        if isinstance(node, A.ForWithInterval):
            ws = WindowStatisticP(self._assert_gen(node.inner), node.window_ms)
            lo = node.lo if node.lo is not None else 0
            hi = node.hi if node.hi is not None else math.inf
            window_ms = node.window_ms
            if node.kind == "time":
                exactly = node.exactly or hi < window_ms
            else:
                exactly = node.exactly or hi != math.inf

            def check(stats: WSResult):
                window_ended = (not exactly) or stats.total_millis >= window_ms
                metric = stats.success_count if node.kind == "times" else stats.success_millis
                if lo <= metric <= hi and window_ended:
                    return Succ(True)
                return FAIL

            return MapP(ws, check)
        raise ValueError(f"Unhandled oracle AST node {node!r}")

    def _reducer_cond(self, cond_ast):
        if cond_ast is None:
            return lambda r: True
        from tsp_spark.dsl import ast as A

        def evaluate(node, x):
            if isinstance(node, A.Identifier) and node.name == "_":
                return Succ(x)
            if isinstance(node, A.Constant):
                return Succ(float(node.value) if isinstance(node.value, (int, float)) else node.value)
            if isinstance(node, A.FunctionCall):
                args = [evaluate(a, x) for a in node.args]
                if len(args) == 1:
                    if node.name == "not":
                        return res_map(args[0], lambda v: Succ(not bool(v)))
                    return res_map(args[0], lambda v: Succ(_UNARY[node.name](v)))
                if node.name in ("and", "or", "xor"):
                    return _logical(node.name, args[0], args[1])
                return _BIN[node.name](args[0], args[1])
            raise ValueError(f"bad reducer cond node {node!r}")

        def cond(r):
            v = r.v if r is not FAIL else math.nan
            got = evaluate(cond_ast, v)
            return got is not FAIL and bool(got.v)

        return cond


def _to_bool(v):
    if v in (0, 0.0, "0", "false", "off", "no", False):
        return False
    if v in (1, 1.0, "1", "true", "on", "yes", True):
        return True
    raise ValueError(f"cannot cast {v!r} to boolean")


# ------------------------------------------------------------- pipeline

def split_by_condition(elements, pred):
    """PatternProcessor.splitByCondition."""
    if len(elements) < 2:
        return [list(elements)]
    out = [[elements[0]]]
    for prev, cur in zip(elements, elements[1:]):
        if pred(cur, prev):
            out.append([cur])
        else:
            out[-1].append(cur)
    return out


def run_key_series(
    pattern: Pattern,
    rows: list[tuple[int, dict]],  # (ms, row) in source order
    events_max_gap_ms: int = 60000,
    chunk_size_ms: int = 900000,
    group_size: int = 100000,
):
    """PatternProcessor + ProcessorCombinator for one partition key.

    Returns [(from_ms, to_ms)] segments for Succ results."""
    rows = sorted(rows, key=lambda r: r[0])  # stable, like ProcessorCombinator
    # groupAdjacentBy(ts / chunkSize)
    chunks: list[list[tuple[int, dict]]] = []
    for ms, row in rows:
        k = ms // chunk_size_ms
        if chunks and chunks[-1][0][0] // chunk_size_ms == k:
            chunks[-1].append((ms, row))
        else:
            chunks.append([(ms, row)])
    segments: list[tuple[int, int]] = []

    def consume(iv: IdxValue):
        if iv.value is not FAIL:
            segments.append(iv.value.v)

    counter = 0
    last_state = None
    last_time = 0
    for chunk in chunks:
        events = []
        for ms, row in chunk:
            counter += 1
            events.append(Ev(counter, ms, row))
        if last_state is None or events[0].ms - last_time > events_max_gap_ms:
            last_state = pattern.initial_state()
        sequences = split_by_condition(
            events, lambda nxt, prv: nxt.ms - prv.ms > events_max_gap_ms
        )
        for i, seq in enumerate(sequences):
            state = last_state if i == 0 else pattern.initial_state()
            for g in range(0, len(seq), group_size):
                state, out_q = pattern.apply(state, PQueue(), seq[g : g + group_size])
                for iv in out_q.to_seq():
                    consume(iv)
            last_state = state
        last_time = events[-1].ms
    return segments


def reduce_incidents(segments: list[tuple[int, int]], session_gap_ms: int):
    """PatternsSearchJob.reduceIncidents — merge adjacent when
    next.from - prev.to <= gap (union)."""
    out: list[list[int]] = []
    for frm, to in segments:
        if out and frm - out[-1][1] <= session_gap_ms:
            out[-1][0] = min(out[-1][0], frm)
            out[-1][1] = max(out[-1][1], to)
        else:
            out.append([frm, to])
    return [(a, b) for a, b in out]


def sparse_accumulate(
    rows: list[tuple[int, dict]],
    *,
    key_column: str | None,
    value_column: str | None,
    sensors: list[str],
    default_timeout_ms: int,
    field_timeouts: dict[str, int] | None = None,
    value_col_mapping: dict[str, list[str]] | None = None,
    ts_field: str = "ts",
) -> list[tuple[int, dict]]:
    """SparseRowsDataAccumulator.scala — per-key narrow unfolding
    (key_column set) or wide forward-filling (key_column None), with
    per-field timeouts; emits one row per distinct timestamp plus the
    trailing last event."""
    timeouts = {s: default_timeout_ms for s in sensors}
    timeouts.update(field_timeouts or {})
    mapping = {}
    for col, keys in (value_col_mapping or {}).items():
        for k in keys:
            mapping[k] = col
    acc: dict[str, tuple[object, int]] = {}
    out: list[tuple[int, dict]] = []
    last_ms = None
    last_event = None
    for ms, row in rows:
        if key_column is not None:  # narrow unfolding
            k = row.get(key_column)
            v = row.get(mapping.get(k, value_column))
            if acc.get(k, (None, 0))[0] is None or v is not None:
                acc[k] = (v, ms)
        else:  # wide filling
            for k in sensors:
                nv = row.get(k)
                if nv is not None or k not in acc:
                    acc[k] = (nv, ms)
        for k in list(acc):
            if ms - acc[k][1] >= timeouts.get(k, default_timeout_ms):
                del acc[k]
        built = {s: None for s in sensors}
        for k, (v, _t) in acc.items():
            if k in built:
                built[k] = v
        for k, v in row.items():
            if k not in (key_column, value_column) and k not in built and v is not None:
                built[k] = v
        if key_column is None:
            # wide filling: current non-null values override accumulated
            for k in sensors:
                if row.get(k) is not None:
                    built[k] = row[k]
        if last_ms is not None and ms != last_ms and last_event is not None:
            out.append(last_event)
        last_ms = ms
        last_event = (ms, built)
    if last_event is not None:
        out.append(last_event)
    return out


def run_pattern(
    source_code: str,
    rows_by_key: dict[tuple, list[tuple[int, dict]]],
    fields: dict[str, str],
    events_max_gap_ms: int = 60000,
    chunk_size_ms: int = 900000,
    session_gap_ms: int = 1000,
    group_size: int = 100000,
) -> list[tuple[int, int]]:
    """End-to-end: parse + compile + run over keyed rows; returns merged
    (from_ms, to_ms) incidents across all keys, sorted."""
    from tsp_spark.dsl.parser import parse_pattern

    node = parse_pattern(source_code, fields, tolerance_fraction=0.0)
    gen = OracleGenerator(fields, events_max_gap_ms)
    incidents: list[tuple[int, int]] = []
    for _key, rows in rows_by_key.items():
        pattern = gen.build(node)
        segs = run_key_series(pattern, rows, events_max_gap_ms, chunk_size_ms, group_size)
        incidents.extend(reduce_incidents(segs, session_gap_ms))
    return sorted(incidents)
