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
time-lag) are rejected toward the carry-buffer mode.

State encoding: each machine serializes to a list[int] (epoch millis
and indices; -1 encodes None), one ArrayType(LongType) struct field per
pattern — no raw history is ever retained.
"""

from __future__ import annotations

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


@dataclass
class PatternSpec:
    """One pattern routed into the multi kernel."""

    pattern_id: int
    subunit: int
    sm: object  # _IslandSM | _TimerSM | _AndThenSM
    cond_cols: list[str]


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
                    st = list(got[1 + i])
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
            sts = [list(got[1 + i]) for i in range(len(specs))]
        else:
            last = None
            sts = [spec.sm.init() for spec in specs]

        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(ts)
        for _, row in rows.iterrows():
            ms = int(row[ts].value // 1_000_000)
            gap_split = last is not None and ms - last > max_gap_ms
            for i, spec in enumerate(specs):
                conds = []
                for c in spec.cond_cols:
                    v = row[c]
                    conds.append((not pd.isna(v)) and bool(v))
                if isinstance(spec.sm, _AndThenSM):
                    sts[i], items = spec.sm.step(sts[i], ms, conds, gap_split, last)
                else:
                    sts[i], items = spec.sm.step(sts[i], ms, conds, gap_split)
                emit(spec, items)
            last = ms

        state.update((last, *sts))
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
    """Compile a DSL pattern into (stream + cond columns, PatternSpec)
    for the multi kernel. Raises ValueError for patterns that need
    windowed sub-expressions — those run in the carry-buffer mode
    (streaming/job.py), which re-evaluates bounded history instead of
    holding per-key state."""
    from tsp_spark.compile.compiler import PatternCompiler
    from tsp_spark.dsl import ast as A
    from tsp_spark.dsl.parser import parse_pattern

    node = (
        parse_pattern(pattern, fields_types or {})
        if isinstance(pattern, str)
        else pattern
    )
    comp = PatternCompiler(keys, ts, fields_types, max_gap_ms=max_gap_ms)

    def rowcond(n) -> Column:
        c = comp.compile_bool(stream, n)
        if c.has_window or c.present is not None or c.df is not stream:
            raise ValueError(
                "pattern sub-expression needs windowed evaluation — use "
                "the carry-buffer streaming mode (streaming/job.py)"
            )
        return c.col

    pfx = f"__p{pattern_id}"
    if isinstance(node, A.AndThen):
        if isinstance(node.left, A.AndThen) or isinstance(node.right, A.AndThen):
            raise ValueError(
                "nested andThen chains are not supported by the "
                "incremental stateful kernel — use the carry-buffer "
                "streaming mode (streaming/job.py), which evaluates the "
                "full batch compiler over bounded history"
            )
        s = stream.withColumn(f"{pfx}a", rowcond(node.left)).withColumn(
            f"{pfx}b", rowcond(node.right)
        )
        return s, PatternSpec(pattern_id, subunit, _AndThenSM(), [f"{pfx}a", f"{pfx}b"])
    if isinstance(node, A.Timer):
        s = stream.withColumn(f"{pfx}c", rowcond(node.inner))
        return s, PatternSpec(
            pattern_id, subunit, _TimerSM(node.window_ms), [f"{pfx}c"]
        )
    s = stream.withColumn(f"{pfx}c", rowcond(node))
    return s, PatternSpec(pattern_id, subunit, _IslandSM(), [f"{pfx}c"])


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