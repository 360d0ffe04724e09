"""True incremental streaming pattern kernels with per-key state.

The carry-buffer mode (streaming/job.py) re-evaluates a bounded window
of history per micro-batch — simple, one code path with batch. This
module is the genuinely *incremental* alternative, via
``applyInPandasWithState``, for the three pattern kernels that need
long-lived per-key state at streaming scale:

* ``stateful_islands`` — the island/RLE kernel (SimplePattern),
* ``stateful_timer``   — TimerPattern ``cond for T``,
* ``stateful_andthen`` — the AndThen sequence join.

Per-key state holds only open runs plus a bounded pending set, exactly
like the reference's per-key state machines
(PatternProcessor.scala:23-59).

Semantics match ``ops.islands`` + gap splitting:

* a run opens at the first event where ``cond`` holds;
* it closes when cond goes false, when the event-time gap exceeds
  ``max_gap_ms`` (series split, PatternProcessor.scala:33-56), or when
  the state times out past the watermark;
* closed runs are emitted as (keys…, from_ts, to_ts, n_rows).

Use when re-evaluation cost dominates (very long windows) or when
per-key state must survive arbitrarily long quiet periods without
retaining raw history. Requires event-time-ordered delivery per key
within a batch (the function sorts each batch's rows; cross-batch
late data beyond the watermark is dropped by Spark).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def stateful_islands(
    stream: DataFrame,
    keys: Sequence[str],
    ts: str,
    cond_col: str,
    max_gap_ms: int = 60_000,
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """``stream`` must carry a boolean ``cond_col``. Returns a streaming
    DataFrame of closed islands (append mode)."""
    key_fields = [stream.schema[k] for k in keys]
    out_schema = T.StructType(
        [
            *key_fields,
            T.StructField("from_ts", T.TimestampType()),
            T.StructField("to_ts", T.TimestampType()),
            T.StructField("n_rows", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("run_start_ms", T.LongType()),
            T.StructField("last_ms", T.LongType()),
            T.StructField("n_rows", T.LongType()),
        ]
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        closed: list[tuple[Any, ...]] = []
        if state.hasTimedOut:
            if state.exists:
                run_start, last, n = state.get
                closed.append((*key, run_start, last, n))
            state.remove()
            yield _to_pdf(closed, keys, out_schema)
            return
        run_start, last, n = state.get if state.exists else (None, None, 0)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(ts)
        for _, row in rows.iterrows():
            ms = int(row[ts].value // 1_000_000)  # pandas ns → ms
            gap_split = last is not None and ms - last > max_gap_ms
            if run_start is not None and (gap_split or not row[cond_col]):
                closed.append((*key, run_start, last, n))
                run_start, n = None, 0
            if bool(row[cond_col]) and (run_start is None):
                run_start, n = ms, 0
            if run_start is not None:
                n += 1
                last = ms
            else:
                last = ms
        if run_start is not None:
            state.update((run_start, last, n))
            state.setTimeoutTimestamp(last + max_gap_ms)
        elif state.exists:
            state.remove()
        yield _to_pdf(closed, keys, out_schema)

    def _to_pdf(closed, keys, schema):
        cols = [*keys, "from_ts", "to_ts", "n_rows"]
        if not closed:
            return pd.DataFrame({c: [] for c in cols})
        df = pd.DataFrame(closed, columns=cols)
        for c in ("from_ts", "to_ts"):
            df[c] = pd.to_datetime(df[c], unit="ms")
        return df

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


def stateful_timer(
    stream: DataFrame,
    keys: Sequence[str],
    ts: str,
    cond_col: str,
    window_ms: int,
    max_gap_ms: int = 60_000,
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """Incremental TimerPattern ``cond for T`` (TimerPattern.scala via
    compiler._compile_timer semantics): a run of true ``cond`` starts
    qualifying at the first event held ≥ ``window_ms``; the emitted
    interval is [first qualifying ts, run end]. State per key: the open
    run's start, the qualifying suffix start, last event time, and the
    qualifying row count — O(1), no raw history."""
    key_fields = [stream.schema[k] for k in keys]
    out_schema = T.StructType(
        [
            *key_fields,
            T.StructField("from_ts", T.TimestampType()),
            T.StructField("to_ts", T.TimestampType()),
            T.StructField("n_rows", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("run_start_ms", T.LongType()),
            T.StructField("hold_start_ms", T.LongType()),
            T.StructField("last_ms", T.LongType()),
            T.StructField("n_hold", T.LongType()),
        ]
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        closed: list[tuple[Any, ...]] = []

        def close(hold_start, last, n):
            if hold_start is not None:
                closed.append((*key, hold_start, last, n))

        if state.hasTimedOut:
            if state.exists:
                run_start, hold_start, last, n = state.get
                close(hold_start, last, n)
            state.remove()
            yield _pdf(closed, keys, ["from_ts", "to_ts", "n_rows"], ("from_ts", "to_ts"))
            return
        run_start, hold_start, last, n = (
            state.get if state.exists else (None, None, None, 0)
        )
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(ts)
        for _, row in rows.iterrows():
            ms = int(row[ts].value // 1_000_000)
            gap_split = last is not None and ms - last > max_gap_ms
            v = row[cond_col]
            cond = (not pd.isna(v)) and bool(v)
            if run_start is not None and (gap_split or not cond):
                close(hold_start, last, n)
                run_start, hold_start, n = None, None, 0
            if cond and run_start is None:
                run_start = ms
            if run_start is not None and ms - run_start >= window_ms:
                if hold_start is None:
                    hold_start, n = ms, 0
                n += 1
            last = ms
        if run_start is not None:
            state.update((run_start, hold_start, last, n))
            state.setTimeoutTimestamp(last + max_gap_ms)
        elif state.exists:
            state.remove()
        yield _pdf(closed, keys, ["from_ts", "to_ts", "n_rows"], ("from_ts", "to_ts"))

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


def stateful_andthen(
    stream: DataFrame,
    keys: Sequence[str],
    ts: str,
    cond_a_col: str,
    cond_b_col: str,
    max_gap_ms: int = 60_000,
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """Incremental AndThen sequence join (AndThenPattern.scala:69-88 via
    ops/sequence.py semantics): closed A-runs pair 1:1 with the earliest
    closed B-run satisfying ``b_si <= a_ei + 1 AND b_ei >= a_si`` within
    the same gap-delimited sub-series; a series split resets everything
    (PatternProcessor.scala:33-56). State per key: per-series row
    counter, the open A/B runs, and the pending unmatched closed runs —
    pending sets stay bounded because runs are pruned the moment no
    future counterpart can satisfy the adjacency rule."""
    key_fields = [stream.schema[k] for k in keys]
    out_schema = T.StructType(
        [
            *key_fields,
            T.StructField("from_ts", T.TimestampType()),
            T.StructField("to_ts", T.TimestampType()),
        ]
    )
    # pending A runs are (si, ei, from_ms, to_ms) 4-tuples, pending B
    # runs (si, ei, from_ms, to_ms, consumed) 5-tuples, flattened
    state_schema = T.StructType(
        [
            T.StructField("next_idx", T.LongType()),
            T.StructField("last_ms", T.LongType()),
            T.StructField("a_open", T.ArrayType(T.LongType())),  # si, from
            T.StructField("b_open", T.ArrayType(T.LongType())),
            T.StructField("pend_a", T.ArrayType(T.LongType())),
            T.StructField("pend_b", T.ArrayType(T.LongType())),
        ]
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        matched: list[tuple[Any, ...]] = []

        def unpack(flat, width):
            return [tuple(flat[i : i + width]) for i in range(0, len(flat or []), width)]

        def match(pend_a, pend_b):
            # Batch pairing (ops/sequence.py): each A pairs with its
            # EARLIEST satisfying B; if that B was already taken by an
            # earlier A, this A stays unmatched — no fallback. Closed
            # runs arrive in strictly increasing si, so consumed B's
            # must stay listed (as tombstones) until pruned, or a later
            # A would wrongly fall through to the next free B.
            out_a = []
            for a in pend_a:
                a_si, a_ei, a_from, _a_to = a
                hit = next(
                    (b for b in pend_b if b[0] <= a_ei + 1 and b[1] >= a_si), None
                )
                if hit is None:
                    out_a.append(a)  # earliest satisfying B not closed yet
                elif not hit[4]:
                    matched.append((*key, a_from, hit[3]))
                    pend_b[pend_b.index(hit)] = (*hit[:4], 1)
                # else: earliest satisfying B already consumed → A dead
            return out_a

        if state.hasTimedOut:
            if state.exists:
                next_idx, last, a_open, b_open, pa, pb = state.get
                pend_a, pend_b = unpack(pa, 4), unpack(pb, 5)
                if a_open:
                    pend_a.append((a_open[0], next_idx - 1, a_open[1], last))
                if b_open:
                    pend_b.append((b_open[0], next_idx - 1, b_open[1], last, 0))
                match(pend_a, pend_b)
            state.remove()
            yield _pdf(matched, keys, ["from_ts", "to_ts"], ("from_ts", "to_ts"))
            return

        if state.exists:
            next_idx, last, a_open, b_open, pa, pb = state.get
            a_open = tuple(a_open) if a_open else None
            b_open = tuple(b_open) if b_open else None
            pend_a, pend_b = unpack(pa, 4), unpack(pb, 5)
        else:
            next_idx, last, a_open, b_open, pend_a, pend_b = 1, None, None, None, [], []

        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(ts)
        for _, row in rows.iterrows():
            ms = int(row[ts].value // 1_000_000)
            if last is not None and ms - last > max_gap_ms:
                # series split: close opens, settle matches inside the
                # finished series, then RESET — nothing crosses the gap
                if a_open:
                    pend_a.append((a_open[0], next_idx - 1, a_open[1], last))
                if b_open:
                    pend_b.append((b_open[0], next_idx - 1, b_open[1], last, 0))
                match(pend_a, pend_b)
                next_idx, a_open, b_open, pend_a, pend_b = 1, None, None, [], []
            idx = next_idx
            next_idx += 1
            va, vb = row[cond_a_col], row[cond_b_col]
            ca = (not pd.isna(va)) and bool(va)
            cb = (not pd.isna(vb)) and bool(vb)
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
            pend_a = match(pend_a, pend_b)
            # prune dead runs: the earliest future B starts at b_open.si
            # (if open) else >= next_idx, so an A with a_ei + 1 below
            # that can never match; a B (matched tombstone or not) whose
            # b_ei precedes every possible future a_si is likewise dead
            b_floor = b_open[0] if b_open else next_idx
            pend_a = [a for a in pend_a if a[1] + 1 >= b_floor]
            a_floor = a_open[0] if a_open else next_idx
            pend_b = [b for b in pend_b if b[1] >= a_floor]
            last = ms

        flat = lambda runs: [x for r in runs for x in r]  # noqa: E731
        state.update(
            (
                next_idx,
                last,
                list(a_open) if a_open else None,
                list(b_open) if b_open else None,
                flat(pend_a),
                flat(pend_b),
            )
        )
        state.setTimeoutTimestamp(last + max_gap_ms)
        yield _pdf(matched, keys, ["from_ts", "to_ts"], ("from_ts", "to_ts"))

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


def _pdf(rows, keys, value_cols, ts_cols):
    cols = [*keys, *value_cols]
    if not rows:
        return pd.DataFrame({c: [] for c in cols})
    df = pd.DataFrame(rows, columns=cols)
    for c in ts_cols:
        df[c] = pd.to_datetime(df[c], unit="ms")
    return df


def stateful_pattern(
    stream: DataFrame,
    pattern: str,
    keys: Sequence[str],
    ts: str,
    fields_types: dict[str, str] | None = None,
    max_gap_ms: int = 60_000,
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """Route a DSL pattern to its incremental stateful kernel when
    eligible: a row-level boolean → islands, ``X for T`` over a
    row-level boolean → timer, ``A andThen B`` of two row-level
    booleans → sequence join. Raises ValueError for patterns that need
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

    def rowcond(n):
        c = comp.compile_bool(stream, n)
        if c.has_window or c.present is not None or c.df is not stream:
            raise ValueError(
                "pattern sub-expression needs windowed evaluation — use "
                "the carry-buffer streaming mode (streaming/job.py)"
            )
        return c.col

    if isinstance(node, A.AndThen) and not isinstance(node.left, A.AndThen):
        s = stream.withColumn("__ca", rowcond(node.left)).withColumn(
            "__cb", rowcond(node.right)
        )
        return stateful_andthen(
            s, keys, ts, "__ca", "__cb", max_gap_ms, watermark_delay
        )
    if isinstance(node, A.Timer):
        s = stream.withColumn("__c", rowcond(node.inner))
        return stateful_timer(
            s, keys, ts, "__c", node.window_ms, max_gap_ms, watermark_delay
        )
    s = stream.withColumn("__c", rowcond(node))
    return stateful_islands(s, keys, ts, "__c", max_gap_ms, watermark_delay)
