"""True incremental streaming island detection with per-key state.

The carry-buffer mode (streaming/job.py) re-evaluates a bounded window
of history per micro-batch — simple, one code path with batch. This
module is the genuinely *incremental* alternative for the island kernel
(the engine's core primitive): per-key state holds only the open run
(run-start, last-event time/value), exactly like the reference's
per-key state machines (PatternProcessor.scala:23-59), via
``applyInPandasWithState``.

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
