"""Streaming pattern search (SURVEY §2.10).

The reference's streaming path (PatternsSearchJob.scala:123-160) keys
the stream, chunks it (event-time 15-min windows for JDBC, 1-second
processing-time flushes for Kafka), runs the incremental state machines
per chunk, and sessionizes incidents.

Spark-first mapping:

* keying            → the batch compiler's `Window.partitionBy(keys)`
* late data         → `withWatermark(ts, events_max_gap_ms)` — the
                      reference has no true watermark (it sorts within
                      a chunk and splits series on >60s gaps;
                      PatternProcessor.scala:33-56)
* micro-batching    → `foreachBatch` re-running the *batch* compiler
                      over a sliding state window: each micro-batch is
                      prepended with the tail of the previous one (the
                      carry buffer) so windows/sequences spanning batch
                      boundaries are re-evaluated exactly like the
                      reference's carried state machines. Carry depth =
                      the pattern's total window sum + events_max_gap_ms
                      (PatternMetadata.sumWindowsMs analogue).
* checkpointing     → Structured Streaming checkpoints replace the
                      reference's Redis row counters
                      (CheckpointingService.scala:12-168)
* incident merge    → incidents emitted per micro-batch are sessionized
                      downstream by the sink-side `sessionize_intervals`
                      over the re-emitted overlap region; emitted
                      (pattern_id, keys, from, to) rows are idempotent
                      on replay (deterministic values), so an
                      at-least-once sink dedups on those columns.

This wraps the batch compiler rather than `transformWithStateInPandas`
because every TSP pattern is bounded-memory in *event time*: a carry
buffer of `sum(windows) + max_gap` per key is semantically complete,
and it keeps one code path for batch and streaming (the same Catalyst
plan, whole-stage codegen, no Python state server in the hot path).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsp_spark.api import RawPattern, search_incidents


@dataclass
class StreamingPatternJob:
    """Config for a streaming pattern-search job."""

    patterns: Sequence[RawPattern]
    keys: Sequence[str]
    ts: str
    fields_types: dict[str, str] | None = None
    events_max_gap_ms: int = 60_000
    session_gap_ms: int = 2_000
    # how much event-time history must be re-evaluated across batch
    # boundaries; None = auto (sum of pattern windows + max gap)
    carry_ms: int | None = None
    watermark_delay: str = "1 minute"
    # source-side reshaping (SourceDataTransformation.scala:9-24) applied
    # per micro-batch over carry+batch: a DataFrame→DataFrame callable
    # (e.g. partial(unfold_narrow, ...) or partial(forward_fill, ...));
    # its fill/timeout window must be covered by transform_window_ms so
    # the carry buffer retains enough history to re-fill correctly
    transform: Callable[[DataFrame], DataFrame] | None = None
    transform_window_ms: int = 0


def _carry_depth_ms(job: StreamingPatternJob) -> int:
    if job.carry_ms is not None:
        return job.carry_ms
    # conservative analogue of PatternMetadata.sumWindowsMs: parse-free
    # upper bound — the largest time literal mentioned in any pattern
    # source text, times 4 (for/wait/lag/avg can stack), plus the gap.
    import re

    worst = 0
    units = {"ms": 1, "sec": 1000, "seconds": 1000, "min": 60000, "minutes": 60000, "hr": 3600000, "hours": 3600000}
    for p in job.patterns:
        for num, unit in re.findall(r"(\d+(?:\.\d+)?)\s*(ms|sec|seconds|min|minutes|hr|hours)", p.source_code, re.I):
            worst = max(worst, int(float(num) * units[unit.lower()]))
    return worst * 4 + job.events_max_gap_ms + job.transform_window_ms


def incidents_stream(
    stream: DataFrame,
    job: StreamingPatternJob,
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str | None = None,
    trigger_seconds: float = 1.0,
):
    """Run the pattern set over a streaming DataFrame; call ``sink`` with
    the incident DataFrame for every micro-batch.

    Returns the StreamingQuery. The carry buffer stays distributed — a
    localCheckpoint'ed tail DataFrame (bounded: carry_ms of event time
    per key) unioned onto the next micro-batch, so windows and
    sequences spanning batch boundaries are evaluated on complete data.
    Incidents overlapping the carry region can re-emit on the next
    batch with identical values; at-least-once sinks dedup on
    (pattern_id, keys, from_ts, to_ts).
    """
    spark = stream.sparkSession
    carry_ms = _carry_depth_ms(job)
    state = {"carry": None}  # per-query carried tail (a small cached DF)

    wm = stream.withWatermark(job.ts, job.watermark_delay)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        df = batch_df
        carry = state["carry"]
        if carry is not None:
            df = carry.unionByName(batch_df)
        if not df.take(1):
            return
        searched = job.transform(df) if job.transform is not None else df
        incidents = search_incidents(
            searched,
            job.patterns,
            list(job.keys),
            job.ts,
            fields_types=job.fields_types,
            max_gap_ms=job.events_max_gap_ms,
            session_gap_ms=job.session_gap_ms,
        )
        sink(incidents, batch_id)
        # retain the event-time tail as the next batch's prefix
        hi = df.agg(F.max(F.col(job.ts)).alias("m")).collect()[0]["m"]
        if hi is not None:
            cutoff = F.lit(hi) - F.expr(f"INTERVAL {carry_ms} MILLISECONDS")
            new_carry = df.where(F.col(job.ts) >= cutoff).localCheckpoint(eager=True)
            old = state["carry"]
            state["carry"] = new_carry
            if old is not None:
                old.unpersist()

    writer = wm.writeStream.foreachBatch(process_batch).trigger(
        processingTime=f"{trigger_seconds} seconds"
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def stateful_incidents(stream: DataFrame, job: StreamingPatternJob) -> DataFrame:
    """True-incremental alternative to the carry buffer: every pattern's
    state machine runs inside ONE multi-pattern
    ``applyInPandasWithState`` kernel (streaming/stateful.py
    stateful_multi) — Spark allows a single stateful operator per
    streaming query, and the reference's topology is the same: one
    keyed stream fanned into N per-key state machines. N patterns cost
    one shuffle and one state store. The kernel is TOTAL over the
    pattern grammar (windowed sub-expressions, lag — including lag
    nested inside windowed aggregates AND inside another lag's
    lookback, the latter via speculative branch forking (r6c) — wait,
    nested andThen all run as in-kernel condition programs); the
    carry-buffer mode (``incidents_stream``) remains only as a
    user-selectable fallback.

    Scale contrast with the carry mode: no driver-coordinated per-batch
    loop, no history re-evaluation — state is O(open runs) per key.
    Incident sessionization (session_gap merge) happens sink-side
    exactly as the carry mode's per-batch re-emits do: emitted rows are
    deterministic, so an at-least-once sink dedups on
    (pattern_id, keys, from_ts, to_ts).
    """
    from tsp_spark.streaming.stateful import build_spec, stateful_multi

    cur = stream
    specs = []
    for p in job.patterns:
        cur, spec = build_spec(
            cur,
            p.source_code,
            list(job.keys),
            job.ts,
            fields_types=job.fields_types,
            max_gap_ms=job.events_max_gap_ms,
            pattern_id=p.id,
            subunit=p.subunit,
        )
        specs.append(spec)
    return stateful_multi(
        cur,
        specs,
        list(job.keys),
        job.ts,
        max_gap_ms=job.events_max_gap_ms,
        watermark_delay=job.watermark_delay,
    ).select("pattern_id", "subunit", *job.keys, "from_ts", "to_ts")
