"""Physical-layout helpers shared by the pipeline operators."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


# Only sources the planner estimates BELOW this ever get re-spread:
# the pathology being fixed is a small compressed file whose byte-based
# split sizing (maxPartitionBytes / openCostInBytes) collapses a
# CPU-heavy per-row pipeline onto 1-2 tasks. A source big enough to
# exceed this is already split wide by bytes, and re-shuffling it here
# would move real data for nothing.
SPREAD_MAX_BYTES = int(os.environ.get("TSP_SPREAD_MAX_BYTES", str(1 << 30)))


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Raise map-side parallelism of a CPU-heavy per-row stage whose
    source scan collapsed to far fewer tasks than the session has slots
    (guide §2.5 input skew / §6 split sizing: byte-based split sizing
    is blind to per-row CPU — a 0.6 MB compressed corpus file scans as
    ONE task, serializing tokenize/hash pipelines that cost seconds of
    CPU while 31 cores idle).

    Scale-adaptive, not a local[32] constant: the target is the
    session's ``defaultParallelism`` and the repartition only fires
    when the scan has less than half that many partitions AND the
    planner sizes the source under ``SPREAD_MAX_BYTES`` — at 100 TB a
    corpus scan has thousands of splits and this is a no-op; on an
    unknown-size source it is also a no-op (a re-shuffle there could
    move arbitrary bytes).
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n_parts = df.rdd.getNumPartitions()
    except Exception:  # non-queryable plan (e.g. streaming) — leave it
        return df
    if n_parts * 2 >= target:
        return df
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return df
    if size > SPREAD_MAX_BYTES:
        return df
    return df.repartition(target)
