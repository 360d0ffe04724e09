"""Stateful streaming island detection vs the batch islands kernel."""

from __future__ import annotations

import shutil
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from tsp_spark.ops.islands import islands
from tsp_spark.streaming.stateful import stateful_islands

GAP_MS = 15_000


@pytest.mark.slow
def test_stateful_islands_matches_batch(spark, events_small, mk_ts):
    cond = F.col("value") > 150
    src = events_small.withColumn("cond", cond)
    batch = {
        (r["user_id"], r["from_ts"], r["to_ts"], r["n_rows"])
        for r in islands(src, ["user_id"], "ts", F.col("cond"), max_gap_ms=GAP_MS).collect()
    }
    assert batch

    src_dir = tempfile.mkdtemp(prefix="tsp_state_src")
    chk = tempfile.mkdtemp(prefix="tsp_state_chk")
    try:
        # chronological single-file drop, then a far-future flush row per
        # key so the watermark passes every real island's timeout
        src.coalesce(1).write.parquet(f"{src_dir}/b0")
        flush = spark.createDataFrame(
            [(u, mk_ts(10_000 + u), 0.0, "ok", False) for u in (1, 2, 3)],
            src.schema,
        )
        stream = (
            spark.readStream.schema(src.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src_dir}/*")
        )
        out = stateful_islands(
            stream, ["user_id"], "ts", "cond", max_gap_ms=GAP_MS,
            watermark_delay="1 second",
        )
        got: set = set()
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("stateful_islands_t")
            .option("checkpointLocation", chk)
            .start()
        )
        q.processAllAvailable()
        flush.coalesce(1).write.mode("append").parquet(f"{src_dir}/b1")
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            got = {
                (r["user_id"], r["from_ts"], r["to_ts"], r["n_rows"])
                for r in spark.sql("SELECT * FROM stateful_islands_t").collect()
            }
            if batch <= got:
                break
            time.sleep(0.5)
        q.stop()
        assert batch <= got, f"missing {sorted(batch - got)[:5]}"
        # and nothing spurious
        assert got <= batch, f"spurious {sorted(got - batch)[:5]}"
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(chk, ignore_errors=True)
