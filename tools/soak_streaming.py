"""Streaming soak: N rows through the carry-buffer streaming mode
(`incidents_stream`) with injected mid-soak driver crashes, asserting
EXACT end-to-end parity with the batch engine.

What it proves (r8, VERDICT task 5):
* sustained operation over many micro-batches (rows/s, carry-size
  curve — the numbers land in docs/SCALE.md);
* the r8 crash-replay fix under load: each injected crash happens in
  the worst window — AFTER `_save_carry(batch N)` durably wrote the
  new carry generation but BEFORE Structured Streaming committed
  batch N's offsets — so the restarted query MUST re-evaluate the
  replayed batch against the PRIOR carry generation or window counts
  corrupt;
* the documented sink contract end to end: emissions are
  at-least-once with deterministic values; the sink-side
  `sessionize_intervals` over everything emitted (including boundary
  partials later extended, and crash re-emissions) must equal the
  batch result EXACTLY — not just a superset.

Usage: python tools/soak_streaming.py [--rows N] [--drops D]
       [--users K] [--crashes i,j] [--graceful g]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

PATTERNS = [
    (1, "value > 150 for 30 sec"),
    # truth-count window: the duplication-sensitive family (doubled
    # rows inside one evaluation frame double the count and corrupt
    # from/to) — the shape that catches a bad crash replay
    (2, "value > 100 for 60 sec > 45 times"),
]
FIELDS = {"value": "float64"}
KEYS = ["user_id"]


def gen_rows(n: int, users: int, skew: bool = False) -> pd.DataFrame:
    """Deterministic keyed series: per-user 1 Hz square waves with
    per-user period (20..79 s — some runs satisfy the 30 s timer and
    the 46-truth count, some don't), a per-user millisecond phase so
    (key, ts) is globally unique, ~1% nulls.

    ``skew=True``: user 0 carries ~50% of all rows and the rest share
    the other half — the hot-key shape that stresses the island
    kernel's single keyed exchange (one task owns half the data
    unless AQE skew-join/partition splitting engages)."""
    if skew:
        hot = n // 2
        rest = (n - hot) // (users - 1)
        counts = np.array([hot] + [rest] * (users - 1), dtype=np.int64)
    else:
        counts = np.full(users, n // users, dtype=np.int64)
    u = np.repeat(np.arange(users, dtype=np.int64), counts)
    k = np.concatenate(
        [np.arange(c, dtype=np.int64) for c in counts]
    )
    period = 20 + (u * 13) % 60  # 20..79 s per user
    high = (k // period) % 3 == 0
    value = np.where(high, 160.0, 90.0) + (k % 7) * 0.5
    value[k % 97 == 0] = np.nan
    ms = k * 1000 + u * 7
    ts = np.datetime64("2024-01-01T00:00:00") + ms.astype("timedelta64[ms]")
    df = pd.DataFrame({"user_id": u, "ts": ts, "value": value})
    df["value"] = df["value"].astype("float64")
    return df.sort_values("ts", ignore_index=True)


def run_soak(
    spark,
    rows: int = 10_000_000,
    drops: int = 25,
    users: int = 100,
    crash_batches: tuple[int, ...] = (7, 16),
    graceful_stop: int | None = 12,
    workdir: str | None = None,
    skew: bool = False,
) -> dict:
    from pyspark.sql import functions as F

    from tsp_spark.api import RawPattern, search_incidents
    from tsp_spark.ops.sessionize import sessionize_intervals
    from tsp_spark.streaming.job import StreamingPatternJob, incidents_stream
    import tsp_spark.streaming.job as jobmod

    patterns = [RawPattern(pid, src) for pid, src in PATTERNS]
    base = Path(workdir or tempfile.mkdtemp(prefix="tsp_soak"))
    src_dir, chk_dir = base / "src", base / "chk"
    own_tmp = workdir is None
    try:
        pdf = gen_rows(rows, users, skew=skew)
        full = spark.createDataFrame(pdf)

        # batch reference (sessionized incidents — the exact contract)
        batch = {
            (r["pattern_id"], r["user_id"], r["from_ts"], r["to_ts"])
            for r in search_incidents(
                full, patterns, KEYS, "ts", fields_types=FIELDS
            ).collect()
        }

        # chronological drops, one file each → one micro-batch each
        cuts = np.linspace(0, len(pdf), drops + 1).astype(int)
        for d in range(drops):
            spark.createDataFrame(
                pdf.iloc[cuts[d]:cuts[d + 1]]
            ).coalesce(1).write.parquet(str(src_dir / f"b{d:03d}"))

        emitted: list[tuple] = []
        carry_curve: list[dict] = []
        crash_left = set(crash_batches)
        real_save = jobmod._save_carry

        def save_probe(tail, carry_root, batch_id):
            real_save(tail, carry_root, batch_id)
            fs, root, _ = jobmod._hadoop_fs(tail.sparkSession, f"{carry_root}/{batch_id}")
            size = fs.getContentSummary(root).getLength()
            carry_curve.append(
                {"batch": int(batch_id), "carry_rows": tail.count(),
                 "carry_bytes": int(size)}
            )
            if batch_id in crash_left:
                crash_left.discard(batch_id)
                raise RuntimeError(
                    f"injected crash after carry save, batch {batch_id}"
                )

        jobmod._save_carry = save_probe

        def sink(df, bid):
            emitted.extend(
                (r["pattern_id"], r["user_id"], r["from_ts"], r["to_ts"])
                for r in df.collect()
            )

        def mk_query():
            stream = (
                spark.readStream.schema(full.schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(f"{src_dir}/*")
            )
            job = StreamingPatternJob(patterns, KEYS, "ts", fields_types=FIELDS)
            return incidents_stream(
                stream, job, sink=sink,
                checkpoint_dir=str(chk_dir), trigger_seconds=0.2,
            )

        t0 = time.perf_counter()
        restarts = 0
        graceful_done = graceful_stop is None
        q = mk_query()
        deadline = time.time() + 600
        idle = 0
        last_n_curve = -1
        while time.time() < deadline:
            time.sleep(0.3)
            if q.exception() is not None:
                # injected crash surfaced: the query died after the
                # carry save, before the offset commit — restart from
                # the same checkpoint (the failed batch replays with
                # the SAME batch id)
                q.stop()
                restarts += 1
                idle = 0
                q = mk_query()
                continue
            lastb = carry_curve[-1]["batch"] if carry_curve else -1
            if not graceful_done and lastb >= graceful_stop:
                q.stop()  # plain mid-soak driver restart (no crash)
                graceful_done = True
                restarts += 1
                idle = 0
                q = mk_query()
                continue
            if not crash_left and graceful_done and lastb >= drops - 1:
                q.processAllAvailable()  # drain the tail
                break
            # secondary exit: the batch-id fast path above can stall on
            # rare file-listing races; once the crashes and the
            # graceful restart are done and the query has been idle
            # (no new carry generations) for ~15 s, drain and let the
            # downstream exact-match assertion be the judge instead of
            # spinning to the wall deadline
            n_curve = len(carry_curve)
            idle = idle + 1 if (not crash_left and graceful_done) else 0
            if n_curve != last_n_curve:
                last_n_curve = n_curve
                idle = 0
            if idle >= 50:
                q.processAllAvailable()
                break
        q.stop()
        elapsed = time.perf_counter() - t0
        jobmod._save_carry = real_save

        # sink contract: sessionize EVERYTHING emitted (partials,
        # re-emissions) and demand exact batch equality
        got_df = spark.createDataFrame(
            emitted,
            "pattern_id int, user_id bigint, from_ts timestamp, to_ts timestamp",
        ).withColumn("subunit", F.lit(0))
        merged = sessionize_intervals(
            got_df, ["pattern_id", "subunit", "user_id"], gap_ms=2_000
        )
        got = {
            (r["pattern_id"], r["user_id"], r["from_ts"], r["to_ts"])
            for r in merged.collect()
        }
        missing = batch - got
        spurious = got - batch
        return {
            "rows": rows,
            "drops": drops,
            "users": users,
            "batch_incidents": len(batch),
            "stream_incidents": len(got),
            "raw_emissions": len(emitted),
            "missing": sorted(missing)[:5],
            "spurious": sorted(spurious)[:5],
            "exact_match": not missing and not spurious,
            "restarts": restarts,
            "injected_crashes": len(crash_batches) - len(crash_left),
            "elapsed_sec": round(elapsed, 1),
            "rows_per_sec": int(rows / elapsed),
            "carry_curve": carry_curve,
        }
    finally:
        jobmod._save_carry = real_save
        if own_tmp:
            shutil.rmtree(base, ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--drops", type=int, default=25)
    ap.add_argument("--users", type=int, default=100)
    ap.add_argument("--crashes", default="7,16")
    ap.add_argument("--graceful", type=int, default=12)
    ap.add_argument(
        "--skew", action="store_true",
        help="user 0 carries ~50%% of all rows (hot-key stress on the "
        "island kernel's keyed exchange)",
    )
    ap.add_argument(
        "--mode", choices=("carry", "stateful"), default="carry",
        help="carry = foreachBatch carry-buffer mode; stateful = the "
        "incremental applyInPandasWithState kernel (the SCALE.md "
        "274k rows/s soak)",
    )
    args = ap.parse_args()

    from tsp_spark.session import get_spark

    spark = get_spark("tsp_soak")
    spark.sparkContext.setLogLevel("ERROR")
    crash = tuple(int(x) for x in args.crashes.split(",") if x)
    if args.mode == "stateful":
        res = run_soak_stateful(
            spark,
            rows=args.rows,
            drops=args.drops,
            users=args.users,
            crash_batches=crash,
            graceful_after=args.graceful,
            skew=args.skew,
        )
        print(json.dumps(res, default=str, indent=2))
        return 0 if res["exact_match"] else 1
    res = run_soak(
        spark,
        rows=args.rows,
        drops=args.drops,
        users=args.users,
        crash_batches=crash,
        graceful_stop=args.graceful,
        skew=args.skew,
    )
    curve = res.pop("carry_curve")
    print(json.dumps(res, default=str, indent=2))
    print("carry curve (batch, rows, bytes):")
    for c in curve:
        print(f"  {c['batch']:4d}  {c['carry_rows']:8d}  {c['carry_bytes']:10d}")
    return 0 if res["exact_match"] else 1


def run_soak_stateful(
    spark,
    rows: int = 10_000_000,
    drops: int = 25,
    users: int = 100,
    crash_batches: tuple[int, ...] = (7, 16),
    graceful_after: int = 10,
    workdir: str | None = None,
    skew: bool = False,
) -> dict:
    """Same soak contract for the OTHER streaming mode: the
    true-incremental `stateful_incidents` kernel
    (applyInPandasWithState). Two injected sink crashes AFTER the
    batch's rows were collected but BEFORE the streaming commit (the
    batch replays against the state store's last committed version —
    exactly the window that corrupts if state versioning is wrong)
    plus one graceful stop/restart; a far-future flush drop drains the
    trailing windows. Sink-side sessionize over every at-least-once
    emission must equal the batch engine EXACTLY."""
    import pandas as _pd
    from pyspark.sql import functions as F

    from tsp_spark.api import RawPattern, search_incidents
    from tsp_spark.ops.sessionize import sessionize_intervals
    from tsp_spark.streaming.job import StreamingPatternJob, stateful_incidents

    patterns = [RawPattern(pid, src) for pid, src in PATTERNS]
    base = Path(workdir or tempfile.mkdtemp(prefix="tsp_soak_st"))
    src_dir, chk_dir = base / "src", base / "chk"
    own_tmp = workdir is None
    try:
        pdf = gen_rows(rows, users, skew=skew)
        # flush rows: one far-future 0-valued row per user (gap-splits
        # every series so the kernel drains trailing runs); part of the
        # batch reference too, so the comparison is apples-to-apples
        last_ts = pdf["ts"].max()
        flush = _pd.DataFrame(
            {
                "user_id": np.arange(users, dtype=np.int64),
                "ts": last_ts + np.full(users, 10**9, dtype="timedelta64[ms]"),
                "value": np.zeros(users),
            }
        )
        all_pdf = _pd.concat([pdf, flush], ignore_index=True)
        full = spark.createDataFrame(all_pdf)
        batch = {
            (r["pattern_id"], r["user_id"], r["from_ts"], r["to_ts"])
            for r in search_incidents(
                full, patterns, KEYS, "ts", fields_types=FIELDS
            ).collect()
        }

        cuts = np.linspace(0, len(pdf), drops + 1).astype(int)
        for d in range(drops):
            spark.createDataFrame(
                pdf.iloc[cuts[d]:cuts[d + 1]]
            ).coalesce(1).write.parquet(str(src_dir / f"b{d:03d}"))
        spark.createDataFrame(flush).coalesce(1).write.parquet(
            str(src_dir / f"b{drops:03d}")
        )

        emitted: list[tuple] = []
        seen_batches: set[int] = set()
        crash_left = set(crash_batches)

        def sink(df, bid):
            emitted.extend(
                (r["pattern_id"], r["user_id"], r["from_ts"], r["to_ts"])
                for r in df.collect()
            )
            seen_batches.add(int(bid))
            if bid in crash_left:
                crash_left.discard(bid)
                raise RuntimeError(
                    f"injected crash after sink, before commit, batch {bid}"
                )

        job = StreamingPatternJob(
            patterns, KEYS, "ts", fields_types=FIELDS,
            watermark_delay="5 seconds",
        )

        def mk_query():
            stream = (
                spark.readStream.schema(full.schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(f"{src_dir}/*")
            )
            return (
                stateful_incidents(stream, job)
                .writeStream.outputMode("append")
                .foreachBatch(sink)
                .option("checkpointLocation", str(chk_dir))
                .trigger(processingTime="0.2 seconds")
                .start()
            )

        t0 = time.perf_counter()
        restarts = 0
        graceful_done = False
        q = mk_query()
        deadline = time.time() + 600
        while time.time() < deadline:
            try:
                q.processAllAvailable()
                if not graceful_done and len(seen_batches) >= graceful_after:
                    q.stop()
                    graceful_done = True
                    restarts += 1
                    q = mk_query()
                    continue
                if not crash_left and graceful_done:
                    break  # everything available processed, no crash due
            except Exception:
                q.stop()
                restarts += 1
                q = mk_query()
        q.stop()
        elapsed = time.perf_counter() - t0

        got_df = spark.createDataFrame(
            emitted,
            "pattern_id int, user_id bigint, from_ts timestamp, to_ts timestamp",
        ).withColumn("subunit", F.lit(0))
        merged = sessionize_intervals(
            got_df, ["pattern_id", "subunit", "user_id"], gap_ms=2_000
        )
        got = {
            (r["pattern_id"], r["user_id"], r["from_ts"], r["to_ts"])
            for r in merged.collect()
        }
        state_bytes = sum(
            f.stat().st_size for f in (chk_dir / "state").rglob("*") if f.is_file()
        ) if (chk_dir / "state").exists() else 0
        missing, spurious = batch - got, got - batch
        return {
            "mode": "stateful",
            "rows": rows,
            "drops": drops,
            "users": users,
            "batch_incidents": len(batch),
            "stream_incidents": len(got),
            "raw_emissions": len(emitted),
            "missing": sorted(missing)[:5],
            "spurious": sorted(spurious)[:5],
            "exact_match": not missing and not spurious,
            "restarts": restarts,
            "injected_crashes": len(crash_batches) - len(crash_left),
            "elapsed_sec": round(elapsed, 1),
            "rows_per_sec": int(rows / elapsed),
            "state_store_bytes": state_bytes,
        }
    finally:
        if own_tmp:
            shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
