"""Training-shard writer: deterministic, size-targeted, atomically
committed parquet shards for training-data delivery.

Training jobs consume fixed shard lists (one reader task per shard,
stable across epochs and restarts), so the writer must guarantee:

* **Deterministic assignment** — shard(row) = pmod(xxhash64(key), n)
  depends only on the key and the shard count, never on partitioning,
  task order, or cluster size. Re-running the writer on the same
  input produces byte-stable shard membership and in-shard order.
* **One file per shard** — rows are repartitioned BY the shard column
  (all rows of a shard land in exactly one task) before a
  ``partitionBy("shard")`` write, so each ``shard=N`` directory holds
  exactly one parquet file. Empty shards simply don't exist on disk
  (the manifest is the authority for the expected set).
* **Atomic commit** — data, then ``manifest.json``, then the
  ``_COMMITTED`` marker LAST (same generation protocol as the IVF
  index, `pipeline/similarity.py ivf_build_index`, and the streaming
  near-dup compactor, `pipeline/dedup.py _compact_index`). Readers
  refuse an uncommitted directory, so a writer crash can never hand a
  torn dataset to a training run.
* **Verifiable content** — the manifest records per-shard row counts
  and an order-independent ``bit_xor(xxhash64(*columns))`` content
  checksum; ``read_training_shards(validate=True)`` recomputes both
  and fails loudly on any mismatch. (XOR cancels PAIRS of identical
  full rows — a dataset of exact duplicate rows should be deduped
  before sharding anyway; the row counts catch cardinality damage.)

Scale notes: the only full pass beyond the write itself is an
optional ``count()`` when ``target_rows`` sizes the shard count (a
columnar metadata-only scan on parquet sources) and the manifest
aggregation (map-side-combined groupBy on the 8-byte shard key).
The shard exchange is the same single shuffle any bucketed write
pays. No driver-side row iteration — the manifest collect is
``n_shards`` rows, bounded and small by construction.
"""

from __future__ import annotations

import json
import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SHARD_COL = "shard"


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p


def _write_text(spark: SparkSession, path: str, body: str) -> None:
    fs, p = _fs_and_path(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(body.encode("utf-8")))
    finally:
        out.close()


def _read_text(spark: SparkSession, path: str) -> str:
    # wholetext goes through the same Hadoop FS as the writer, so this
    # works on object stores, not just the local fs
    return spark.read.text(path, wholetext=True).head()[0]


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    key_col: str,
    n_shards: int | None = None,
    target_rows: int | None = None,
    order_cols: list[str] | None = None,
    overwrite: bool = False,
) -> dict:
    """Write ``df`` as deterministic parquet training shards under
    ``path`` and return the manifest.

    Exactly one of ``n_shards`` / ``target_rows`` must be given;
    ``target_rows`` derives ``n_shards = ceil(count / target_rows)``
    with one extra counting pass. ``order_cols`` fixes the in-shard
    row order (the key is always the final tiebreaker, so the layout
    is total and reproducible).

    An already-committed ``path`` is returned as-is when
    ``overwrite=False`` (idempotent re-run, the replay-safe default);
    ``overwrite=True`` revokes the marker FIRST, then rewrites — a
    crash mid-rewrite leaves the directory visibly uncommitted rather
    than torn."""
    spark = df.sparkSession
    if (n_shards is None) == (target_rows is None):
        raise ValueError("pass exactly one of n_shards / target_rows")
    if key_col not in df.columns:
        raise ValueError(f"key_col {key_col!r} not in {df.columns}")
    if _SHARD_COL in df.columns:
        raise ValueError(f"input already has a {_SHARD_COL!r} column")

    fs, marker = _fs_and_path(spark, f"{path}/_COMMITTED")
    if fs.exists(marker):
        if not overwrite:
            return json.loads(_read_text(spark, f"{path}/manifest.json"))
        fs.delete(marker, False)

    if target_rows is not None:
        if target_rows < 1:
            raise ValueError(f"target_rows must be >= 1, got {target_rows}")
        n_shards = max(1, math.ceil(df.count() / target_rows))
    assert n_shards is not None
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")

    order = list(order_cols or [])
    sharded = df.withColumn(
        _SHARD_COL, F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards))
    )
    (
        sharded.repartition(n_shards, F.col(_SHARD_COL))
        .sortWithinPartitions(_SHARD_COL, *order, key_col)
        .write.mode("overwrite")
        .partitionBy(_SHARD_COL)
        .parquet(f"{path}/data")
    )

    # manifest stats come from READING BACK the written artifact, not
    # from re-executing the input lineage: a nondeterministic or
    # since-changed upstream (rand-derived columns, a re-listed source
    # dir) would otherwise commit a manifest describing data that was
    # never written — and at 100 TB the re-execution would also double
    # the pipeline cost. An empty input writes no parquet files; the
    # schema recorded in the manifest keeps the commit readable.
    data_fs, data_path = _fs_and_path(spark, f"{path}/data")
    has_files = data_fs.exists(data_path) and any(
        not st.getPath().getName().startswith("_")
        for st in data_fs.listStatus(data_path)
    )
    if has_files:
        written = spark.read.parquet(f"{path}/data")
        stats = (
            written.groupBy(_SHARD_COL)
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.bit_xor(
                    F.xxhash64(*[F.col(c) for c in df.columns])
                ).alias("checksum"),
            )
            .collect()
        )
    else:
        stats = []
    manifest = {
        "n_shards": n_shards,
        "total_rows": int(sum(r["rows"] for r in stats)),
        "key_col": key_col,
        "order_cols": order,
        "columns": df.columns,
        "schema": json.loads(df.schema.json()),
        "shards": {
            str(r[_SHARD_COL]): {
                "rows": int(r["rows"]),
                "checksum": int(r["checksum"]),
            }
            for r in sorted(stats, key=lambda r: r[_SHARD_COL])
        },
    }
    _write_text(
        spark, f"{path}/manifest.json", json.dumps(manifest, indent=1)
    )
    _write_text(spark, f"{path}/_COMMITTED", "")
    return manifest


def read_training_shards(
    spark: SparkSession, path: str, *, validate: bool = False
) -> DataFrame:
    """Read a committed shard directory. Refuses an uncommitted (torn)
    write. ``validate=True`` recomputes per-shard row counts and
    content checksums against the manifest — one extra pass, worth it
    at training-launch time."""
    fs, marker = _fs_and_path(spark, f"{path}/_COMMITTED")
    if not fs.exists(marker):
        raise ValueError(
            f"{path} has no _COMMITTED marker — torn or in-flight write"
        )
    manifest = json.loads(_read_text(spark, f"{path}/manifest.json"))
    if manifest["total_rows"] == 0:
        # a legitimately-empty commit has no parquet files; rebuild
        # the frame from the recorded schema (plus the shard column a
        # partitioned read would surface)
        from pyspark.sql.types import IntegerType, StructType

        schema = StructType.fromJson(manifest["schema"]).add(
            _SHARD_COL, IntegerType()
        )
        return spark.createDataFrame([], schema)
    df = spark.read.parquet(f"{path}/data")
    if validate:
        data_cols = [c for c in df.columns if c != _SHARD_COL]
        if data_cols != manifest["columns"]:
            raise ValueError(
                f"column drift: manifest {manifest['columns']} "
                f"!= data {data_cols}"
            )
        got = {
            str(r[_SHARD_COL]): (int(r["rows"]), int(r["checksum"]))
            for r in df.groupBy(_SHARD_COL)
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.bit_xor(
                    F.xxhash64(*[F.col(c) for c in data_cols])
                ).alias("checksum"),
            )
            .collect()
        }
        want = {
            s: (m["rows"], m["checksum"])
            for s, m in manifest["shards"].items()
        }
        if got != want:
            bad = sorted(
                set(got.items()) ^ set(want.items()),
                key=lambda kv: int(kv[0]),
            )
            raise ValueError(f"shard validation failed: {bad[:4]}")
    return df


def stream_training_shards(
    stream_df: DataFrame,
    path: str,
    *,
    key_col: str,
    n_shards: int,
    order_cols: list[str] | None = None,
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
):
    """Deliver a document STREAM as training shards: each micro-batch
    commits one GENERATION ``<path>/gen=<batch_id>/`` through
    ``write_training_shards`` — data, manifest, ``_COMMITTED`` marker
    last. Crash-replay idempotent for free: a replayed batch re-enters
    ``write_training_shards``, which returns the existing manifest for
    a committed generation and cleanly rewrites an uncommitted (torn)
    one; generation content is deterministic from the batch, so the
    rewrite is identical. Returns the started StreamingQuery.

    A trainer consumes the union of COMMITTED generations
    (``read_training_generations``) — a torn generation is invisible,
    exactly like the IVF index and the near-dup compactor."""

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        write_training_shards(
            batch_df,
            f"{path}/gen={batch_id}",
            key_col=key_col,
            n_shards=n_shards,
            order_cols=order_cols,
        )

    writer = stream_df.writeStream.foreachBatch(_write_batch)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_training_generations(
    spark: SparkSession, path: str, *, validate: bool = False
) -> DataFrame:
    """Union of all COMMITTED shard generations under ``path``, with a
    ``gen`` column. Uncommitted (in-flight or torn) generations are
    skipped — never surfaced to a training run."""
    fs, p = _fs_and_path(spark, path)
    if not fs.exists(p):
        raise ValueError(f"{path} does not exist")
    gens = sorted(
        int(st.getPath().getName().split("=", 1)[1])
        for st in fs.listStatus(p)
        if st.isDirectory()
        and st.getPath().getName().startswith("gen=")
        and fs.exists(
            st.getPath().suffix("/_COMMITTED")  # noqa: B009 — hadoop Path
        )
    )
    if not gens:
        raise ValueError(f"{path}: no committed generations")
    parts = []
    for g in gens:
        part = read_training_shards(
            spark, f"{path}/gen={g}", validate=validate
        )
        parts.append(part.withColumn("gen", F.lit(g)))
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out
