"""Training-shard writer (tsp_spark/io/shards.py): deterministic
assignment, one file per shard, manifest integrity, atomic-commit
protocol, and validation on read."""

import json
import os

import pytest
from pyspark.sql import functions as F

from tsp_spark.io.shards import read_training_shards, write_training_shards


def _docs(spark, n=300):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("text-"), F.col("id")).alias("text"),
            (F.col("id") % 7).alias("grp"),
        )
    )


def test_write_is_deterministic_and_one_file_per_shard(spark, tmp_path):
    df = _docs(spark)
    m1 = write_training_shards(
        df, str(tmp_path / "a"), key_col="doc_id", n_shards=8
    )
    m2 = write_training_shards(
        df, str(tmp_path / "b"), key_col="doc_id", n_shards=8
    )
    # identical manifests across independent writes of the same input
    assert m1["shards"] == m2["shards"]
    assert m1["total_rows"] == 300
    assert sum(s["rows"] for s in m1["shards"].values()) == 300

    # exactly one parquet file per shard directory
    for shard_dir in (tmp_path / "a" / "data").glob("shard=*"):
        files = [
            f for f in os.listdir(shard_dir) if f.endswith(".parquet")
        ]
        assert len(files) == 1, (shard_dir, files)

    # round trip: content parity, shard column recovered from the path
    back = read_training_shards(spark, str(tmp_path / "a"), validate=True)
    assert sorted(
        (r["doc_id"], r["text"], r["grp"])
        for r in back.select("doc_id", "text", "grp").collect()
    ) == sorted(
        (r["doc_id"], r["text"], r["grp"]) for r in df.collect()
    )
    # assignment law: shard == pmod(xxhash64(key), n)
    bad = back.where(
        F.col("shard") != F.pmod(F.xxhash64(F.col("doc_id")), F.lit(8))
    ).count()
    assert bad == 0


def test_target_rows_sizes_shard_count(spark, tmp_path):
    m = write_training_shards(
        _docs(spark, 250),
        str(tmp_path / "t"),
        key_col="doc_id",
        target_rows=100,
    )
    assert m["n_shards"] == 3  # ceil(250 / 100)
    assert m["total_rows"] == 250


def test_reader_refuses_uncommitted_and_validates(spark, tmp_path):
    df = _docs(spark, 100)
    path = tmp_path / "c"
    write_training_shards(df, str(path), key_col="doc_id", n_shards=4)

    # torn write: no marker → reader refuses
    (path / "_COMMITTED").unlink()
    with pytest.raises(ValueError, match="_COMMITTED"):
        read_training_shards(spark, str(path))

    # restore, then tamper with the manifest → validate fails loudly
    (path / "_COMMITTED").touch()
    manifest = json.loads((path / "manifest.json").read_text())
    first = next(iter(manifest["shards"]))
    manifest["shards"][first]["rows"] += 1
    (path / "manifest.json").write_text(json.dumps(manifest))
    # the python-side rewrite bypassed Hadoop's checksum layer; drop
    # the stale sidecar so the read sees the tampered content
    crc = path / ".manifest.json.crc"
    if crc.exists():
        crc.unlink()
    with pytest.raises(ValueError, match="shard validation failed"):
        read_training_shards(spark, str(path), validate=True)
    # non-validating read still works (marker present)
    assert read_training_shards(spark, str(path)).count() == 100


def test_committed_rerun_is_noop_and_overwrite_rewrites(spark, tmp_path):
    path = str(tmp_path / "d")
    m1 = write_training_shards(
        _docs(spark, 100), path, key_col="doc_id", n_shards=4
    )
    # committed + overwrite=False → manifest returned, data untouched
    m2 = write_training_shards(
        _docs(spark, 999), path, key_col="doc_id", n_shards=4
    )
    assert m2 == m1
    assert read_training_shards(spark, path, validate=True).count() == 100

    # overwrite=True rewrites (and the new write is committed)
    m3 = write_training_shards(
        _docs(spark, 50), path, key_col="doc_id", n_shards=4, overwrite=True
    )
    assert m3["total_rows"] == 50
    assert read_training_shards(spark, path, validate=True).count() == 50


def test_in_shard_order_is_total_and_reproducible(spark, tmp_path):
    df = _docs(spark, 200)
    path = str(tmp_path / "e")
    write_training_shards(
        df, path, key_col="doc_id", n_shards=4, order_cols=["grp"]
    )
    back = read_training_shards(spark, path)
    # within each shard FILE, rows are (grp, doc_id)-sorted; verify by
    # reading each shard dir alone (preserves file order)
    import glob

    for shard_dir in sorted(glob.glob(f"{path}/data/shard=*")):
        rows = [
            (r["grp"], r["doc_id"])
            for r in spark.read.parquet(shard_dir).collect()
        ]
        assert rows == sorted(rows), shard_dir
    assert back.count() == 200


def test_arg_validation(spark, tmp_path):
    df = _docs(spark, 10)
    with pytest.raises(ValueError, match="exactly one"):
        write_training_shards(df, str(tmp_path / "x"), key_col="doc_id")
    with pytest.raises(ValueError, match="exactly one"):
        write_training_shards(
            df, str(tmp_path / "x"), key_col="doc_id",
            n_shards=2, target_rows=5,
        )
    with pytest.raises(ValueError, match="not in"):
        write_training_shards(
            df, str(tmp_path / "x"), key_col="nope", n_shards=2
        )
    with pytest.raises(ValueError, match="shard"):
        write_training_shards(
            df.withColumn("shard", F.lit(1)),
            str(tmp_path / "x"), key_col="doc_id", n_shards=2,
        )


def test_pack_then_shard_end_to_end(spark, tmp_path):
    """The training-data delivery chain: pack_sequences lays out the
    corpus into fixed-token packs, write_training_shards delivers the
    pack assignments as committed shards keyed by pack_id (every doc
    of one pack lands in one shard — the property a trainer needs),
    and the validated read-back reproduces the packing exactly."""
    from tsp_spark.pipeline.prep import pack_sequences

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    packed = pack_sequences(docs, "text", "doc_id", budget_tokens=512)

    path = str(tmp_path / "packs")
    manifest = write_training_shards(
        packed,
        path,
        key_col="pack_id",
        n_shards=4,
        order_cols=["start_in_pack"],
    )
    assert manifest["total_rows"] == docs.count()

    back = read_training_shards(spark, path, validate=True)
    # a pack never straddles shards: xxhash64 keying is pack-constant
    assert (
        back.groupBy("pack_id")
        .agg(F.count_distinct("shard").alias("n"))
        .where(F.col("n") > 1)
        .count()
        == 0
    )
    # exact layout parity with a fresh packing
    a = sorted(map(tuple, back.select(*packed.columns).collect()))
    b = sorted(map(tuple, packed.collect()))
    assert a == b


def test_empty_dataset_commit_is_readable(spark, tmp_path):
    """Review-caught: a zero-row write must still produce a READABLE
    commit (filters legitimately drop everything); the manifest's
    recorded schema rebuilds the empty frame."""
    df = _docs(spark, 300).where(F.col("doc_id") < 0)
    path = str(tmp_path / "empty")
    m = write_training_shards(df, path, key_col="doc_id", n_shards=4)
    assert m["total_rows"] == 0 and m["shards"] == {}

    back = read_training_shards(spark, path, validate=True)
    assert back.count() == 0
    assert [c for c in back.columns if c != "shard"] == df.columns


def test_stream_training_shards_generations(spark, tmp_path):
    """Streaming shard delivery: each micro-batch commits one
    generation; the reader unions only COMMITTED generations; a torn
    generation is invisible; a replayed batch is a no-op on a
    committed generation and cleanly completes an uncommitted one."""
    from tsp_spark.io.shards import (
        read_training_generations,
        stream_training_shards,
        write_training_shards,
    )

    rows = [(i, f"doc-{i}") for i in range(200)]
    schema = "doc_id long, text string"
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    spark.createDataFrame(rows[:100], schema).coalesce(1).write.parquet(
        str(src / "b0")
    )
    spark.createDataFrame(rows[100:], schema).coalesce(1).write.parquet(
        str(src / "b1")
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
    )
    q = stream_training_shards(
        stream, out, key_col="doc_id", n_shards=4, checkpoint=chk
    )
    assert q.awaitTermination(300), "stream did not finish"

    back = read_training_generations(spark, out, validate=True)
    assert sorted(
        (r["doc_id"], r["text"]) for r in back.collect()
    ) == sorted(rows)
    gens = sorted({r["gen"] for r in back.select("gen").collect()})
    assert gens == [0, 1]

    # replay of a committed generation: no-op (manifest returned)
    batch0 = spark.createDataFrame(rows[:100], schema)
    m = write_training_shards(
        batch0, f"{out}/gen=0", key_col="doc_id", n_shards=4
    )
    assert m["total_rows"] == 100

    # torn generation: marker removed -> invisible to the reader...
    import os

    os.remove(f"{out}/gen=1/_COMMITTED")
    vis = read_training_generations(spark, out)
    assert sorted({r["gen"] for r in vis.select("gen").collect()}) == [0]
    # ...and a replay completes it with identical content
    batch1 = spark.createDataFrame(rows[100:], schema)
    write_training_shards(
        batch1, f"{out}/gen=1", key_col="doc_id", n_shards=4
    )
    again = read_training_generations(spark, out, validate=True)
    assert sorted(
        (r["doc_id"], r["text"]) for r in again.collect()
    ) == sorted(rows)


def test_compact_training_generations(spark, tmp_path):
    """Generation compaction (r10): a stream with compact_every folds
    gens into one re-sharded compact generation; the trainer-facing
    read is row-identical (including per-row gen provenance) to the
    flat layout; superseded gen dirs are GC'd; a torn compaction is
    invisible; re-running compaction on a committed target is a no-op;
    a replayed batch recreating a GC'd gen dir is never surfaced."""
    import os

    from tsp_spark.io.shards import (
        compact_training_generations,
        read_training_generations,
        stream_training_shards,
        write_training_shards,
    )

    rows = [(i, f"doc-{i}") for i in range(300)]
    schema = "doc_id long, text string"
    src = tmp_path / "src"
    for b in range(3):
        spark.createDataFrame(
            rows[100 * b : 100 * (b + 1)], schema
        ).coalesce(1).write.parquet(str(src / f"b{b}"))

    # flat reference layout (no compaction)
    flat_out = str(tmp_path / "flat")
    q = stream_training_shards(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*"),
        flat_out,
        key_col="doc_id",
        n_shards=4,
        checkpoint=str(tmp_path / "chk_flat"),
    )
    assert q.awaitTermination(300)
    flat = sorted(
        (r["doc_id"], r["text"], r["gen"])
        for r in read_training_generations(spark, flat_out).collect()
    )

    # compacted layout: compact at batch 2 folds gens 0..2
    out = str(tmp_path / "out")
    q = stream_training_shards(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*"),
        out,
        key_col="doc_id",
        n_shards=4,
        checkpoint=str(tmp_path / "chk"),
        compact_every=2,
    )
    assert q.awaitTermination(300)

    names = sorted(os.listdir(out))
    assert "compact=2" in names
    assert not any(n.startswith("gen=") for n in names), names

    back = read_training_generations(spark, out, validate=True)
    assert sorted(
        (r["doc_id"], r["text"], r["gen"]) for r in back.collect()
    ) == flat

    # no-op on a committed target; GC idempotent
    compact_training_generations(spark, out, upto=2)
    assert sorted(
        (r["doc_id"], r["text"], r["gen"])
        for r in read_training_generations(spark, out).collect()
    ) == flat

    # a replayed batch recreating a GC'd gen dir is ignored by the read
    write_training_shards(
        spark.createDataFrame(rows[200:300], schema),
        f"{out}/gen=2",
        key_col="doc_id",
        n_shards=4,
    )
    assert sorted(
        (r["doc_id"], r["text"], r["gen"])
        for r in read_training_generations(spark, out, validate=True).collect()
    ) == flat
    # ...and the next compaction GC's it again
    compact_training_generations(spark, out, upto=2)
    assert not any(
        n.startswith("gen=") for n in os.listdir(out)
    )


def test_compact_torn_and_incremental(spark, tmp_path):
    """A compaction missing its marker is invisible (reader falls back
    to the gen dirs); compaction on top of a previous compact folds
    base + newer gens; default shard sizing inherits the largest
    source generation's per-shard rows."""
    import json as _json
    import os
    import shutil

    from tsp_spark.io.shards import (
        compact_training_generations,
        read_training_generations,
        write_training_shards,
    )

    schema = "doc_id long, text string"
    out = str(tmp_path / "out")
    rows = [(i, f"doc-{i}") for i in range(400)]
    for g, lo in enumerate(range(0, 300, 100)):
        write_training_shards(
            spark.createDataFrame(rows[lo : lo + 100], schema),
            f"{out}/gen={g}",
            key_col="doc_id",
            n_shards=2,
        )
    expect3 = sorted((i, f"doc-{i}", i // 100) for i in range(300))

    # torn compaction: build one, strip the marker -> invisible
    compact_training_generations(spark, out, upto=1)
    shutil.copytree(f"{out}/compact=1", f"{out}/compact=9")
    os.remove(f"{out}/compact=9/_COMMITTED")
    # recreate the GC'd gens so the fall-back has sources
    for g, lo in [(0, 0), (1, 100)]:
        write_training_shards(
            spark.createDataFrame(rows[lo : lo + 100], schema),
            f"{out}/gen={g}",
            key_col="doc_id",
            n_shards=2,
        )
    # ...wait: compact=1 IS committed; torn compact=9 must be skipped
    back = read_training_generations(spark, out, validate=True)
    assert sorted(
        (r["doc_id"], r["text"], r["gen"]) for r in back.collect()
    ) == expect3
    shutil.rmtree(f"{out}/compact=9")

    # incremental: fold compact=1 + gen=2 into compact=2
    compact_training_generations(spark, out, upto=2)
    names = sorted(os.listdir(out))
    assert "compact=2" in names and "compact=1" not in names
    back = read_training_generations(spark, out, validate=True)
    assert sorted(
        (r["doc_id"], r["text"], r["gen"]) for r in back.collect()
    ) == expect3

    # default sizing: 300 rows at 50/shard (largest source shard) -> 6
    m = _json.loads(
        open(f"{out}/compact=2/manifest.json").read()
    )
    assert m["n_shards"] == 6
    assert "gen" in m["columns"]


def test_compact_tiered_min_ratio(spark, tmp_path):
    """Tiered compaction (r11 ADVICE): with min_ratio, a fold whose
    new gens are below ratio x base_rows is SKIPPED (gens stay live,
    reader unchanged), and runs once they accumulate past the ratio —
    so a long stream's cumulative rewrite I/O is linear, not
    quadratic. A first fold (no base) always runs."""
    import os

    import pytest

    from tsp_spark.io.shards import (
        compact_training_generations,
        read_training_generations,
        write_training_shards,
    )

    schema = "doc_id long, text string"
    out = str(tmp_path / "out")

    def put(g, lo, n):
        write_training_shards(
            spark.createDataFrame(
                [(i, f"doc-{i}") for i in range(lo, lo + n)], schema
            ),
            f"{out}/gen={g}",
            key_col="doc_id",
            n_shards=2,
        )

    # first fold: no base yet -> runs regardless of ratio
    put(0, 0, 200)
    compact_training_generations(spark, out, upto=0, min_ratio=0.5)
    assert "compact=0" in os.listdir(out)

    # small gen (50 < 0.5 * 200): fold SKIPPED, gen stays live
    put(1, 200, 50)
    compact_training_generations(spark, out, upto=1, min_ratio=0.5)
    names = set(os.listdir(out))
    assert "compact=1" not in names and "gen=1" in names
    got = sorted(
        r["doc_id"]
        for r in read_training_generations(spark, out).collect()
    )
    assert got == list(range(250))

    # another gen pushes the accumulated new rows past the ratio
    # (50 + 60 = 110 >= 100) -> fold runs, gens GC'd
    put(2, 250, 60)
    compact_training_generations(spark, out, upto=2, min_ratio=0.5)
    names = set(os.listdir(out))
    assert "compact=2" in names
    assert not any(n.startswith("gen=") for n in names)
    got = sorted(
        (r["doc_id"], r["gen"])
        for r in read_training_generations(spark, out, validate=True)
        .collect()
    )
    assert got == (
        [(i, 0) for i in range(200)]
        + [(i, 1) for i in range(200, 250)]
        + [(i, 2) for i in range(250, 310)]
    )

    with pytest.raises(ValueError, match="min_ratio"):
        compact_training_generations(spark, out, min_ratio=0.0)
