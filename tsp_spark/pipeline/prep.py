"""Training-data preparation operators (r8): document chunking,
benchmark-contamination detection, PII redaction.

These close the remaining gaps a large-scale LLM training pipeline
needs between dedup/quality filtering (pipeline/dedup.py, text.py) and
the tokenizer: splitting long documents into training-window chunks,
flagging documents that leak evaluation-benchmark n-grams, and
scrubbing obvious PII. Everything is built-in Column expressions — no
Python UDFs — so the plans stay inside whole-stage codegen and scale
like the rest of the pipeline.

Scale notes:
* chunk_documents — pure per-row expressions (split → sequence →
  slice): map-only, no shuffle; output rows = Σ ceil(tokens/step).
* contamination_check — the benchmark n-gram set is the SMALL side by
  construction (an eval suite is KBs-MBs, the corpus is TBs): distinct
  it and let AQE broadcast the join; the corpus side is one
  explode + distinct + groupBy(doc) with map-side partial aggregation.
  For very large benchmarks pre-hash the n-grams (xxhash64) so the
  join key is 8 bytes — the string form here keeps the DuckDB oracle
  exact.
* redact_pii — chained regexp_replace, map-only. Patterns avoid
  lookaround/backrefs so Java (Spark) and RE2 (DuckDB oracle) agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 30,
    overlap: int = 10,
) -> DataFrame:
    """Split each document into whitespace-token chunks of
    ``chunk_tokens`` with ``overlap`` tokens carried between
    consecutive chunks (stride = chunk_tokens − overlap). Returns
    (id, chunk_id, chunk_text, n_tokens); chunk_id = stride index, so
    the output is deterministic with no window function — chunking is
    map-only at any corpus size.

    A chunk is emitted only when it covers at least one token beyond
    the previous chunk's coverage (start < n − overlap, or start 0):
    a doc whose tail lies entirely inside the previous chunk's overlap
    would otherwise re-emit that tail as a fully-redundant final
    chunk — duplicated training text."""
    if overlap >= chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be smaller than chunk_tokens "
            f"({chunk_tokens})"
        )
    step = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    starts = F.sequence(
        F.lit(0), F.greatest(n - overlap - 1, F.lit(0)), F.lit(step)
    )
    out = df.select(
        F.col(id_col),
        n.alias("__n"),
        F.posexplode(starts).alias("chunk_id", "__start"),
        toks.alias("__toks"),
    )
    return out.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join(
            F.slice(F.col("__toks"), F.col("__start") + 1, chunk_tokens), " "
        ).alias("chunk_text"),
        F.least(
            F.lit(chunk_tokens), F.col("__n") - F.col("__start")
        ).cast("long").alias("n_tokens"),
    )


def _ngram_array(toks: Column, n: int) -> Column:
    """Sliding word n-grams as strings (space-joined); empty when the
    document holds fewer than n tokens."""
    count = F.size(toks)
    return F.when(
        count >= n,
        F.transform(
            F.sequence(F.lit(1), count - n + 1),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def contamination_check(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_shared: int = 1,
    hash_ngrams: bool = False,
    broadcast_bench: bool | None = None,
) -> DataFrame:
    """Benchmark-contamination detection: for every candidate document,
    count the DISTINCT word ``n``-grams it shares with the evaluation
    corpus ``bench`` (the standard train/test-leakage check). Returns
    (id, n_shared, is_contaminated) for every doc in ``docs``; docs
    shorter than n tokens share nothing by definition.

    ``hash_ngrams=True`` replaces the space-joined n-gram STRING join
    key with its xxhash64 — an 8-byte key, hashed before the distincts
    so both distinct shuffles and the join move fixed-width longs
    instead of long strings. Use it whenever the bench side is big
    enough that AQE won't broadcast it (a 100 GB bench must not
    shuffle n-gram strings). Result-identical up to xxhash64
    collisions between distinct n-grams (~p=k²/2⁶⁵ — negligible; the
    oracle runs the exact string form against it).

    ``broadcast_bench``: True forces a broadcast hint on the distinct
    bench n-gram set, False forbids it, None (default) lets AQE
    decide from the measured size."""
    def key(d: DataFrame) -> DataFrame:
        # hash BEFORE the distinct so the distinct shuffle itself
        # moves 8-byte longs, not n-gram strings (explode is a
        # generator, so the hash is a second projection step)
        if hash_ngrams:
            return d.withColumn("__g", F.xxhash64(F.col("__g")))
        return d

    bench_ngrams = key(
        bench.select(
            F.explode(_ngram_array(F.split(F.col(text_col), " "), n)).alias("__g")
        )
    ).distinct()
    if broadcast_bench is True:
        bench_ngrams = F.broadcast(bench_ngrams)
    elif broadcast_bench is False:
        bench_ngrams = bench_ngrams.hint("shuffle_hash")
    doc_ngrams = key(
        docs.select(
            F.col(id_col).alias("__id"),
            F.explode(_ngram_array(F.split(F.col(text_col), " "), n)).alias("__g"),
        )
    ).distinct()
    hits = (
        doc_ngrams.join(bench_ngrams, on="__g")
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        docs.select(F.col(id_col).alias("__id"))
        .distinct()
        .join(hits, on="__id", how="left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col("n_shared"), F.lit(0)).cast("long").alias("n_shared"),
            (F.coalesce(F.col("n_shared"), F.lit(0)) >= min_shared)
            .cast("long")
            .alias("is_contaminated"),
        )
    )


# PII patterns — deliberately lookaround/backref-free so the Java
# (Spark) and RE2 (DuckDB) engines match identically
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9]{7,15}", "<PHONE>"),
)


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Scrub the standard PII shapes (emails, IPv4 addresses,
    international-format phone numbers) from a text column,
    map-only: returns (id, redacted text, per-category match counts).
    Categories apply in declaration order; the replacement tokens
    contain no digits or '@', so earlier replacements can never create
    later matches."""
    redacted = F.col(text_col)
    counts = []
    for name, pat, rep in PII_PATTERNS:
        counts.append(
            F.size(
                F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
            )
            .cast("long")
            .alias(f"n_{name}")
        )
        redacted = F.regexp_replace(redacted, pat, rep)
    return df.select(
        F.col(id_col), redacted.alias("redacted"), *counts
    )


def pack_sequences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    budget_tokens: int = 2048,
    n_buckets: int = 256,
) -> DataFrame:
    """Sequence packing for training windows: lay the corpus out as
    one deterministic concatenated token stream and assign each
    document to the pack (context window) its first token lands in —
    (id, pack_id, start_in_pack, n_tokens).

    This is the standard concat-then-chunk packing used by training
    pipelines (a pack is cropped at ``budget_tokens``; the document
    that straddles a boundary runs past it and is cropped by the
    consumer, exactly like corpus concatenation before fixed-length
    example slicing). Document order inside the stream is the
    md5_long hash of the id — deterministic and uniform, so packs mix
    sources instead of preserving ingest order, and any engine
    reproduces the same layout (no reservoir/partition order
    dependence).

    100 TB shape (r9, distributed): the running sum is NOT one
    unpartitioned window (which Spark executes as a single task
    holding every row). The 60-bit hash space is range-bucketed by
    its top bits (``n_buckets`` ranges — bucket id is monotone in the
    hash, so bucket-major order IS global (hash, id) order), then:

    1. per-bucket token totals — a map-side-combined groupBy over the
       skinny (bucket, n_tokens) projection, ``n_buckets`` rows out;
    2. cumulative bucket offsets — a triangular self-join over those
       ``n_buckets`` rows (≤ n_buckets² tiny rows, no window, no
       single-task stage);
    3. broadcast the offsets back and run the running-sum window
       PARTITIONED by bucket — ~corpus/n_buckets rows per task.

    global_start(row) = offset(bucket) + within-bucket running sum,
    bit-identical to the single-stream layout at any n_buckets (the
    test pins DuckDB parity and asserts no unpartitioned window
    survives in the physical plan). The text column never enters the
    exchange — only (id, hash, n_tokens) moves.
    """
    from tsp_spark.pipeline.hashing import md5_long

    if budget_tokens < 1:
        # DIV 0 would yield NULL pack ids silently (review-caught)
        raise ValueError(f"budget_tokens must be >= 1, got {budget_tokens}")
    # cap 4096: the offsets stage is a triangular self-join, O(B²)
    # rows — 16M at the cap (trivial), but 2^20 buckets would make it
    # a trillion-row stage; 4096 buckets already puts a 10B-doc corpus
    # at ~2.4M skinny rows per window task
    if n_buckets < 1 or (n_buckets & (n_buckets - 1)) != 0 or n_buckets > 4096:
        raise ValueError(
            f"n_buckets must be a power of two in [1, 4096], got {n_buckets}"
        )
    # md5_long is 60-bit non-negative; shifting off the low bits keeps
    # bucket id monotone in the hash value
    shift = 60 - (n_buckets.bit_length() - 1)
    # NULL text = zero tokens, zero-width placement at its stream
    # position (review-caught: size(split(NULL)) is NULL, which would
    # leak NULL n_tokens/pack_id rows and skip the running sum)
    n_tok = F.coalesce(
        F.size(F.split(F.col(text_col), " ")), F.lit(0)
    )
    t = df.select(
        F.col(id_col),
        md5_long(F.col(id_col).cast("string")).alias("__h"),
        n_tok.cast("long").alias("n_tokens"),
    ).withColumn("__b", F.shiftright(F.col("__h"), shift).cast("int"))
    bucket_sums = t.groupBy("__b").agg(F.sum("n_tokens").alias("__bsum"))
    # cumulative offsets over ≤ n_buckets rows via a triangular
    # self-join — empty buckets simply don't appear and contribute 0
    offsets = (
        bucket_sums.alias("a")
        .join(
            bucket_sums.select(
                F.col("__b").alias("__b2"), F.col("__bsum").alias("__s2")
            ),
            F.col("__b2") < F.col("a.__b"),
            "left",
        )
        .groupBy(F.col("a.__b").alias("__b"))
        .agg(F.coalesce(F.sum("__s2"), F.lit(0)).alias("__off"))
    )
    t = t.join(F.broadcast(offsets), on="__b")
    w = Window.partitionBy("__b").orderBy("__h", id_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    start = F.col("__off") + F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    # integer DIV, not floor(double /): exact past 2^53 total tokens
    return t.withColumn("__start", start).select(
        id_col,
        "n_tokens",
        F.expr(f"__start DIV {budget_tokens}").cast("long").alias("pack_id"),
        F.pmod(F.col("__start"), F.lit(budget_tokens))
        .cast("long")
        .alias("start_in_pack"),
    )
