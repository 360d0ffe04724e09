"""Unit tests for the training-data preparation ops (pipeline/prep.py):
chunking, benchmark-contamination detection, PII redaction. The
end-to-end value checks against DuckDB run in the oracle gate
(queries prep_chunks / prep_contamination / prep_redact)."""

from __future__ import annotations

import pytest

from tsp_spark.pipeline.prep import (
    chunk_documents,
    contamination_check,
    redact_pii,
)


def test_chunk_documents_exact(spark):
    toks = [f"w{i}" for i in range(7)]
    df = spark.createDataFrame(
        [(1, " ".join(toks)), (2, "a b"), (3, "solo")],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(
            df, chunk_tokens=4, overlap=2
        ).collect()
    }
    # doc 1: 7 tokens, stride 2 → starts 0,2,4; start 6 is NOT
    # emitted — its only token (w6) already lies inside the start-4
    # chunk's coverage, so it would be a fully-redundant tail chunk
    assert out[(1, 0)] == ("w0 w1 w2 w3", 4)
    assert out[(1, 1)] == ("w2 w3 w4 w5", 4)
    assert out[(1, 2)] == ("w4 w5 w6", 3)
    assert (1, 3) not in out
    # short docs: a single chunk covering everything
    assert out[(2, 0)] == ("a b", 2)
    assert out[(3, 0)] == ("solo", 1)
    assert len(out) == 5
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_contamination_check_counts(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox runs"),   # shares 2 distinct 3-grams
            (2, "a completely different text here"),
            (3, "too short"),                   # < 3 tokens → 0
            (4, "quick brown fox quick brown fox"),  # dup 3-grams count once
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_shared"], r["is_contaminated"])
        for r in contamination_check(docs, bench, n=3).collect()
    }
    assert out[1] == (2, 1)   # "the quick brown", "quick brown fox"
    assert out[2] == (0, 0)
    assert out[3] == (0, 0)
    assert out[4] == (1, 1)   # "quick brown fox" once, distinct
    assert len(out) == 4
    # hashed-key variant (8-byte xxhash64 join keys, forced bench
    # broadcast) is result-identical to the string join
    hashed = {
        r["doc_id"]: (r["n_shared"], r["is_contaminated"])
        for r in contamination_check(
            docs, bench, n=3, hash_ngrams=True, broadcast_bench=True
        ).collect()
    }
    assert hashed == out


def test_redact_pii_categories(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.user+tag@sub.example.org now"),
            (2, "server at 192.168.0.1 and 10.0.0.255 up"),
            (3, "call +4915123456789 today"),
            (4, "clean text with number 42 and date 2024-01-01"),
            (5, "x@y.io or +1234567 at 8.8.8.8"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[1]["redacted"] == "mail <EMAIL> now"
    assert (out[1]["n_email"], out[1]["n_ip"], out[1]["n_phone"]) == (1, 0, 0)
    assert out[2]["redacted"] == "server at <IP> and <IP> up"
    assert out[2]["n_ip"] == 2
    assert out[3]["redacted"] == "call <PHONE> today"
    assert out[3]["n_phone"] == 1
    # non-PII digits and dates survive untouched
    assert out[4]["redacted"] == "clean text with number 42 and date 2024-01-01"
    assert (out[4]["n_email"], out[4]["n_ip"], out[4]["n_phone"]) == (0, 0, 0)
    assert out[5]["redacted"] == "<EMAIL> or <PHONE> at <IP>"


def test_pack_sequences_layout_laws_and_duckdb_parity(spark):
    """pack_sequences: every doc placed exactly once; pack ids dense
    from 0; start_in_pack < budget; consecutive docs in hash order are
    token-contiguous across the concatenated stream. Cross-engine:
    DuckDB computes the identical layout from the same definition."""
    import duckdb

    from tsp_spark.pipeline.prep import pack_sequences

    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range(5 + (i * 7) % 40)))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, "text", "doc_id", budget_tokens=64)
    # scale shape: the running sum must be a bucket-PARTITIONED window
    # — an unpartitioned windowspec would put the whole corpus in one
    # task (every windowspecdefinition in the plan leads with the
    # bucket column)
    plan = out._jdf.queryExecution().executedPlan().toString()
    specs = [
        plan[i:i + 60]
        for i in range(len(plan))
        if plan.startswith("windowspecdefinition(", i)
    ]
    assert specs, plan
    for s in specs:
        assert s.startswith("windowspecdefinition(__b#"), s
    got = {r["doc_id"]: r for r in out.collect()}
    assert len(got) == 200
    total = sum(r["n_tokens"] for r in got.values())
    # laws
    packs = {r["pack_id"] for r in got.values()}
    assert packs == set(range((total - 1) // 64 + 1)) or packs == set(
        range(max(packs) + 1)
    )
    for r in got.values():
        assert 0 <= r["start_in_pack"] < 64
        assert r["pack_id"] * 64 + r["start_in_pack"] < total
    # duckdb parity from the same definition
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{t}')" for i, t in rows)
        + ") AS t(doc_id, text)"
    )
    oracle = con.execute("""
        WITH t AS (
          SELECT doc_id,
                 ('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS h,
                 len(string_split(text, ' '))::BIGINT AS n_tokens
          FROM docs
        ),
        s AS (
          SELECT doc_id, n_tokens,
                 COALESCE(sum(n_tokens) OVER (ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
          FROM t
        )
        SELECT doc_id, n_tokens, start // 64 AS pack_id,
               start % 64 AS start_in_pack
        FROM s
    """).fetchall()
    for doc_id, n_tokens, pack_id, start_in_pack in oracle:
        r = got[doc_id]
        assert (r["n_tokens"], r["pack_id"], r["start_in_pack"]) == (
            n_tokens, pack_id, start_in_pack
        ), f"doc {doc_id}"
    # layout is invariant under the bucket count (bit-identical to the
    # single-stream definition at any n_buckets)
    for nb in (1, 16, 1024):
        alt = {
            r["doc_id"]: (r["n_tokens"], r["pack_id"], r["start_in_pack"])
            for r in pack_sequences(
                df, "text", "doc_id", budget_tokens=64, n_buckets=nb
            ).collect()
        }
        assert alt == {
            k: (r["n_tokens"], r["pack_id"], r["start_in_pack"])
            for k, r in got.items()
        }, f"n_buckets={nb}"
    with pytest.raises(ValueError, match="n_buckets"):
        pack_sequences(df, "text", "doc_id", n_buckets=3)
