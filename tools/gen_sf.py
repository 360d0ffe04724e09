"""Deterministic synthetic-table generator matching the driver
testdata's schemas and distributions (TESTDATA.md), for scale points
the driver doesn't ship — the sf1 (10×) scaling rehearsal writes to a
REPO-LOCAL dir (`/root/testdata` is read-only).

Row counts scale linearly like the driver's sf0.001→0.1 ladder
(lineitem = 6M·sf, events = 1M·sf, …); key relationships, value
ranges, category sets and the 64-dim unit embeddings mirror the
shipped data, so per-query work scales the way the real tables
would. Not byte-identical to the driver's generator (seed stream
differs) — used ONLY for relative timing (sf1 time / sf0.1 time),
never for correctness oracles.

DELIBERATE divergence (r8): the document corpus. The driver ships a
31-word closed vocabulary at ~54 tokens/doc, which makes almost every
doc pair a ≥0.6-Jaccard near-duplicate — near-dup PAIR COUNTS then
grow quadratically with corpus size (17.7M pairs at sf1 vs 181k at
sf0.1 under the old mirror — 97.6× output for 10× docs), so the 10×
rehearsal measured output blowup, not engine scaling. This generator
instead draws a Zipf-distributed OPEN vocabulary (size grows with the
corpus, like real text): random doc pairs sit far below every dedup
threshold, near-dups come only from the injected ~2% duplicated tail,
and pair/edge counts grow ~linearly — the regime a real 100 TB corpus
is in, and the one where sf1/sf0.1 timing ratios are meaningful.

Usage: python tools/gen_sf.py SF OUT_DIR   (e.g. 1.0 .localdata/sf1)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
EPOCH_95 = np.datetime64("1995-01-01")
EV_START = np.datetime64("2024-01-01T00:00:00")

_SYLL = (
    "ba be bi bo bu da de di do du ka ke ki ko ku la le li lo lu "
    "ma me mi mo mu na ne ni no nu ra re ri ro ru sa se si so su "
    "ta te ti to tu va ve vi vo vu za ze zi zo zu ga go gu pa po"
).split()


def _vocab(n: int) -> np.ndarray:
    """Open vocabulary: n distinct pronounceable words (syllable
    triples), deterministic in rank order so Zipf rank i is the same
    word at every scale point."""
    s = len(_SYLL)
    return np.array(
        [
            _SYLL[i % s] + _SYLL[(i // s) % s] + _SYLL[(i // (s * s)) % s]
            for i in range(n)
        ]
    )


def _zipf_probs(n: int, a: float = 1.07) -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, n + 1, dtype="float64"), a)
    return p / p.sum()

P_ADJ = ["large", "hot", "small", "cold", "dark", "light", "new", "old"]
P_NOUN = ["ring", "bolt", "case", "drum", "gear", "lace", "pipe", "wire"]
P_TYPE = ["LARGE", "ECONOMY", "STANDARD", "SMALL", "MEDIUM", "PROMO"]


def _ts(days_from_95: np.ndarray) -> pa.Array:
    us = (days_from_95 * 86_400_000_000).astype("int64")
    return pa.array(
        (EPOCH_95 + us.astype("timedelta64[us]")), type=pa.timestamp("us")
    )


def _write(out: Path, name: str, table: pa.Table) -> None:
    pq.write_table(table, out / f"{name}.parquet")
    print(f"  {name}: {table.num_rows} rows")


def generate(sf: float, out: Path, tables: set[str] | None = None) -> None:
    """``tables`` (r11): generate only the named tables — the sf10
    document soak needs `documents` alone (60M lineitem rows would
    dominate the generation for nothing). NOTE the rng stream is
    consumed per-section, so a filtered run's content differs from the
    same table in a full run — this generator is timing-only (module
    docstring), never a correctness oracle, so that is fine."""
    rng = np.random.default_rng(SEED)
    out.mkdir(parents=True, exist_ok=True)

    def want(name: str) -> bool:
        return tables is None or name in tables

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    if want("region"):
        _write(out, "region", pa.table({
            "r_regionkey": pa.array(range(5), pa.int32()),
            "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
        }))
    if want("nation"):
        _write(out, "nation", pa.table({
            "n_nationkey": pa.array(range(25), pa.int32()),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
        }))
    if want("customer"):
        _write(out, "customer", pa.table({
            "c_custkey": pa.array(range(n_cust), pa.int64()),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
            "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
            "c_mktsegment": pa.array(
                np.array(
                    ["MACHINERY", "HOUSEHOLD", "FURNITURE", "AUTOMOBILE",
                     "BUILDING"]
                )[rng.integers(0, 5, n_cust)]
            ),
        }))
    if want("supplier"):
        _write(out, "supplier", pa.table({
            "s_suppkey": pa.array(range(n_supp), pa.int64()),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
            "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
        }))
    if want("part"):
        _write(out, "part", pa.table({
            "p_partkey": pa.array(range(n_part), pa.int64()),
            "p_name": [
                f"{P_ADJ[i % 8]} {P_NOUN[(i // 8) % 8]}" for i in range(n_part)
            ],
            "p_brand": [f"Brand#{int(b)}" for b in rng.integers(0, 25, n_part)],
            "p_type": pa.array(np.array(P_TYPE)[rng.integers(0, 6, n_part)]),
            "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
            "p_retailprice": np.round(
                900.0 + (np.arange(n_part) % 1000) * 0.1, 2
            ),
        }))

    o_date = rng.uniform(0, 2404, n_ord)  # 1995-01-01 … 2001-08-01
    if want("orders"):
        _write(out, "orders", pa.table({
            "o_orderkey": pa.array(range(n_ord), pa.int64()),
            "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
            "o_orderstatus": pa.array(
                np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)]
            ),
            "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
            "o_orderdate": _ts(np.floor(o_date)),
            "o_orderpriority": pa.array(
                np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                          "5-LOW"])[rng.integers(0, 5, n_ord)]
            ),
        }))

    if want("lineitem"):
        li_ok = rng.integers(0, n_ord, n_li)
        li_ok.sort()
        # line numbers: cumcount within order
        first = np.concatenate([[True], li_ok[1:] != li_ok[:-1]])
        idx = np.arange(n_li)
        start = np.maximum.accumulate(np.where(first, idx, 0))
        linenum = (idx - start + 1).astype("int32")
        ship = np.floor(o_date[li_ok]) + rng.integers(1, 96, n_li)
        _write(out, "lineitem", pa.table({
            "l_orderkey": pa.array(li_ok, pa.int64()),
            "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
            "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
            "l_linenumber": pa.array(linenum, pa.int32()),
            "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
            "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
            "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
            "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
            "l_returnflag": pa.array(
                np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]
            ),
            "l_linestatus": pa.array(
                np.array(["O", "F"])[rng.integers(0, 2, n_li)]
            ),
            "l_shipdate": _ts(ship),
        }))

    if want("events"):
        ev_off = np.sort(rng.uniform(0, 30 * 86_400_000_000, n_ev).astype("int64"))
        _write(out, "events", pa.table({
            "event_id": pa.array(range(n_ev), pa.int64()),
            "ts": pa.array(
                EV_START + ev_off.astype("timedelta64[us]"), pa.timestamp("us")
            ),
            "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
            "event_type": pa.array(
                np.array(["click", "view", "purchase", "signup", "error"])[
                    rng.integers(0, 5, n_ev)
                ]
            ),
            "value": np.round(rng.exponential(50.0, n_ev), 2),
            "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
        }))

    if want("documents"):
        n_tok = rng.integers(15, 61, n_doc)
        # open Zipf vocabulary (see module docstring): vocab size grows
        # with the corpus so random-pair Jaccard stays far below the 0.5/
        # 0.6 dedup thresholds at every scale point — near-dup pairs come
        # only from the injected duplicated tail below, keeping pair
        # counts ~linear in corpus size like a real open-text corpus
        n_vocab = max(2_000, n_doc // 10)
        vocab = _vocab(n_vocab)
        probs = _zipf_probs(n_vocab)
        all_toks = rng.choice(n_vocab, size=int(n_tok.sum()), p=probs)
        offs = np.concatenate([[0], np.cumsum(n_tok)])
        texts = [
            " ".join(vocab[all_toks[offs[i]:offs[i + 1]]]) for i in range(n_doc)
        ]
        sources = rng.integers(0, 20, n_doc)
        # ~2% near/exact duplicates of earlier docs (the driver corpus
        # carries a small duplicated tail — 5000 docs / 4992 distinct at
        # its sf0.1): half verbatim copies, half with one token swapped,
        # so MinHash-LSH and exact-dedup find work at every scale. The
        # duplicate inherits its source doc's `source` — real duplication
        # (mirrors, re-crawls) clusters within a provenance bucket, and it
        # keeps the source-bucketed jaccard query's pair density constant
        # per doc (~linear pair growth) instead of near-zero.
        for i in rng.choice(
            np.arange(1, n_doc), size=max(1, n_doc // 50), replace=False
        ):
            src_i = int(rng.integers(0, i))
            toks = texts[src_i].split(" ")
            if rng.random() < 0.5 and len(toks) > 1:
                toks[int(rng.integers(0, len(toks)))] = str(
                    vocab[int(rng.choice(n_vocab, p=probs))]
                )
            texts[int(i)] = " ".join(toks)
            sources[int(i)] = sources[src_i]
        _write(out, "documents", pa.table({
            "doc_id": pa.array(range(n_doc), pa.int64()),
            "text": texts,
            "lang": pa.array(
                np.array(["en", "en", "fr", "de", "es", "zh"])[
                    rng.integers(0, 6, n_doc)
                ]
            ),
            "source": [f"src{int(s)}" for s in sources],
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }))

    if want("embeddings"):
        vecs = rng.standard_normal((n_emb, 64)).astype("float32")
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        _write(out, "embeddings", pa.table({
            "vec_id": pa.array(range(n_emb), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
        }))


def ensure(sf: float, out_dir: str, tables: set[str] | None = None) -> str:
    """Generate once; a marker file makes the check cheap."""
    out = Path(out_dir)
    marker = out / ".complete"
    if not marker.exists():
        generate(sf, out, tables=tables)
        marker.write_text("ok")
    return str(out)


if __name__ == "__main__":
    # optional 3rd arg: comma-separated table filter (timing-only data)
    ensure(
        float(sys.argv[1]),
        sys.argv[2],
        set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None,
    )
