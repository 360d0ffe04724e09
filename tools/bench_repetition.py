"""Microbench: Gopher repetition screens, quadratic HOF form vs the
sort+run-pass form (tsp_spark.pipeline.text.repetition_cols /
line_repetition_cols), on synthetic 20k-token documents — the
pre-training document length the quadratic form cliffs on.

Run: python tools/bench_repetition.py [n_docs] [tokens_per_doc]
Prints one JSON line; results recorded in docs/SCALE.md.
"""

from __future__ import annotations

import json
import random
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from tsp_spark.pipeline.text import (  # noqa: E402
    _gram_join,
    _tokens,
    line_repetition_cols,
    repetition_cols,
)
from tsp_spark.session import get_spark  # noqa: E402


def quadratic_repetition_cols(text_col: str):
    """The pre-r10 O(G²) nested-HOF form, kept here only as the
    microbench comparator."""
    toks = _tokens(F.col(text_col))
    g2 = _gram_join(toks, 2)
    g3 = _gram_join(toks, 3)
    top2 = F.array_max(
        F.transform(
            F.array_distinct(g2),
            lambda d: F.size(F.filter(g2, lambda x: x == d)),
        )
    )
    dup3 = F.size(
        F.filter(g3, lambda x: F.size(F.filter(g3, lambda y: y == x)) >= 2)
    )
    return [
        F.when(F.size(g2) > 0, top2.cast("double") / F.size(g2))
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
        F.when(F.size(g3) > 0, dup3.cast("double") / F.size(g3))
        .otherwise(F.lit(0.0))
        .alias("dup_trigram_frac"),
    ]


def quadratic_line_repetition_cols(text_col: str):
    lines = F.split(F.col(text_col), "\n")
    n = F.size(lines)
    dup = F.filter(
        lines, lambda x: F.size(F.filter(lines, lambda y: y == x)) >= 2
    )
    n_dup = F.size(dup)
    chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    dup_chars = F.aggregate(
        dup, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    return [
        F.when(n > 1, n_dup.cast("double") / n)
        .otherwise(F.lit(0.0))
        .alias("dup_line_frac"),
        F.when((n > 1) & (chars > 0), dup_chars.cast("double") / chars)
        .otherwise(F.lit(0.0))
        .alias("dup_line_char_frac"),
    ]


def make_docs(n_docs: int, n_tokens: int, seed: int = 7):
    """Realistic repetition profile: a 5k-word vocabulary plus a few
    boilerplate lines repeated throughout (what Gopher filters catch)."""
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(5000)]
    docs = []
    for d in range(n_docs):
        toks, lines, line = [], [], []
        while len(toks) < n_tokens:
            if rng.random() < 0.05:
                boiler = ["click", "here", "to", "subscribe", "now"]
                toks.extend(boiler)
                lines.append(" ".join(boiler))
            else:
                w = rng.choice(vocab)
                toks.append(w)
                line.append(w)
                if len(line) >= 12:
                    lines.append(" ".join(line))
                    line = []
        if line:
            lines.append(" ".join(line))
        docs.append((d, " ".join(toks[:n_tokens]), "\n".join(lines)))
    return docs


def timed(df) -> tuple[float, int]:
    t0 = time.time()
    n = df.count()
    return time.time() - t0, n


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_tokens = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    spark = get_spark()
    rows = make_docs(n_docs, n_tokens)
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lined string"
    ).repartition(32).persist()
    df.count()

    out: dict = {"n_docs": n_docs, "tokens_per_doc": n_tokens}

    fast = df.select("doc_id", *repetition_cols("text"),
                     *line_repetition_cols("lined"))
    out["fast_sec"], _ = timed(fast)
    out["fast_sec_per_doc"] = round(out["fast_sec"] / n_docs, 4)
    print("fast done:", out["fast_sec"], file=sys.stderr)

    # The quadratic form cannot finish 20k-token docs in any sane
    # budget (a prior run: 4 docs, >570 s, DNF) — measure its curve at
    # smaller lengths instead, parity-checked at each point, and let
    # the trend speak for 20k.
    out["quad_curve"] = {}
    # 2k tokens already fails to finish inside a 10-minute budget
    # (measured: 500→17 s, 1000→123 s for 4 docs — superquadratic in
    # practice because the nested lambdas defeat codegen); the curve
    # stops at 1k and the trend speaks for 20k
    for q_tokens in (500, 1_000):
        qd = spark.createDataFrame(
            make_docs(4, q_tokens), "doc_id long, text string, lined string"
        ).coalesce(4).persist()
        qd.count()
        f_rows = {
            r["doc_id"]: r.asDict()
            for r in qd.select(
                "doc_id", *repetition_cols("text"),
                *line_repetition_cols("lined")).collect()
        }
        t0 = time.time()
        q_rows = {
            r["doc_id"]: r.asDict()
            for r in qd.select(
                "doc_id", *quadratic_repetition_cols("text"),
                *quadratic_line_repetition_cols("lined")).collect()
        }
        quad_sec = round(time.time() - t0, 3)
        assert f_rows == q_rows, (f_rows, q_rows)
        t0 = time.time()
        qd.select("doc_id", *repetition_cols("text"),
                  *line_repetition_cols("lined")).count()
        fast_sec = round(time.time() - t0, 3)
        out["quad_curve"][q_tokens] = {
            "quad_sec": quad_sec,
            "fast_sec": fast_sec,
            "speedup": round(quad_sec / max(fast_sec, 1e-3), 1),
            "parity": "identical",
        }
        qd.unpersist()
        print(f"quad {q_tokens}: {quad_sec}s", file=sys.stderr)
    out["quad_20k"] = "DNF (>570 s for 4 docs in a prior run)"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
