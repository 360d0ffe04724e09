"""Byte-pair encoding: train real merges, apply them distributed.

``bpe_token_counts`` (curation.py) is the regex PRE-tokenizer; this
module adds the learned half — the classic Sennrich-et-al BPE
(arXiv:1508.07909) over word-frequency tables:

* ``bpe_train`` — the word-frequency table aggregates IN SPARK (one
  explode + groupBy over a deterministic hash sample, map-side
  combined), and only the bounded distinct-word table reaches the
  driver, where the standard iterative pair-merge loop runs (pure
  python over at most ``max_words`` entries — the same
  train-on-a-sample shape every production tokenizer uses; the merge
  loop is inherently sequential, so distributing it would add shuffles
  for no parallelism).
* ``bpe_encode`` — merges ship to executors in the UDF closure; one
  Arrow-batched pandas_udf applies them with per-batch word
  memoization (a batch's repeated words — Zipf's law guarantees many —
  encode once). Map-only: no shuffle, the classic embarrassingly-
  parallel tokenization pass.

Determinism: the sample is the salted-hash sample (engine-portable),
ties in pair frequency break lexicographically, so the same corpus +
seed always yields the same merge table.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EOW = "</w>"


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (_EOW,)


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict:
    pairs: dict[tuple[str, str], int] = {}
    for syms, freq in vocab.items():
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + freq
    return pairs


def _merge_vocab(
    vocab: dict[tuple[str, ...], int], pair: tuple[str, str]
) -> dict[tuple[str, ...], int]:
    a, b = pair
    merged = a + b
    out: dict[tuple[str, ...], int] = {}
    for syms, freq in vocab.items():
        res = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                res.append(merged)
                i += 2
            else:
                res.append(syms[i])
                i += 1
        out[tuple(res)] = out.get(tuple(res), 0) + freq
    return out


def bpe_train(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_merges: int = 200,
    sample_fraction: float = 1.0,
    max_words: int = 100_000,
    seed: str = "bpe-s0",
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus (or a
    deterministic ``sample_fraction`` hash-sample of it).

    The distributed part is exactly one explode + groupBy word-count
    aggregation; ``max_words`` caps the driver-side vocabulary at the
    most frequent words (deterministic (count desc, word) order — the
    long tail of hapaxes contributes almost nothing to merge counts,
    which is why sampled training is the industry standard). Merge
    ties break lexicographically, so training is reproducible.

    The driver loop is the standard INCREMENTAL trainer
    (subword-nmt's shape): a pair→words index plus a lazy max-heap,
    so each merge touches only the words containing the merged pair —
    not an O(vocab) rescan per merge (review-caught; the naive
    recompute-everything loop is kept as ``_bpe_train_reference`` and
    pinned equal by test)."""
    import heapq

    from tsp_spark.pipeline.curation import sample_member

    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    if not 0.0 < sample_fraction <= 1.0:
        raise ValueError(
            f"sample_fraction must be in (0, 1], got {sample_fraction}"
        )
    base = df
    if sample_fraction < 1.0:
        base = df.where(sample_member(id_col, sample_fraction, seed=seed))
    rows = (
        base.select(
            F.explode(F.split(F.col(text_col), " ")).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w"))
        .limit(max_words)
        .collect()
    )
    if not rows:
        raise ValueError(
            "bpe_train: no words in the (sampled) training corpus — "
            "an empty merge table would silently degrade encoding to "
            "character level"
        )

    words: list[list] = []  # [symbols list, freq]
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    heap: list[tuple[int, tuple[str, str]]] = []

    def bump(idx: int, sign: int) -> None:
        syms, freq = words[idx]
        for p in zip(syms, syms[1:]):
            c = pair_counts.get(p, 0) + sign * freq
            pair_counts[p] = c
            if sign > 0:
                pair_words.setdefault(p, set()).add(idx)
                heapq.heappush(heap, (-c, p))
            # decrements leave a stale heap entry; the pop loop
            # re-validates against pair_counts and reinserts

    for i, r in enumerate(rows):
        words.append([list(_word_symbols(r["w"])), int(r["n"])])
        bump(i, +1)

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        negc, best = heapq.heappop(heap)
        cur = pair_counts.get(best, 0)
        if cur <= 0:
            continue
        if -negc != cur:
            heapq.heappush(heap, (-cur, best))
            continue
        merges.append(best)
        a, b = best
        merged = a + b
        for idx in sorted(pair_words.pop(best, ())):
            syms, freq = words[idx]
            has = any(
                syms[i] == a and syms[i + 1] == b
                for i in range(len(syms) - 1)
            )
            if not has:  # lazy index: word may have changed shape
                continue
            bump(idx, -1)
            res = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            words[idx][0] = res
            bump(idx, +1)
        pair_counts[best] = 0
    return merges


def _bpe_train_reference(
    word_freqs: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """The naive recompute-everything trainer, kept as the test oracle
    for the incremental loop above (identical selection rule: highest
    count, lexicographically-smallest pair on ties)."""
    vocab = {_word_symbols(w): n for w, n in word_freqs.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = _pair_counts(vocab)
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = _merge_vocab(vocab, best)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Tokenize with a trained merge table: (id, bpe_tokens,
    n_bpe_tokens). Map-only — merges ride the UDF closure, words
    memoize per Arrow batch (Zipf repetition makes the cache hit rate
    high), and lowest-RANK-first merge application reproduces training
    exactly (the standard BPE inference rule)."""
    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @pandas_udf("array<string>")
    def _encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts:
            toks: list[str] = []
            if t:
                for w in t.split(" "):
                    if not w:
                        continue
                    got = cache.get(w)
                    if got is None:
                        got = _encode_word(w, ranks)
                        cache[w] = got
                    toks.extend(got)
            out.append(toks)
        return pd.Series(out)

    enc = F.col("__bpe")
    # n_learned_bpe_tokens, not n_bpe_tokens: curation.bpe_token_counts
    # already emits n_bpe_tokens for the REGEX pre-tokenizer count, and
    # a pipeline joining both per-doc frames must not hit an
    # ambiguous-column trap (review-caught)
    return (
        df.select(F.col(id_col), _encode(F.col(text_col)).alias("__bpe"))
        .select(
            F.col(id_col),
            enc.alias("bpe_tokens"),
            F.size(enc).cast("long").alias("n_learned_bpe_tokens"),
        )
    )
