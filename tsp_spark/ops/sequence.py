"""The `andThen` sequence join — the one genuinely order-dependent operator.

Reference semantics (core/.../AndThenPattern.scala:42-94;
docs/writing-patterns.md:76-79): "A andThen B" succeeds on the interval
[start(A), end(B)] when a success interval of B begins no later than one
event after the success interval of A ends; a B that starts later (a gap
of failing events in between) does NOT match that A.

Spark-first strategy: islandize both operands (run-length encoding makes
the interval tables tiny relative to the event stream), then join island
tables per key on the match condition

    B.start_idx <= A.end_idx + 1  AND  B.end_idx >= A.start_idx

(not-gapped and not-late — overlapping runs DO match, including a B that
ends inside A). Both island tables derive from the same keyed shuffle;
the join keys are the partition keys, so at scale this is a
co-partitioned join of two small derived tables — with AQE it typically
executes as a broadcast join of the smaller side.

Assumes (keys…, ts) uniquely identifies a row, like the compiler's
join-back: duplicate timestamps within a key get nondeterministic
per-side row numbers and can corrupt the index-adjacency join.
"""

from __future__ import annotations

from collections import deque
from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tsp_spark.ops.islands import DEFAULT_MAX_GAP_MS, islands


def and_then(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    cond_a: Column,
    cond_b: Column,
    max_gap_ms: int | None = DEFAULT_MAX_GAP_MS,
) -> DataFrame:
    """Match success runs of ``cond_a`` immediately followed by success
    runs of ``cond_b``; emit one row per A-run that matches:
    ``keys…, from_ts (=A start), to_ts (=B end)``.

    Series-split aware (review-caught): the reference resets ALL state
    at a gap > max_gap_ms (PatternProcessor.scala:33-56), so an A-run
    ending just before a split must not match a B-run starting right
    after it even though their indices are adjacent — the islandize and
    the join both run per (keys…, series)."""
    jkeys = list(keys)
    if max_gap_ms is not None:
        # same formula as the compiler's with_series
        w = Window.partitionBy(*keys).orderBy(ts)
        ms = F.unix_millis(F.col(ts))
        brk = (ms - F.lag(ms).over(w) > F.lit(max_gap_ms)).cast("int")
        df = df.withColumn(
            "__series_seq",
            F.sum(F.coalesce(brk, F.lit(0))).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        jkeys = [*keys, "__series_seq"]
    ia = islands(df, jkeys, ts, cond_a, max_gap_ms, with_idx=True)
    ib = islands(df, jkeys, ts, cond_b, max_gap_ms, with_idx=True)
    out = and_then_intervals(ia, ib, jkeys)
    return out.drop("__series_seq") if max_gap_ms is not None else out


def and_then_intervals(
    left: DataFrame, right: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Sequence-join two interval tables (each with keys…, from_ts, to_ts,
    n_rows, start_idx, end_idx). Used directly for chained
    ``A andThen B andThen C``: the previous result is the left side.

    Match rule (AndThenPattern.scala:69-88): a B-run matches an A-run
    unless B is late (B.end < A.start) or gapped (B.start > A.end + 1) —
    overlapping runs DO match. Reported interval follows the documented
    semantics (docs/writing-patterns.md:76-79): "from the timestamp when
    LHS starts to the timestamp when RHS ends" — [A.from, B.to] — which
    is what the golden fixtures (SimpleCasesTest cases 9, 16-17, 47-48,
    51-52) encode. Runs are consumed 1:1 sequentially, approximated by
    keeping the earliest B per A and then the earliest A per B (the
    known deviations from the reference's two-queue rewind on
    overlap-edge shapes are documented in docs/SEMANTICS.md §17).
    ``n_rows`` is the reported index span ``end_idx − start_idx + 1``
    (contiguous by the adjacency condition), keeping the
    compile_pattern output contract uniform across pattern shapes.
    """
    a = left.select(
        *keys,
        F.col("from_ts").alias("__a_from"),
        F.col("to_ts").alias("__a_to"),
        F.col("start_idx").alias("__a_si"),
        F.col("end_idx").alias("__a_ei"),
    )
    b = right.select(
        *keys,
        F.col("from_ts").alias("__b_from"),
        F.col("to_ts").alias("__b_to"),
        F.col("start_idx").alias("__b_si"),
        F.col("end_idx").alias("__b_ei"),
    )
    joined = a.join(b, on=[*keys], how="inner").where(
        (F.col("__b_si") <= F.col("__a_ei") + 1) & (F.col("__b_ei") >= F.col("__a_si"))
    )
    w_a = Window.partitionBy(*keys, "__a_si").orderBy("__b_si")
    w_b = Window.partitionBy(*keys, "__b_si").orderBy("__a_si")
    paired = (
        joined.withColumn("__rb", F.row_number().over(w_a))
        .where(F.col("__rb") == 1)
        .withColumn("__ra", F.row_number().over(w_b))
        .where(F.col("__ra") == 1)
    )
    end_idx = F.greatest("__a_ei", "__b_ei")
    return paired.select(
        *keys,
        F.col("__a_from").alias("from_ts"),
        F.col("__b_to").alias("to_ts"),
        (end_idx - F.col("__a_si") + 1).alias("n_rows"),
        F.col("__a_si").alias("start_idx"),
        end_idx.alias("end_idx"),
    )


# ---------------------------------------------------------------------------
# Reference-exact consumption mode (r8): the two-queue union+rewind merge
# of AndThenPattern.scala:42-94, run over complete RLE queues per
# (key, series). The fused join above stays the golden-pinned default;
# this mode is selected per job (search_incidents(andthen_mode="exact"))
# for users with overlap-dense B runs who need the reference's exact
# pairing on the documented §17 edge shapes.
# ---------------------------------------------------------------------------


def _exact_merge(first: list, second: list) -> list:
    """Port of AndThenPattern.scala:42-94 ``process()`` over complete
    queues. Entries are ``[start_idx, end_idx, ok]`` (ok=False models
    Fail); mirrors PQueue semantics exactly: ``behead`` pops the head,
    ``rewindTo`` drops entries ending before the new start and trims
    the head's start (PQueue.scala:77-94), and the total queue unites
    consecutive Fail entries (``enqueueWithUniting``, PQueue.scala:96-105
    — Succ payloads are distinct (start, end) tuples, so successes
    never unite here; the top-level Segmentizer merge happens in
    :func:`_segmentize_succ`). Matches the reference's batch behavior
    (StateMachine groupSize=100000: one ``process`` per 100k rows, so
    series up to 100k rows see exactly one merge over complete queues;
    longer series in the reference get chunk-boundary artifacts this
    port does not replicate)."""
    fa, fb = deque(first), deque(second)
    total: list[list] = []

    def enqueue(s: int, e: int, ok: bool) -> None:
        if total and not ok and not total[-1][2]:
            total[-1][0] = min(total[-1][0], s)
            total[-1][1] = max(total[-1][1], e)
        else:
            total.append([s, e, ok])

    def rewind(q: deque, new_start: int) -> None:
        while q:
            s, e, ok = q[0]
            if s > new_start:
                return
            if e < new_start:
                q.popleft()
                continue
            q[0] = (new_start, e, ok)
            return

    while fa and fb:
        s1, e1, v1 = fa[0]
        s2, e2, v2 = fb[0]
        if not v1:  # first head is Fail
            fa.popleft()
            while fb and fb[0][1] <= s1:  # unwindWhile(second)(_.end <= start1)
                fb.popleft()
            enqueue(s1, e1, False)
        elif not v2:  # second head is Fail
            # "Do not return Fail for the first part yet, unless it is
            # the end of the queue" (AndThenPattern.scala:62-66)
            if len(fa) == 1:
                rewind(fa, e2 + 1)
                fb.popleft()
                enqueue(s1, e2, False)
            else:
                fb.popleft()
        elif s1 > e2:  # late second
            fb.popleft()
            enqueue(s2, e2, False)
        elif e1 + 1 < s2:  # gap between first and second
            fa.popleft()
            enqueue(s1, e1, False)
        else:  # intersect → union, consume both past the union end
            e = max(e1 + 1, e2)
            s = min(s1, s2)
            enqueue(s, e, True)
            rewind(fa, e + 1)
            rewind(fb, e + 1)
    return total


def _segmentize(total: list) -> list[list]:
    """SegmentizerPattern over the MapPattern-erased total queue
    (ASTPatternGenerator maps every AndThen success to Succ(True), so
    consecutive successes are equal-valued and merge — keeping the
    FIRST start and taking the LAST end, regardless of idx adjacency);
    consecutive Fails merge the same way."""
    out: list[list] = []
    for s, e, ok in total:
        if out and out[-1][2] == ok:
            out[-1][1] = e
        else:
            out.append([s, e, ok])
    return out


def _timestamps_walk(
    segmented: list, min_idx: int, max_idx: int
) -> list[tuple[int, int]]:
    """TimestampsAdderPattern semantics (AccumPattern.scala:71-74): the
    per-series idx→time map is CONSUMED in queue order by every entry,
    Fail included — `splitAtIdx(itmap, start)` discards indices below
    the entry's start and `splitAtIdx(…, end, marginToFirst)` hands the
    entry everything up to its end. So a success whose span was partly
    consumed by a preceding overlapping Fail reports from the first
    still-unconsumed index; one fully consumed (or past the series end)
    emits nothing (`if times.isEmpty`). Returns (from_idx, to_idx)
    pairs ready for the timestamp join-back."""
    segs: list[tuple[int, int]] = []
    cursor = min_idx - 1
    for s, e, ok in segmented:
        lo = max(s, cursor + 1)
        hi = min(e, max_idx)
        if ok and lo <= hi:
            segs.append((lo, hi))
        cursor = max(cursor, e)
    return segs


def and_then_exact(
    indexed: DataFrame,
    operand_islands: Sequence[DataFrame],
    tree,
    keys: Sequence[str],
    ts: str,
) -> DataFrame:
    """Reference-exact ``andThen`` (chain) evaluation.

    ``indexed`` is the event frame carrying ``__idx`` (raw per-key row
    number) and the series key columns; ``operand_islands[i]`` is the
    keep=None islandization of chain operand ``i`` (columns keys…,
    cond_value, start_idx, end_idx — the operand's RLE queue entries:
    consecutive equal-valued runs united, exactly like
    ``enqueueWithUniting`` on assert-mapped booleans); ``tree`` is the
    AndThen AST shape as nested 2-tuples over operand indices (e.g.
    ``((0, 1), 2)``), preserving associativity — flattening a
    right-nested chain would change pairing.

    Scale shape: the merge is inherently sequential per (key, series)
    but runs over the RLE *island* tables (tiny vs the event stream),
    Arrow-batched via applyInPandas; timestamps resolve by two
    distributed equi-joins back to the indexed frame (TimestampsAdder
    semantics: ts of the success start idx, ts of the success end idx
    clamped to the series' last row). No events ever pass through
    Python."""
    skeys = list(keys)
    parts = [
        t.select(
            *skeys,
            F.lit(i).alias("__op"),
            F.col("cond_value").eqNullSafe(F.lit(True)).alias("__ok"),
            F.col("start_idx").cast("long").alias("start_idx"),
            F.col("end_idx").cast("long").alias("end_idx"),
        )
        for i, t in enumerate(operand_islands)
    ]
    extent = indexed.groupBy(*skeys).agg(
        F.min("__idx").cast("long").alias("start_idx"),
        F.max("__idx").cast("long").alias("end_idx"),
    ).select(
        *skeys, F.lit(-1).alias("__op"), F.lit(False).alias("__ok"),
        "start_idx", "end_idx",
    )
    union = reduce(lambda a, b: a.unionByName(b), [*parts, extent])

    key_fields = [union.schema[k] for k in skeys]
    out_schema = T.StructType(
        [
            *key_fields,
            T.StructField("start_idx", T.LongType()),
            T.StructField("end_idx", T.LongType()),
        ]
    )
    n_ops = len(operand_islands)
    shape = tree

    def run_series(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["__op", "start_idx"])
        ops = pdf["__op"].to_numpy()
        ss = pdf["start_idx"].to_numpy()
        ee = pdf["end_idx"].to_numpy()
        ok = pdf["__ok"].to_numpy()
        min_e = int(ss[ops == -1].min())
        max_e = int(ee[ops == -1].max())
        qs: list[list] = [[] for _ in range(n_ops)]
        for o, s, e, k in zip(ops, ss, ee, ok):
            if o >= 0:
                qs[o].append((int(s), int(e), bool(k)))

        def ev(t):
            if isinstance(t, int):
                return qs[t]
            return _exact_merge(ev(t[0]), ev(t[1]))

        segs = _timestamps_walk(_segmentize(ev(shape)), min_e, max_e)
        head = pdf.iloc[0]
        return pd.DataFrame(
            [[*(head[k] for k in skeys), s, e] for s, e in segs],
            columns=[*skeys, "start_idx", "end_idx"],
        )

    segs = union.groupBy(*skeys).applyInPandas(run_series, out_schema)
    from_map = indexed.select(
        *skeys,
        F.col("__idx").cast("long").alias("start_idx"),
        F.col(ts).alias("from_ts"),
    )
    to_map = indexed.select(
        *skeys,
        F.col("__idx").cast("long").alias("end_idx"),
        F.col(ts).alias("to_ts"),
    )
    return (
        segs.join(from_map, on=[*skeys, "start_idx"])
        .join(to_map, on=[*skeys, "end_idx"])
        .select(
            *skeys,
            "from_ts",
            "to_ts",
            (F.col("end_idx") - F.col("start_idx") + 1).alias("n_rows"),
            "start_idx",
            "end_idx",
        )
    )
