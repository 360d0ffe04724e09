"""Driver-contract regression guards: the declared registry must stay
inside the correctness window and keep its invariants."""

from __future__ import annotations

DRIVER_WINDOW = 50  # the driver verifies exactly the first 50 entries


def test_registry_size_and_oracle_coverage():
    from tsp_spark.queries import ORACLES, QUERIES

    # every declared query must land a driver CORRECTNESS row: the
    # registry must not grow past the window (fold near-duplicates
    # instead — see the cep_wait_until_tol / text_profile folds)
    assert len(QUERIES) <= DRIVER_WINDOW, (
        f"{len(QUERIES)} queries > driver window of {DRIVER_WINDOW}: "
        f"entries beyond the window silently get NO correctness row"
    )
    # exact DuckDB oracle for every entry (zero rows-only checks)
    assert set(ORACLES) == set(QUERIES)
    assert all(isinstance(sql, str) and "SELECT" in sql.upper()
               for sql in ORACLES.values())


def test_entry_contract_importable():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) == set(q) and len(q) <= DRIVER_WINDOW
    assert callable(next(iter(q.values())))


def _sf_dirs():
    from pathlib import Path

    root = Path("/root/testdata")
    return sorted(
        str(p) for p in root.glob("sf*") if (p / "lineitem.parquet").exists()
    )


import pytest  # noqa: E402


def test_sf_dirs_present():
    """Review-caught: if /root/testdata is absent the parametrize
    below silently collects ZERO dtype-gate cases and the HUGEINT
    regression class (which cost rounds 3 AND 4) ships unchecked.
    Fail loudly instead."""
    assert _sf_dirs(), (
        "no /root/testdata/sf*/lineitem.parquet found — the oracle "
        "dtype gate collected no cases"
    )


@pytest.mark.parametrize("sf_dir", _sf_dirs())
def test_oracle_dtypes_stay_driver_hashable(sf_dir):
    """Every oracle's DuckDB result must avoid dtypes the driver's hash
    treats differently from Spark's: an uncast integer sum() yields
    HUGEINT (int128 → pandas object dtype) and hash-mismatches even when
    every value is equal. This cost rounds 3 AND 4 — r4 shipped 5 such
    oracles (rel_q10/q12/q18/q19/q22). Bind each oracle against EVERY
    on-disk sf dir (r6: binding only sf0.001 let a new oracle pass the
    gate yet overflow at larger SF — DuckDB widens inferred types with
    data) and assert no HUGEINT/UHUGEINT/DECIMAL column escapes; cast
    with ::BIGINT (or ::DOUBLE) in the outer SELECT."""
    import duckdb

    from tsp_spark.queries import ORACLES

    con = duckdb.connect()
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    offenders = []
    for name, sql in ORACLES.items():
        rel = con.sql(sql)  # binds + type-checks without executing
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ).upper()
            if "HUGEINT" in t or t.startswith("DECIMAL"):
                offenders.append(f"{name}.{col}: {t}")
    assert not offenders, (
        "oracle columns with driver-hash-hostile dtypes (add ::BIGINT): "
        + "; ".join(offenders)
    )


def test_q1_money_sums_exact_beyond_int64(spark, tmp_path):
    """r4 verdict item 7: Q1's big money sums must stay exact past the
    int64 range (the old ::BIGINT oracle capped at SF≈50). Both engines
    now compute them exactly — Spark in DECIMAL(38,0), DuckDB in
    HUGEINT — and emit strings; a synthetic lineitem whose charge sum
    is ~2e21 must round-trip identically."""
    import datetime as dt

    import duckdb

    from tsp_spark.queries import ORACLE_Q1, q_rel_q1_pricing

    rows = [
        # cents ≈ 5e16 → per-row charge_e6 term ≈ 5e20 > int64 max
        ("A", "F", 5.0, 5.0e14 + i, 0.05, 0.07, dt.datetime(1995, 1, 1))
        for i in range(4)
    ] + [("R", "O", 2.0, 1000.0, 0.1, 0.02, dt.datetime(1995, 6, 1))]
    df = spark.createDataFrame(
        rows,
        "l_returnflag string, l_linestatus string, l_quantity double, "
        "l_extendedprice double, l_discount double, l_tax double, "
        "l_shipdate timestamp",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))

    got = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in q_rel_q1_pricing(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"'{tmp_path}/lineitem.parquet/*.parquet'"
    )
    odf = con.execute(ORACLE_Q1).df()
    assert len(got) == 2 and len(odf) == 2
    big = got[("A", "F")]
    assert int(big["sum_charge_e6"]) > 2**63  # genuinely past int64
    for _, orow in odf.iterrows():
        srow = got[(orow["l_returnflag"], orow["l_linestatus"])]
        for c in ("sum_qty", "sum_base_cents", "sum_disc_e4",
                  "sum_charge_e6", "count_order"):
            assert str(srow[c]) == str(orow[c]), (c, srow[c], orow[c])


def test_division_by_zero_jvm_semantics_all_engines(spark):
    """r14 (found by fresh-seed fuzz_sweep 1412): the engine is a
    LIBRARY under the caller's session, and Spark 4's ANSI default
    made a zero divisor THROW mid-job from the registry's raw `a / b`.
    The reference divides JVM doubles (FunctionRegistry.scala:141,
    Fractional[Double].div): x/0 → ±Inf by the dividend's sign, 0/0 →
    NaN — which tools/ref_oracle.py's `div` already pinned. All three
    engines must now agree, with ANSI ON, zero divisors included:

      * batch compiler (registry._jvm_div / the exact Long div form)
      * vectorized streaming kernel (`_num` div branch)
      * per-row stateful fold (`_fold_reducer`-adjacent arith)

    Int/Int additionally truncates toward zero with Double.toLong
    saturation (NaN → 0, ±Inf → Long.MIN/MAX)."""
    import math

    import numpy as np

    from tsp_spark.compile.compiler import compile_pattern

    prev = spark.conf.get("spark.sql.ansi.enabled", None)
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        import datetime as dt

        rows = []
        for i, (v, w) in enumerate(
            [(5.0, 0.0), (-5.0, 0.0), (0.0, 0.0), (7.0, 2.0),
             (float("nan"), 0.0), (-3.0, 0.0), (9.0, 3.0), (100.0, 0.0)]
        ):
            rows.append(
                (1, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i), v, w)
            )
        df = spark.createDataFrame(
            rows, "user_id bigint, ts timestamp, v double, w double"
        )
        ft = {"v": "float64", "w": "float64"}
        # v/w > 1 over the zero-divisor rows: +Inf rows match, NaN/-Inf
        # rows don't — intervals pin the full semantics path
        out = compile_pattern(
            df, "v / w > 1", ["user_id"], "ts", ft, max_gap_ms=60_000
        ).select("from_ts", "to_ts").collect()
        got = sorted((r["from_ts"].second, r["to_ts"].second) for r in out)
        # oracle by hand: rows 0 (5/0=+Inf>1), 3 (7/2=3.5>1),
        # 4 (NaN/0=+Inf>1), 6 (9/3=3>1), 7 (100/0=+Inf>1);
        # rows 1 (-Inf), 2 (NaN), 5 (-Inf) false
        assert got == [(0, 0), (3, 4), (6, 7)], got

        # vectorized kernel agrees value-for-value
        from tsp_spark.dsl import ast as A
        from tsp_spark.dsl.parser import parse_pattern
        from tsp_spark.streaming.vectorized import _num

        node = parse_pattern("v / w", ft)
        pdf = df.toPandas()
        vals, null, is_int = _num(node, pdf, {})
        want = [math.inf, -math.inf, math.nan, 3.5,
                math.inf, -math.inf, 3.0, math.inf]
        for g, w_ in zip(vals, want):
            assert (math.isnan(g) and math.isnan(w_)) or g == w_, (g, w_)
        assert not null.any()

        # Int/Int: truncation + Double.toLong saturation
        irows = [(1, dt.datetime(2024, 1, 1), 7, 2),
                 (1, dt.datetime(2024, 1, 1, 0, 0, 1), 5, 0),
                 (1, dt.datetime(2024, 1, 1, 0, 0, 2), -5, 0),
                 (1, dt.datetime(2024, 1, 1, 0, 0, 3), 0, 0),
                 (1, dt.datetime(2024, 1, 1, 0, 0, 4), -7, 2)]
        idf = spark.createDataFrame(
            irows, "user_id bigint, ts timestamp, a bigint, b bigint"
        )
        ift = {"a": "int64", "b": "int64"}
        iout = compile_pattern(
            idf, "a / b >= 3", ["user_id"], "ts", ift, max_gap_ms=60_000
        ).select("from_ts", "to_ts").collect()
        # 7/2=3 (>=3 true), 5/0=Long.MAX true (adjacent rows merge into
        # one island), -5/0=Long.MIN false, 0/0=0 false,
        # -7/2=-3 (trunc toward zero) false
        assert sorted(
            (r["from_ts"].second, r["to_ts"].second) for r in iout
        ) == [(0, 1)]
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.ansi.enabled")
        else:
            spark.conf.set("spark.sql.ansi.enabled", prev)


def test_jvm_scalar_edges_session_independent(spark):
    """r14 §20 (found by tools/probe_ansi_edges.py): with Spark 4's ANSI
    default, the registry's raw expressions THREW on cot(0) (double
    division by zero), abs(Long.MIN), and Long add/sub/mul overflow —
    and Int/Int division was double-mediated, losing exactness above
    2^53 (Long.MAX div -7 was off by 73). All are now pinned to JVM
    semantics (Scala Long wraps; exact Long division truncates toward
    zero with MIN/-1 wrapping per JLS 15.17.2; Math.log edges; IEEE
    reciprocal with the zero's sign), evaluated with ANSI forced ON.
    The per-row streaming kernel and the fuzz oracle share the rule
    via _jvm_arith; the vectorized kernel demotes these regimes."""
    import math

    from pyspark.sql import functions as F

    from tsp_spark.compile.registry import DEFAULT_REGISTRY

    LMIN, LMAX = -(1 << 63), (1 << 63) - 1
    prev = spark.conf.get("spark.sql.ansi.enabled", None)
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        lf = spark.createDataFrame(
            [(LMAX, 1), (LMAX, -1), (LMAX, -7), (LMIN, -1), (LMIN, 7),
             (LMAX, LMIN), (LMIN, LMIN), (7, 2), (-7, 2)],
            "a bigint, b bigint",
        )

        def run(name, dts=("int64", "int64")):
            col, rt = DEFAULT_REGISTRY.build(
                name, [F.col("a"), F.col("b")], list(dts)
            )
            assert rt == "int64"
            return [r["o"] for r in lf.select(col.alias("o")).collect()]

        # exact Long division, truncation toward zero, MIN/-1 wraps
        assert run("div") == [
            LMAX, -LMAX, -1317624576693539401, LMIN,
            -1317624576693539401, 0, 1, 3, -3,
        ]
        # Scala Long wrap on overflow (Numeric[Long])
        assert run("add") == [
            LMIN, LMAX - 1, LMAX - 7, LMIN - 1 + (1 << 64), LMIN + 7,
            -1, 0, 9, -5,
        ]
        mul = run("mul")
        assert mul[3] == LMIN  # MIN * -1 = 2^63 wraps to MIN
        assert mul[6] == 0     # MIN * MIN = 2^126 ≡ 0 mod 2^64
        sub = run("sub")
        assert sub[0] == LMAX - 1      # MAX - 1, in range
        assert sub[1] == LMIN          # MAX - (-1) wraps to MIN
        assert sub[3] == LMIN + 1      # MIN - (-1), in range
        # abs(Long.MIN) is Long.MIN (Math.abs two's complement)
        acol, art = DEFAULT_REGISTRY.build("abs", [F.col("a")], ["int64"])
        assert art == "int64"
        got = [r["o"] for r in lf.select(acol.alias("o")).collect()]
        assert got[3] == LMIN and got[7] == 7

        # double edges: cot/ln/log pinned to JVM libm under ANSI
        dfd = spark.createDataFrame(
            [(1, 0.0), (2, -0.0), (3, -1.5), (4, 2.0)], "i bigint, v double"
        )
        for name, want in (
            ("cot", [math.inf, -math.inf, None, None]),  # None = skip
            ("ln", [-math.inf, -math.inf, math.nan, math.log(2.0)]),
            ("log", [-math.inf, -math.inf, math.nan, math.log10(2.0)]),
        ):
            col, _ = DEFAULT_REGISTRY.build(name, [F.col("v")], ["float64"])
            rows = {r["i"]: r["o"] for r in dfd.select("i", col.alias("o")).collect()}
            for i, w in enumerate(want, start=1):
                if w is None:
                    continue
                g = rows[i]
                assert (math.isnan(w) and math.isnan(g)) or g == w, (name, i, g, w)

        # the per-row kernel and the fuzz oracle share the Long rule
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
        import ref_oracle as O

        from tsp_spark.streaming.stateful import _MATH1, _jvm_abs, _jvm_arith

        for a, b in [(LMAX, 1), (LMAX, -1), (LMAX, -7), (LMIN, -1),
                     (LMIN, 7), (LMAX, LMIN), (7, 2), (-7, 2), (5, 0),
                     (-5, 0), (0, 0)]:
            for op in ("add", "sub", "mul", "div"):
                k = _jvm_arith(op, a, b)
                o = O._jvm_arith(op, a, b)
                assert k == o, (op, a, b, k, o)
        assert _jvm_abs(LMIN) == LMIN == O._UNARY["abs"](LMIN)
        assert _MATH1["cot"](0.0) == math.inf
        assert _MATH1["cot"](-0.0) == -math.inf
        assert _MATH1["ln"](0.0) == -math.inf
        assert math.isnan(_MATH1["ln"](-1.0))

        # spot-check batch == per-row on the Long division row set
        dcol, _ = DEFAULT_REGISTRY.build(
            "div", [F.col("a"), F.col("b")], ["int64", "int64"]
        )
        batch = [r["o"] for r in lf.select(dcol.alias("o")).collect()]
        perrow = [
            _jvm_arith("div", a, b)
            for a, b in [(LMAX, 1), (LMAX, -1), (LMAX, -7), (LMIN, -1),
                         (LMIN, 7), (LMAX, LMIN), (LMIN, LMIN), (7, 2),
                         (-7, 2)]
        ]
        assert batch == perrow
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.ansi.enabled")
        else:
            spark.conf.set("spark.sql.ansi.enabled", prev)


def test_int_window_sum_survives_long_history_under_ansi(spark):
    """r14 §20: the O(n) integer window sum accumulates a GLOBAL
    running sum over the key's whole history; with long-typed
    accumulation an ANSI session throws ARITHMETIC_OVERFLOW once the
    cumulative passes 2^63 even though every window sum fits (the
    100 TB shape: ~4.6e18 of cumulative value per key). The
    accumulator is now decimal(30,0) with the difference wrapped back
    into long range, so the same pattern compiles and matches the
    hand oracle under ANSI."""
    import datetime as dt

    from tsp_spark.compile.compiler import compile_pattern

    prev = spark.conf.get("spark.sql.ansi.enabled", None)
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        # 10 rows, 1 s apart, each 2e18: cumulative crosses 2^63
        # (~9.2e18) at row 5; a 2.5 s window holds ≤3 rows → window
        # sums ≤ 6e18, always in range
        v = 2_000_000_000_000_000_000
        rows = [
            (1, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i), v)
            for i in range(10)
        ]
        df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, x bigint")
        out = compile_pattern(
            df,
            "sum(x, 2500 ms) >= 6000000000000000000",
            ["user_id"],
            "ts",
            {"x": "int64"},
            max_gap_ms=60_000,
            window_agg="prefix",
        ).select("from_ts", "to_ts").collect()
        # half-open (t-w, t] windows at 1 Hz hold 3 rows from t=2 on →
        # sum 6e18 ≥ threshold from second 2 through 9, one island
        assert [(r["from_ts"].second, r["to_ts"].second) for r in out] == [(2, 9)]
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.ansi.enabled")
        else:
            spark.conf.set("spark.sql.ansi.enabled", prev)


def test_cmp_null_before_nan_and_cast_null_guard(spark):
    """r14 §20, probe-caught pair (tools/probe_ansi_edges.py):

    1. cmp(NaN, NULL) returned False (True for !=) — the NaN guard
       fired before null propagation, so `value != lag(x)` MATCHED on
       NaN-vs-absent rows where the per-row kernel and the oracle give
       Result.fail. NULL now propagates first.
    2. `(NULL as int32)` came back -2147483648 (and 0 for int8/16):
       greatest/least SKIP null operands, so a NULL double reaching
       the saturation clamp returned the clamp BOUND. An absent lag
       cast to int then compared `< 0` was a spurious match. The clamp
       is now null-guarded.
    3. Mixed string/number comparisons THREW CAST_INVALID_INPUT under
       ANSI on unparseable strings; pinned to the kernel rule (string
       side parses as double, unparseable → Result.fail)."""
    import math

    from pyspark.sql import functions as F

    from tsp_spark.compile.compiler import _jvm_cast
    from tsp_spark.compile.registry import DEFAULT_REGISTRY

    prev = spark.conf.get("spark.sql.ansi.enabled", None)
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        nan = float("nan")
        df = spark.createDataFrame(
            [(1, nan, None), (2, None, nan), (3, nan, 2.0), (4, 2.0, 2.0)],
            "i bigint, a double, b double",
        )
        for op, r3, r4 in (("ne", True, False), ("eq", False, True),
                           ("gt", False, False)):
            col, _ = DEFAULT_REGISTRY.build(
                op, [F.col("a"), F.col("b")], ["float64", "float64"]
            )
            rows = {r["i"]: r["o"] for r in df.select("i", col.alias("o")).collect()}
            assert rows[1] is None and rows[2] is None, (op, rows)
            assert rows[3] == r3 and rows[4] == r4, (op, rows)

        # cast NULL → NULL for every integer width (was bound/0)
        nd = spark.createDataFrame([(None,), (1.5,), (nan,)], "v double")
        for dst, on_15, on_nan in (("int8", 1, 0), ("int16", 1, 0),
                                   ("int32", 1, 0), ("int64", 1, 0)):
            got = [
                r["o"]
                for r in nd.select(
                    _jvm_cast(F.col("v"), "float64", dst).alias("o")
                ).collect()
            ]
            assert got == [None, on_15, on_nan], (dst, got)

        # mixed string/number comparisons: ANSI-independent, kernel rule
        sd = spark.createDataFrame(
            [(1, "3.5", 5.0), (2, "abc", 5.0), (3, "NaN", 5.0), (4, None, 5.0)],
            "i bigint, s string, v double",
        )
        col, _ = DEFAULT_REGISTRY.build(
            "lt", [F.col("s"), F.col("v")], ["string", "float64"]
        )
        rows = {r["i"]: r["o"] for r in sd.select("i", col.alias("o")).collect()}
        assert rows[1] is True          # 3.5 < 5
        assert rows[2] is None          # unparseable → Result.fail
        assert rows[3] is False         # NaN < x is false (IEEE)
        assert rows[4] is None

        # per-row kernel agrees on the NULL/NaN lattice
        from tsp_spark.streaming.stateful import _eval_row
        from tsp_spark.dsl.parser import parse_pattern

        node = parse_pattern("a != b", {"a": "float64", "b": "float64"})
        # strip the Assert the grammar inserts at the top
        from tsp_spark.dsl import ast as A

        inner = node.inner if isinstance(node, A.Assert) else node
        # NB float FIELDS decode NULL → NaN (the reference's
        # BasicDecoders rule), so a null field compares as NaN here
        # (ne → True); true Fails reach _cmp only via lag absence /
        # failed parses — the lag-cast fuzz rows cover that path
        assert _eval_row(inner, {"a": nan, "b": None}, {}) is True
        assert _eval_row(inner, {"a": nan, "b": 2.0}, {}) is True
        assert _eval_row(inner, {"a": 2.0, "b": 2.0}, {}) is False
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.ansi.enabled")
        else:
            spark.conf.set("spark.sql.ansi.enabled", prev)
