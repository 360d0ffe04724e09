"""Probe every registry function on edge inputs under ANSI ON, vs JVM.

r14 follow-up to the `_jvm_div` fix: the engine is a library under the
CALLER's SparkSession, and Spark 4 defaults `spark.sql.ansi.enabled=true`.
Any registry builder whose raw Spark expression diverges from JVM
semantics — or THROWS — on edge inputs is the same bug class the
fresh-seed fuzz caught for division (docs/SEMANTICS.md §19).

JVM ground truth computed in Python: double ops are IEEE (CPython float
matches), Long add/sub/mul wrap mod 2^64 (Scala), abs(Long.MIN) is
Long.MIN, Math.log(0) = -Inf / Math.log(neg) = NaN, Math.sqrt(neg) = NaN.

Usage: python tools/probe_ansi_edges.py
Prints one line per (function, inputs) divergence; exits 0 if clean.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

LONG_MIN = -(1 << 63)
LONG_MAX = (1 << 63) - 1


def wrap64(x: int) -> int:
    return (x + (1 << 63)) % (1 << 64) - (1 << 63)


def jvm_unary(name: str, v):
    if v is None:
        return None
    if name == "abs":
        if isinstance(v, int):
            return v if v == LONG_MIN else abs(v)
        return abs(v)
    f = float(v)
    try:
        if name == "sin":
            return math.sin(f)
        if name == "cos":
            return math.cos(f)
        if name in ("tan", "tg"):
            return math.tan(f)
        if name in ("cot", "ctg"):
            return 1.0 / math.tan(f) if math.tan(f) != 0 else math.copysign(math.inf, math.tan(f))
        if name == "sind":
            return math.sin(math.radians(f))
        if name == "cosd":
            return math.cos(math.radians(f))
        if name in ("tand", "tgd"):
            return math.tan(math.radians(f))
        if name in ("cotd", "ctgd"):
            t = math.tan(math.radians(f))
            return 1.0 / t if t != 0 else math.copysign(math.inf, t)
        if name == "exp":
            if math.isnan(f):
                return math.nan
            if f == math.inf:
                return math.inf
            if f == -math.inf:
                return 0.0
            try:
                return math.exp(f)
            except OverflowError:
                return math.inf
        if name == "ln":
            if math.isnan(f):
                return math.nan
            if f == 0:
                return -math.inf
            if f < 0:
                return math.nan
            return math.log(f)
        if name == "log":
            if math.isnan(f):
                return math.nan
            if f == 0:
                return -math.inf
            if f < 0:
                return math.nan
            return math.log10(f)
        if name == "sqrt":
            return math.nan if f < 0 else math.sqrt(f)
        if name == "sigmoid":
            # extension: 1/(1+exp(-2v)); saturates cleanly
            if math.isnan(f):
                return math.nan
            try:
                e = math.exp(-2.0 * f)
            except OverflowError:
                e = math.inf
            return 1.0 / (1.0 + e)
    except ValueError:
        return math.nan
    raise KeyError(name)


def jvm_bin(name: str, a, b, is_int: bool):
    if a is None or b is None:
        return None
    if is_int:
        if name == "add":
            return wrap64(a + b)
        if name == "sub":
            return wrap64(a - b)
        if name == "mul":
            return wrap64(a * b)
        if name == "div":
            if b == 0:
                if a == 0:
                    return 0  # NaN.toLong
                return LONG_MAX if a > 0 else LONG_MIN
            # exact Scala Long division: truncation toward zero,
            # Long.MIN / -1 wraps (JLS 15.17.2)
            q = abs(a) // abs(b)
            if (a < 0) != (b < 0):
                q = -q
            return wrap64(q)
    fa, fb = float(a), float(b)
    if name == "add":
        return fa + fb
    if name == "sub":
        return fa - fb
    if name == "mul":
        r = fa * fb
        return r
    if name == "div":
        if fb == 0:
            return math.nan if fa == 0 else math.copysign(math.inf, 1.0 if math.isnan(fa) else fa)
        return fa / fb
    raise KeyError(name)


def feq(a, b) -> bool:
    if a is None or b is None:
        return a is b
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        if fa == fb:
            return True
        return abs(fa - fb) <= 1e-12 * max(abs(fa), abs(fb))
    return a == b


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from tsp_spark.compile.registry import DEFAULT_REGISTRY

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )

    dbl_edges = [0.0, -0.0, 1.5, -1.5, 2.0, 1e308, -1e308, 1e-308,
                 math.inf, -math.inf, math.nan, None, 90.0, 180.0, 709.0, 710.0]
    long_edges = [0, 1, -1, 7, -7, 2, 3, LONG_MAX, LONG_MIN, LONG_MAX - 1, None]

    df_d = spark.createDataFrame([(i, v) for i, v in enumerate(dbl_edges)], "i bigint, v double")
    df_l = spark.createDataFrame([(i, v) for i, v in enumerate(long_edges)], "i bigint, v bigint")

    unary = ["abs", "sin", "cos", "tan", "tg", "cot", "ctg", "sind", "cosd",
             "tand", "tgd", "cotd", "ctgd", "exp", "ln", "log", "sqrt", "sigmoid"]
    bad = 0

    for name in unary:
        try:
            col, _ = DEFAULT_REGISTRY.build(name, [F.col("v")], ["float64"])
            rows = {r["i"]: r["o"] for r in df_d.select("i", col.alias("o")).collect()}
        except Exception as exc:  # noqa: BLE001
            print(f"THROW  {name}(double): {type(exc).__name__}: {str(exc)[:120]}")
            bad += 1
            continue
        for i, v in enumerate(dbl_edges):
            want = jvm_unary(name, v)
            got = rows[i]
            if not feq(got, want):
                print(f"DIVERGE {name}({v!r}) spark={got!r} jvm={want!r}")
                bad += 1

    # abs over longs (ANSI throws on abs(Long.MIN))
    try:
        col, _ = DEFAULT_REGISTRY.build("abs", [F.col("v")], ["int64"])
        rows = {r["i"]: r["o"] for r in df_l.select("i", col.alias("o")).collect()}
        for i, v in enumerate(long_edges):
            want = jvm_unary("abs", v)
            if not feq(rows[i], want):
                print(f"DIVERGE abs({v!r}L) spark={rows[i]!r} jvm={want!r}")
                bad += 1
    except Exception as exc:  # noqa: BLE001
        print(f"THROW  abs(long): {type(exc).__name__}: {str(exc)[:120]}")
        bad += 1

    # binary ops: pairwise over the edge grids
    pairs_d = [(a, b) for a in dbl_edges for b in dbl_edges]
    pdf = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs_d)], "i bigint, a double, b double"
    )
    pairs_l = [(a, b) for a in long_edges for b in long_edges]
    plf = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs_l)], "i bigint, a bigint, b bigint"
    )
    for name in ("add", "sub", "mul", "div"):
        try:
            col, _ = DEFAULT_REGISTRY.build(name, [F.col("a"), F.col("b")], ["float64", "float64"])
            rows = {r["i"]: r["o"] for r in pdf.select("i", col.alias("o")).collect()}
            for i, (a, b) in enumerate(pairs_d):
                want = jvm_bin(name, a, b, False)
                if not feq(rows[i], want):
                    print(f"DIVERGE {name}({a!r},{b!r}) spark={rows[i]!r} jvm={want!r}")
                    bad += 1
        except Exception as exc:  # noqa: BLE001
            print(f"THROW  {name}(double,double): {type(exc).__name__}: {str(exc)[:120]}")
            bad += 1
        try:
            col, _ = DEFAULT_REGISTRY.build(name, [F.col("a"), F.col("b")], ["int64", "int64"])
            rows = {r["i"]: r["o"] for r in plf.select("i", col.alias("o")).collect()}
            for i, (a, b) in enumerate(pairs_l):
                want = jvm_bin(name, a, b, True)
                if not feq(rows[i], want):
                    print(f"DIVERGE {name}({a!r}L,{b!r}L) spark={rows[i]!r} jvm={want!r}")
                    bad += 1
        except Exception as exc:  # noqa: BLE001
            print(f"THROW  {name}(long,long): {type(exc).__name__}: {str(exc)[:120]}")
            bad += 1

    # comparisons: double edge pairs vs the pinned IEEE rule
    def ieee_cmp(op, x, y):
        if x is None or y is None:
            return None
        if math.isnan(float(x)) or math.isnan(float(y)):
            return op == "ne"
        fx, fy = float(x), float(y)
        return {"lt": fx < fy, "le": fx <= fy, "gt": fx > fy,
                "ge": fx >= fy, "eq": fx == fy, "ne": fx != fy}[op]

    for name in ("lt", "le", "gt", "ge", "eq", "ne"):
        try:
            col, _ = DEFAULT_REGISTRY.build(
                name, [F.col("a"), F.col("b")], ["float64", "float64"]
            )
            rows = {r["i"]: r["o"] for r in pdf.select("i", col.alias("o")).collect()}
            for i, (x, y) in enumerate(pairs_d):
                want = ieee_cmp(name, x, y)
                if rows[i] is not want and rows[i] != want:
                    print(f"DIVERGE {name}({x!r},{y!r}) spark={rows[i]!r} jvm={want!r}")
                    bad += 1
        except Exception as exc:  # noqa: BLE001
            print(f"THROW  {name}(double,double): {type(exc).__name__}: {str(exc)[:120]}")
            bad += 1

    # mixed string/number comparisons: pinned rule = string side parses
    # as double, unparseable → NULL (the per-row kernel's float());
    # under ANSI the raw Spark coercion THREW CAST_INVALID_INPUT.
    # (Format caveat: Python float() also accepts 'inf'/'1_0' which
    # Spark does not — the probe sticks to the common subset.)
    strs = ["12", "3.5", "-7.25", "abc", "", "NaN", "Infinity", None]
    nums = [5.0, None, float("nan")]
    sdf = spark.createDataFrame(
        [(i, s, v) for i, (s, v) in enumerate((s, v) for s in strs for v in nums)],
        "i bigint, s string, v double",
    )

    def parse(s):
        if s is None:
            return None
        try:
            return float(s)
        except ValueError:
            return None

    for name in ("gt", "eq", "ne", "le"):
        try:
            col, _ = DEFAULT_REGISTRY.build(
                name, [F.col("s"), F.col("v")], ["string", "float64"]
            )
            rows = {r["i"]: r["o"] for r in sdf.select("i", col.alias("o")).collect()}
            for i, (s, v) in enumerate((s, v) for s in strs for v in nums):
                want = ieee_cmp(name, parse(s), v)
                if rows[i] is not want and rows[i] != want:
                    print(f"DIVERGE {name}({s!r},{v!r}) spark={rows[i]!r} want={want!r}")
                    bad += 1
        except Exception as exc:  # noqa: BLE001
            print(f"THROW  {name}(string,double): {type(exc).__name__}: {str(exc)[:120]}")
            bad += 1

    # casts: _jvm_cast vs the per-row kernel's JVM conversions
    from tsp_spark.compile.compiler import _jvm_cast
    from tsp_spark.streaming.stateful import _jvm_int

    for dst in ("int8", "int16", "int32", "int64"):
        try:
            col = _jvm_cast(F.col("v"), "float64", dst)
            rows = {r["i"]: r["o"] for r in df_d.select("i", col.alias("o")).collect()}
            for i, v in enumerate(dbl_edges):
                want = None if v is None else _jvm_int(v, dst)
                if rows[i] != want and rows[i] is not want:
                    print(f"DIVERGE cast({v!r} as {dst}) spark={rows[i]!r} jvm={want!r}")
                    bad += 1
        except Exception as exc:  # noqa: BLE001
            print(f"THROW  cast(double as {dst}): {type(exc).__name__}: {str(exc)[:120]}")
            bad += 1
        try:
            col = _jvm_cast(F.col("v"), "int64", dst)
            rows = {r["i"]: r["o"] for r in df_l.select("i", col.alias("o")).collect()}
            for i, v in enumerate(long_edges):
                want = None if v is None else _jvm_int(v, dst)
                if rows[i] != want and rows[i] is not want:
                    print(f"DIVERGE cast({v!r}L as {dst}) spark={rows[i]!r} jvm={want!r}")
                    bad += 1
        except Exception as exc:  # noqa: BLE001
            print(f"THROW  cast(long as {dst}): {type(exc).__name__}: {str(exc)[:120]}")
            bad += 1

    # boolean cast from double: zero/nonzero, NaN truthy (bool(nan))
    try:
        col = _jvm_cast(F.col("v"), "float64", "boolean")
        rows = {r["i"]: r["o"] for r in df_d.select("i", col.alias("o")).collect()}
        for i, v in enumerate(dbl_edges):
            want = None if v is None else bool(v) if not (
                isinstance(v, float) and math.isnan(v)
            ) else True
            if rows[i] is not want and rows[i] != want:
                print(f"DIVERGE cast({v!r} as boolean) spark={rows[i]!r} jvm={want!r}")
                bad += 1
    except Exception as exc:  # noqa: BLE001
        print(f"THROW  cast(double as boolean): {type(exc).__name__}: {str(exc)[:120]}")
        bad += 1

    # trilean logicals over the NULL/True/False grid (Fail-tolerant or)
    tri = [True, False, None]
    tdf = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate((x, y) for x in tri for y in tri)],
        "i bigint, x boolean, y boolean",
    )

    def tri_want(name, x, y):
        # the registry/oracle rule (FunctionRegistry.scala:278-324):
        # and/xor propagate Fail; or is fail-tolerant (one-sided Fail
        # returns the other side's VALUE). NB the per-row kernels use a
        # Kleene combinator instead — observationally identical because
        # the grammar asserts trilean factors (False → Fail before any
        # combinator sees it), see docs/SEMANTICS.md §21.
        if name == "and":
            return None if x is None or y is None else (x and y)
        if name == "or":
            if x is None and y is None:
                return None
            if x is None:
                return y
            if y is None:
                return x
            return x or y
        return None if x is None or y is None else x != y

    for name in ("and", "or", "xor"):
        try:
            col, _ = DEFAULT_REGISTRY.build(
                name, [F.col("x"), F.col("y")], ["boolean", "boolean"]
            )
            rows = {r["i"]: r["o"] for r in tdf.select("i", col.alias("o")).collect()}
            for i, (x, y) in enumerate((x, y) for x in tri for y in tri):
                want = tri_want(name, x, y)
                if rows[i] is not want and rows[i] != want:
                    print(f"DIVERGE {name}({x!r},{y!r}) spark={rows[i]!r} want={want!r}")
                    bad += 1
        except Exception as exc:  # noqa: BLE001
            print(f"THROW  {name}(bool,bool): {type(exc).__name__}: {str(exc)[:120]}")
            bad += 1

    print(f"\n{bad} divergences/throws")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
