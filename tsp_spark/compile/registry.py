"""Scalar function registry: name → pyspark Column builder.

Re-expresses the reference's DefaultFunctionRegistry
(dsl/.../FunctionRegistry.scala:560-592) as Column-expression builders —
JVM-side, codegen'd, no Python row UDFs. Users extend by registering a
Python builder (the reference's extension point is the same shape:
a map (name, argtypes) → function, FunctionRegistry.scala:24-43).

Trilean algebra (FunctionRegistry.scala:278-324): NULL is Fail.
`or` tolerates one-sided Fail — `coalesce(a OR b, a, b)`; `and` fails if
either side fails (note SQL would give false AND NULL = false, so we
force NULL explicitly); `xor`/`not`/comparisons/arithmetic propagate NULL
natively.

Type handling: the cast lattice (FunctionRegistry.scala:53-68) collapses
in Spark — Catalyst inserts numeric promotions; we only track enough to
reproduce integer division (`div` on int args truncates like Scala's
Int division, FunctionRegistry.scala:522-536) and cast targets.

Includes the documented-but-unimplemented math functions as extensions
(docs/writing-patterns.md:145-151): exp, ln, log, sigmoid.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

_INT_TYPES = {"int8", "int16", "int32", "int64", "boolean"}
_SPARK_NAMES = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float32": "float",
    "float64": "double",
    "boolean": "boolean",
    "string": "string",
}


def spark_type_name(dtype: str | None) -> str | None:
    return _SPARK_NAMES.get(dtype or "")


def numeric_result_type(a: str, b: str) -> str:
    if a == "string" or b == "string":
        return "string"
    if a in _INT_TYPES and b in _INT_TYPES:
        return "int64"
    return "float64"


Builder = Callable[[Sequence[Column], Sequence[str]], tuple[Column, str]]


def _cmp(op: str) -> Builder:
    def build(cols, dtypes):
        a, b = cols
        dts = list(dtypes)
        if (dts[0] == "string") != (dts[1] == "string"):
            # mixed string/number comparison: the pinned rule (per-row
            # kernel, docs/SEMANTICS.md) coerces the STRING side to
            # double — unparseable → NULL (Result.fail). Spark's
            # implicit coercion instead targets the numeric side's type
            # and, under ANSI (the Spark 4 default), THROWS
            # CAST_INVALID_INPUT on the first malformed row (r14 §20 —
            # the same library-vs-session class as _jvm_div). try_cast
            # pins NULL session-independently; both sides to double so
            # `5 > '3.5'` compares 3.5, not an integral-string parse.
            a = a.try_cast("double") if dts[0] == "string" else a.cast("double")
            b = b.try_cast("double") if dts[1] == "string" else b.cast("double")
            cols = [a, b]
            dts = ["float64", "float64"]
        col = {
            "lt": a < b, "le": a <= b, "gt": a > b,
            "ge": a >= b, "eq": a == b, "ne": a != b,
        }[op]
        # IEEE NaN comparisons (the reference compares primitive Doubles:
        # FunctionRegistry.scala comparingFunctions over scala.Double —
        # NaN <,<=,>,>=,= anything → false, != → true). Spark instead
        # totals-orders NaN (greatest, equal to itself), so guard
        # explicitly when a float side can be NaN; golden ivolga cases
        # 19/21/28/30/36 pin this behavior (expired forward-fill → NaN).
        floaty = [
            c for c, t in zip(cols, dts) if t in ("float32", "float64")
        ]
        if floaty:
            some_nan = floaty[0].isNaN()
            for c in floaty[1:]:
                some_nan = some_nan | c.isNaN()
            # NULL propagates FIRST (r14 §20, probe-caught): isNaN(NaN)
            # is true even when the OTHER side is NULL, so the bare NaN
            # guard turned cmp(NaN, NULL) into False/True where the
            # per-row kernel and the oracle give Result.fail — for `!=`
            # that's a spurious MATCH on NaN-vs-absent rows
            col = (
                F.when(a.isNull() | b.isNull(), F.lit(None).cast("boolean"))
                .when(some_nan, F.lit(op == "ne"))
                .otherwise(col)
            )
        return col, "boolean"

    return build


def _jvm_div(a: Column, b: Column) -> Column:
    """Double division with JVM semantics, INDEPENDENT of the session's
    `spark.sql.ansi.enabled` (r14: a fresh-seed fuzz hit a zero divisor
    and Spark 4's ANSI default threw DIVIDE_BY_ZERO mid-job — but this
    engine is a library running under the CALLER's session, and the
    reference divides JVM doubles: x/0.0 = ±Inf, 0/0 = NaN,
    FunctionRegistry.scala:141 via Fractional[Double].div). The CASE
    guard keeps the raw division unevaluated on zero-divisor rows, so
    ANSI never fires; the zero branch reproduces the pinned oracle
    semantics (tools/ref_oracle.py `div`): sign of the DIVIDEND picks
    the infinity (Spark's NaN >= 0 is true, matching copysign's
    positive NaN), zero/zero (±0 included) is NaN, NULL operands stay
    NULL."""
    ad, bd = a.cast("double"), b.cast("double")
    return (
        F.when(bd != 0, ad / bd)
        .when(bd.isNull() | ad.isNull(), F.lit(None).cast("double"))
        .when(ad == 0, F.lit(float("nan")))
        .when(ad >= 0, F.lit(float("inf")))   # NaN dividend lands here
        .otherwise(F.lit(float("-inf")))
    )


_LONG_MIN = -(1 << 63)
_LONG_MAX = (1 << 63) - 1
# 2^63 / 2^64 as decimal literals (too wide for a long lit)
_DEC_SHIFT = "CAST('9223372036854775808' AS DECIMAL(38,0))"
_DEC_MOD = "CAST('18446744073709551616' AS DECIMAL(38,0))"


def wrap64_to_long(dec: Column) -> Column:
    """Map an exact DECIMAL value onto Scala Long wrap-around semantics
    (value mod 2^64, into [-2^63, 2^63)) and cast to bigint. The pmod
    keeps the final cast in-range, so it never trips ANSI overflow
    (r14, docs/SEMANTICS.md §20)."""
    shift, mod = F.expr(_DEC_SHIFT), F.expr(_DEC_MOD)
    return (F.pmod(dec + shift, mod) - shift).cast("long")


def _jvm_recip(t: Column) -> Column:
    """JVM `1.0 / t` without tripping ANSI DIVIDE_BY_ZERO (r14: Spark 4
    throws on double division by an exact zero under the default ANSI
    session — probe_ansi_edges caught cot(0) crashing). The zero branch
    reproduces IEEE: 1/±0.0 → ±Inf by the ZERO's sign, recovered via the
    string cast ('-0.0' keeps its sign; atan2 can't be used — Spark's
    Atan2 normalizes -0.0). NaN divisors pass through the division
    (NaN != 0 is true under Spark's total order; 1/NaN = NaN)."""
    return (
        F.when(t.isNull(), F.lit(None).cast("double"))
        .when(t != 0, F.lit(1.0) / t)
        .when(t.cast("string").startswith("-"), F.lit(float("-inf")))
        .otherwise(F.lit(float("inf")))
    )


def _jvm_log(base10: bool) -> Callable[[Column], Column]:
    """JVM Math.log/log10 edges (r14 §20): ±0.0 → -Inf, negative → NaN,
    NaN → NaN, +Inf → +Inf, NULL → NULL. Spark's own log/log10 return
    NULL for any non-positive input — under the engine's trilean
    algebra that's Result.fail, a different outcome from the reference
    extension's documented JVM math."""

    def build(c: Column) -> Column:
        fn = F.log10 if base10 else F.log
        return (
            F.when(F.isnan(c), F.lit(float("nan")))
            .when(c == 0, F.lit(float("-inf")))
            .when(c < 0, F.lit(float("nan")))
            .otherwise(fn(c))
        )

    return build


def _arith(op: str) -> Builder:
    def build(cols, dtypes):
        a, b = cols
        rtype = numeric_result_type(dtypes[0], dtypes[1])
        if rtype == "int64":
            # Scala Long semantics, session-independent (r14 §20):
            # add/sub/mul WRAP mod 2^64 (Numeric[Long] plus/minus/times,
            # FunctionRegistry.scala:538-551) — the hot path stays a
            # native long try_op, the rare overflow falls through the
            # lazy coalesce to an exact decimal recomputation wrapped
            # back into long range. Under ANSI the raw +/-/* would
            # THROW ARITHMETIC_OVERFLOW; non-ANSI silently matched the
            # JVM only by accident of both wrapping.
            al, bl = a.cast("long"), b.cast("long")
            if op in ("add", "sub", "mul"):
                try_op = {
                    "add": F.try_add,
                    "sub": F.try_subtract,
                    "mul": F.try_multiply,
                }[op]
                # operands fit decimal(19,0); the widest product
                # (2^63)^2 = 2^126 < 10^38 fits the capped decimal(38,0)
                da, db = al.cast("decimal(19,0)"), bl.cast("decimal(19,0)")
                dec = {"add": da + db, "sub": da - db, "mul": da * db}[op]
                return F.coalesce(try_op(al, bl), wrap64_to_long(dec)), rtype
            # div: EXACT Long division truncating toward zero
            # (fractionalLong.div = x / y, FunctionRegistry.scala:539);
            # Long.MIN / -1 wraps to Long.MIN (JLS 15.17.2). The r14
            # double-mediated form lost exactness above 2^53
            # (probe_ansi_edges: Long.MAX div -7 off by 73). Division
            # by zero keeps the engine's pinned saturation (the
            # reference throws ArithmeticException there — our /0
            # extension routes the double-division infinity through
            # Double.toLong, SEMANTICS.md §19).
            return (
                F.when(al.isNull() | bl.isNull(), F.lit(None).cast("long"))
                .when(
                    bl == 0,
                    F.when(al == 0, F.lit(0))
                    .when(al > 0, F.lit(_LONG_MAX))
                    .otherwise(F.lit(_LONG_MIN))
                    .cast("long"),
                )
                .when((al == _LONG_MIN) & (bl == -1), F.lit(_LONG_MIN).cast("long"))
                .otherwise(F.call_function("div", al, bl))
            ), rtype
        if op == "add":
            col = a + b
        elif op == "sub":
            col = a - b
        elif op == "mul":
            col = a * b
        else:  # div
            return _jvm_div(a, b), rtype
        return col, rtype

    return build


def _math1(fn: Callable[[Column], Column]) -> Builder:
    def build(cols, dtypes):
        return fn(cols[0].cast("double")), "float64"

    return build


def _logical(name: str) -> Builder:
    def build(cols, dtypes):
        if name == "not":
            return ~cols[0].cast("boolean"), "boolean"
        a, b = (c.cast("boolean") for c in cols)
        if name == "and":
            col = F.when(a.isNull() | b.isNull(), F.lit(None).cast("boolean")).otherwise(
                a & b
            )
        elif name == "or":
            col = F.coalesce(a | b, a, b)
        else:  # xor
            col = a != b
        return col, "boolean"

    return build


class FunctionRegistry:
    def __init__(self) -> None:
        self._fns: dict[str, Builder] = {}

    def register(self, name: str, builder: Builder) -> None:
        self._fns[name.lower()] = builder

    def build(self, name: str, cols: Sequence[Column], dtypes: Sequence[str]) -> tuple[Column, str]:
        fn = self._fns.get(name.lower())
        if fn is None:
            raise ValueError(f"Unknown function: {name}")
        return fn(cols, dtypes)

    def names(self) -> list[str]:
        return sorted(self._fns)


def default_registry() -> FunctionRegistry:
    r = FunctionRegistry()
    for op in ("lt", "le", "gt", "ge", "eq", "ne"):
        r.register(op, _cmp(op))
    for op in ("add", "sub", "mul", "div"):
        r.register(op, _arith(op))
    for name in ("and", "or", "xor", "not"):
        r.register(name, _logical(name))

    def _abs(cols, dts):
        rtype = numeric_result_type(dts[0], dts[0])
        if rtype == "int64":
            # Math.abs(Long.MIN) is Long.MIN (JVM two's complement);
            # Spark's abs THROWS there under ANSI (r14 §20)
            c = cols[0].cast("long")
            return (
                F.when(c == _LONG_MIN, F.lit(_LONG_MIN).cast("long")).otherwise(
                    F.abs(c)
                ),
                rtype,
            )
        return F.abs(cols[0]), rtype

    r.register("abs", _abs)
    r.register("sin", _math1(F.sin))
    r.register("cos", _math1(F.cos))
    for alias in ("tan", "tg"):
        r.register(alias, _math1(F.tan))
    for alias in ("cot", "ctg"):
        r.register(alias, _math1(lambda c: _jvm_recip(F.tan(c))))
    # degree variants (FunctionRegistry.scala:194-276 applies toRadians)
    r.register("sind", _math1(lambda c: F.sin(F.radians(c))))
    r.register("cosd", _math1(lambda c: F.cos(F.radians(c))))
    for alias in ("tand", "tgd"):
        r.register(alias, _math1(lambda c: F.tan(F.radians(c))))
    for alias in ("cotd", "ctgd"):
        r.register(alias, _math1(lambda c: _jvm_recip(F.tan(F.radians(c)))))
    # documented-but-unimplemented in the reference — provided as extensions
    r.register("exp", _math1(F.exp))
    r.register("ln", _math1(_jvm_log(base10=False)))
    r.register("log", _math1(_jvm_log(base10=True)))
    r.register("sqrt", _math1(F.sqrt))
    r.register(
        "sigmoid",
        lambda cols, dts: (
            F.lit(1.0)
            / (
                F.lit(1.0)
                + F.exp(
                    F.lit(-2.0)
                    * (cols[1].cast("double") if len(cols) > 1 else F.lit(1.0))
                    * cols[0].cast("double")
                )
            ),
            "float64",
        ),
    )
    return r


DEFAULT_REGISTRY = default_registry()
