"""Hand-written tokenizer + recursive-descent parser for the TSP pattern DSL.

Grammar re-derived from the reference PEG (dsl/.../ASTBuilder.scala, see
SURVEY.md §2.9). Precedence (loosest → tightest):

    pattern     := trilean (('andThen'|'and'|'or') trilean)*        left-assoc
    trilean     := factor ['for' [exactly] time (range|tolerance)]  | factor 'until' boolExpr
    factor      := boolExpr | '(' pattern ')' | wait '(' time ',' pattern ')'
    boolExpr    := boolTerm (('or'|'xor') boolTerm)*
    boolTerm    := boolAtom ('and' boolAtom)*
    boolAtom    := 'not' boolAtom | comparison | '(' boolExpr ')'
    comparison  := arith [cmpOp arith]
    arith       := term (('+'|'-') term)* ; term := castf (('*'|'/') castf)*
    castf       := primary ['as' type]
    primary     := number | 'string' | true|false | func '(' … ')' | ident | '(' arith ')'

Reference quirks preserved (validated against the oracle harness):
  * repetition bounds: `< N` ⇒ count ≤ N, `<= N` ⇒ count ≤ N+1,
    `> N` ⇒ count ≥ N+1, `>= N` ⇒ count ≥ N (Intervals.scala:57-75,
    ASTBuilder.scala repetitionRange) — inclusive NumericInterval.
  * time bounds are inclusive on both ends (TimeInterval contains:
    min ≤ x ≤ max, Intervals.scala:29).
  * `for T` applies a ± tolerance fraction; Timer uses the interval MAX
    as the effective hold window (ASTPatternGenerator Timer case).
  * unknown identifiers default to float64 (ASTBuilder fieldValue).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from tsp_spark.dsl.ast import (
    AggregateCall,
    AndThen,
    Assert,
    Cast,
    Constant,
    ForWithInterval,
    FunctionCall,
    Identifier,
    Node,
    ReducerCall,
    TimeLiteral,
    Timer,
    Until,
    Wait,
)

MAX_WINDOW_MS = 2**53  # effectively infinite (the reference's MaxWindow)

_TIME_UNITS = {
    "seconds": 1000,
    "sec": 1000,
    "minutes": 60_000,
    "min": 60_000,
    "milliseconds": 1,
    "ms": 1,
    "hours": 3_600_000,
    "hr": 3_600_000,
}

_TYPE_NAMES = {"int8", "int16", "int32", "int64", "float32", "float64", "boolean", "string"}

_KEYWORDS = {
    "andthen", "and", "or", "xor", "not", "for", "exactly", "until", "wait",
    "to", "times", "as", "true", "false",
} | set(_TIME_UNITS) | _TYPE_NAMES

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<number>\d+(?:\.\d+)?)
  | (?P<dqstring>"(?:[^"]|"")+")
  | (?P<sqstring>'(?:[^']|'')*')
  | (?P<word>[A-Za-z][A-Za-z0-9_]*)
  | (?P<op><=|>=|!=|<>|\+-|[<>=+\-*/(),;%_])
    """,
    re.VERBOSE,
)


class ParseError(ValueError):
    pass


@dataclass(frozen=True)
class Tok:
    kind: str  # 'number' | 'word' | 'kw' | 'op' | 'dqident' | 'string' | 'eof'
    text: str
    pos: int


def tokenize(src: str) -> list[Tok]:
    toks: list[Tok] = []
    i = 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise ParseError(f"Unexpected character {src[i]!r} at {i} in pattern")
        i = m.end()
        if m.lastgroup == "ws":
            continue
        text = m.group()
        kind = m.lastgroup
        if kind == "word":
            if text.lower() in _KEYWORDS:
                toks.append(Tok("kw", text.lower(), m.start()))
            else:
                toks.append(Tok("word", text, m.start()))
        elif kind == "dqstring":
            toks.append(Tok("dqident", text[1:-1].replace('""', '"'), m.start()))
        elif kind == "sqstring":
            toks.append(Tok("string", text[1:-1].replace("''", "'"), m.start()))
        else:
            toks.append(Tok(kind, text, m.start()))
    toks.append(Tok("eof", "", len(src)))
    return toks


_CMP_OPS = {"<", "<=", ">", ">=", "=", "!=", "<>"}


class Parser:
    def __init__(
        self,
        src: str,
        fields_types: dict[str, str] | None = None,
        tolerance_fraction: float = 0.0,
    ):
        self.toks = tokenize(src)
        self.pos = 0
        self.fields = {k.lower(): (k, v) for k, v in (fields_types or {}).items()}
        self.tol = tolerance_fraction

    # --- token helpers -------------------------------------------------
    def peek(self, ahead: int = 0) -> Tok:
        return self.toks[min(self.pos + ahead, len(self.toks) - 1)]

    def next(self) -> Tok:
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def at_kw(self, *kws: str) -> bool:
        t = self.peek()
        return t.kind == "kw" and t.text in kws

    def at_op(self, *ops: str) -> bool:
        t = self.peek()
        return t.kind == "op" and t.text in ops

    def eat_kw(self, kw: str) -> None:
        if not self.at_kw(kw):
            raise ParseError(f"Expected '{kw}' at {self.peek().pos}, got {self.peek().text!r}")
        self.next()

    def eat_op(self, op: str) -> None:
        if not self.at_op(op):
            raise ParseError(f"Expected '{op}' at {self.peek().pos}, got {self.peek().text!r}")
        self.next()

    # --- entry ---------------------------------------------------------
    def parse(self) -> Node:
        node = self.trilean_expr()
        if self.peek().kind != "eof":
            t = self.peek()
            raise ParseError(f"Trailing input at {t.pos}: {t.text!r}")
        return node

    # --- trilean layer -------------------------------------------------
    def trilean_expr(self) -> Node:
        node = self.trilean_term()
        while self.at_kw("andthen", "and", "or"):
            op = self.next().text
            rhs = self.trilean_term()
            if op == "andthen":
                node = AndThen(node, rhs)
            else:
                node = FunctionCall(op, (node, rhs))
        return node

    def trilean_term(self) -> Node:
        inner = self.trilean_factor()
        if self.at_kw("for"):
            self.next()
            exactly = False
            if self.at_kw("exactly"):
                self.next()
                exactly = True
            return self.for_suffix(inner, exactly)
        if self.at_kw("until"):
            self.next()
            cond = self.boolean_expr()
            # optional range is parsed but ignored by the reference too
            # (ASTBuilder.scala:48-50 discards the captured range)
            self.try_range()
            return Until(inner, cond)
        return inner

    def for_suffix(self, inner: Node, exactly: bool) -> Node:
        win_ms = self.time_literal()
        # `T to T2` — bounded timer. Inverted bounds (T > T2) are
        # ACCEPTED like the reference (ASTBuilder.scala:269-272 builds
        # TimeInterval(t1, t2) with no ordering check): the resulting
        # never-matching timer is the reference's behavior for that
        # input, and patterns/validate must agree with its validator.
        if self.at_kw("to"):
            self.next()
            hi = self.time_literal()
            return Timer(inner, window_ms=hi, exactly=exactly, min_window_ms=win_ms)
        # `T +- tol` / `T +- p %`
        if self.at_op("+-"):
            self.next()
            save = self.pos
            if self.peek().kind == "number":
                num = float(self.next().text)
                if self.at_op("%"):
                    self.next()
                    tol = num * 0.01 * win_ms
                else:
                    self.pos = save
                    tol = float(self.time_literal())
            else:
                tol = float(self.time_literal())
            return Timer(
                inner,
                window_ms=int(win_ms + tol),
                exactly=exactly,
                min_window_ms=max(int(win_ms - tol), 0),
            )
        rng = self.try_range()
        if rng is not None:
            kind, lo, hi = rng
            return ForWithInterval(
                inner, window_ms=win_ms, exactly=exactly, kind=kind, lo=lo, hi=hi
            )
        # plain `for T` with default tolerance fraction
        tol = win_ms * self.tol
        return Timer(
            inner,
            window_ms=int(win_ms + tol),
            exactly=exactly,
            min_window_ms=max(int(win_ms - tol), 0),
        )

    def try_range(self):
        """range := cmpOp (N 'times' | time) | N 'to' N 'times' | time 'to' time.

        Returns (kind, lo, hi) with inclusive bounds, or None. Reference
        bound quirks per module docstring."""
        save = self.pos
        try:
            if self.peek().kind == "op" and self.peek().text in _CMP_OPS:
                op = self.next().text
                if self.peek().kind != "number":
                    raise ParseError("range needs a number")
                num = float(self.next().text)
                if self.at_kw("times"):
                    self.next()
                    n = int(num)
                    bounds = {
                        "<": (0, n), "<=": (0, n + 1),
                        ">": (n + 1, None), ">=": (n, None),
                    }
                    if op not in bounds:
                        raise ParseError(f"op {op} not valid in repetition range")
                    lo, hi = bounds[op]
                    return ("times", float(lo), None if hi is None else float(hi))
                # time range: number must be followed by a unit
                unit = self._time_unit()
                ms = num * unit
                ms += self._extra_time_ms()
                if op in ("<", "<="):
                    return ("time", 0.0, ms)
                if op in (">", ">="):
                    return ("time", ms, None)
                raise ParseError(f"op {op} not valid in time range")
            if self.peek().kind == "number":
                # N to M times | T1 to T2 (times handled in for_suffix via time path)
                num = float(self.next().text)
                if self.at_kw("to"):
                    self.next()
                    if self.peek().kind != "number":
                        raise ParseError("range needs a number after 'to'")
                    num2 = float(self.next().text)
                    if self.at_kw("times"):
                        self.next()
                        return ("times", num, num2)
                    unit = self._time_unit()
                    return ("time", num * unit, num2 * unit)
                raise ParseError("not a range")
            raise ParseError("not a range")
        except ParseError:
            self.pos = save
            return None

    def trilean_factor(self) -> Node:
        if self.at_kw("wait"):
            return self.wait_rule()
        save = self.pos
        try:
            b = self.boolean_expr()
            return Assert(b)
        except ParseError as inner:
            boolean_far = self.pos  # how far the boolean layer got
            self.pos = save
            boolean_err = inner
        try:
            self.eat_op("(")
            node = self.trilean_expr()
            self.eat_op(")")
            return node
        except ParseError as perr:
            # Surface whichever attempt consumed more input — its
            # diagnostic points nearest the real problem: a dangling
            # `x and` dies deep in the boolean layer, a malformed
            # `(a andThen )` dies deep in the paren/trilean layer.
            paren_far = self.pos
            self.pos = save
            if boolean_far >= paren_far:
                raise boolean_err
            raise perr

    def wait_rule(self) -> Node:
        self.eat_kw("wait")
        self.eat_op("(")
        win = self.time_literal()
        self.eat_op(",")
        inner = self.trilean_expr()
        self.eat_op(")")
        return Wait(window_ms=win, inner=inner)

    # --- boolean layer -------------------------------------------------
    def boolean_expr(self) -> Node:
        node = self.boolean_term()
        while self.at_kw("or", "xor"):
            save = self.pos
            op = self.next().text
            try:
                rhs = self.boolean_term()
            except ParseError:
                # PEG zeroOrMore(op ~ term): a failing term backtracks
                # the WHOLE group, so `x or wait(…)` leaves `or wait(…)`
                # for the trilean layer instead of failing the parse
                self.pos = save
                break
            node = FunctionCall(op, (node, rhs))
        return node

    def boolean_term(self) -> Node:
        node = self.boolean_factor()
        while self.at_kw("and"):
            save = self.pos
            self.next()
            try:
                rhs = self.boolean_factor()
            except ParseError:
                self.pos = save
                break
            node = FunctionCall("and", (node, rhs))
        return node

    def boolean_factor(self) -> Node:
        if self.at_kw("not"):
            self.next()
            return FunctionCall("not", (self.boolean_factor(),))
        if self.at_op("("):
            save = self.pos
            try:
                self.next()
                node = self.boolean_expr()
                self.eat_op(")")
                # reject if an arithmetic/comparison continues: `(a) + 1 > 2`
                if self.at_op("+", "-", "*", "/") or (
                    self.peek().kind == "op" and self.peek().text in _CMP_OPS
                ):
                    raise ParseError("arithmetic paren, not boolean")
                return node
            except ParseError:
                self.pos = save
        return self.comparison()

    def comparison(self) -> Node:
        left = self.arith_expr()
        if self.peek().kind == "op" and self.peek().text in _CMP_OPS:
            op = self.next().text
            right = self.arith_expr()
            name = {
                "<": "lt", "<=": "le", ">": "gt", ">=": "ge",
                "=": "eq", "!=": "ne", "<>": "ne",
            }[op]
            return FunctionCall(name, (left, right))
        return left

    # --- arithmetic layer ----------------------------------------------
    def arith_expr(self) -> Node:
        node = self.arith_term()
        while self.at_op("+", "-"):
            op = self.next().text
            node = FunctionCall("add" if op == "+" else "sub", (node, self.arith_term()))
        return node

    def arith_term(self) -> Node:
        node = self.cast_factor()
        while self.at_op("*", "/"):
            op = self.next().text
            node = FunctionCall("mul" if op == "*" else "div", (node, self.cast_factor()))
        return node

    def cast_factor(self) -> Node:
        node = self.primary()
        if self.at_kw("as"):
            self.next()
            t = self.peek()
            if t.kind == "kw" and t.text in _TYPE_NAMES:
                self.next()
                return Cast(node, t.text)
            raise ParseError(f"Unknown type name {t.text!r} at {t.pos}")
        return node

    def primary(self) -> Node:
        t = self.peek()
        if t.kind == "number":
            self.next()
            v = float(t.text) if "." in t.text else int(t.text)
            return Constant(v)
        if t.kind == "op" and t.text in ("-", "+"):
            # signed literal / unary minus extension
            self.next()
            inner = self.primary()
            if t.text == "-":
                if isinstance(inner, Constant) and isinstance(inner.value, (int, float)):
                    return Constant(-inner.value)
                return FunctionCall("sub", (Constant(0), inner))
            return inner
        if t.kind == "string":
            self.next()
            return Constant(t.text)
        if t.kind == "kw" and t.text in ("true", "false"):
            self.next()
            return Constant(t.text == "true")
        if t.kind == "op" and t.text == "_":
            self.next()
            return Identifier("_", "float64")
        if t.kind == "op" and t.text == "(":
            self.next()
            node = self.arith_expr()
            self.eat_op(")")
            return node
        if t.kind in ("word", "dqident"):
            if self.peek(1).kind == "op" and self.peek(1).text == "(" and t.kind == "word":
                return self.function_call()
            self.next()
            return self._identifier(t.text)
        if (
            t.kind == "kw"
            and t.text in _TIME_UNITS
            and self.peek(1).kind == "op"
            and self.peek(1).text == "("
        ):
            # `min` is both the minutes unit and the windowed-aggregate
            # name: a unit keyword immediately followed by '(' can only
            # be a function call (no grammar rule puts '(' after a unit)
            return self.function_call()
        raise ParseError(f"Unexpected token {t.text!r} at {t.pos}")

    def _identifier(self, name: str) -> Identifier:
        known = self.fields.get(name.lower())
        if known:
            return Identifier(known[0], known[1])
        return Identifier(name, None)  # compiler defaults to float64

    def function_call(self) -> Node:
        name = self.next().text
        lname = name.lower()
        self.eat_op("(")
        args: list[Node] = []
        cond: Node | None = None
        window_ms: int | None = None
        if not self.at_op(")"):
            while True:
                # a time literal arg (for windowed aggregates)
                save = self.pos
                try:
                    window_ms = self.time_literal()
                    args.append(TimeLiteral(window_ms))
                except ParseError:
                    self.pos = save
                    window_ms = None
                    args.append(self.arith_expr())
                if self.at_op(","):
                    self.next()
                    continue
                break
            if self.at_op(";"):
                self.next()
                cond = self.underscore_constraint()
        self.eat_op(")")

        if lname.endswith("of"):
            # ANY name ending in "of" routes to the reducer layer — the
            # reference does exactly this (ASTBuilder.scala:380
            # `case x if x.endsWith("of")`), so an unknown `floof(x)`
            # fails later with "Unknown reducer", same as there
            return ReducerCall(lname, tuple(a for a in args), cond)
        times = [a for a in args if isinstance(a, TimeLiteral)]
        exprs = [a for a in args if not isinstance(a, TimeLiteral)]
        if lname == "lag" and not times:
            if len(exprs) != 1:
                raise ParseError("lag(x) takes exactly 1 argument without a window")
            return AggregateCall("lag", exprs[0], 0)
        if times and lname in ("avg", "sum", "count", "lag", "min", "max"):
            if len(exprs) != 1 or len(times) != 1:
                raise ParseError(f"{name}(x, T) takes one expression and one window")
            return AggregateCall(lname, exprs[0], times[0].millis)
        if times:
            raise ParseError(f"{name} does not accept a time-window argument")
        return FunctionCall(lname, tuple(exprs))

    def underscore_constraint(self) -> Node:
        """Boolean expression over the '_' placeholder."""
        return self.boolean_expr()

    # --- time literals -------------------------------------------------
    def time_literal(self) -> int:
        """One-or-more (number unit) groups, summed (compound literals:
        `1 min 30 sec`)."""
        if self.peek().kind != "number":
            raise ParseError(f"Expected time literal at {self.peek().pos}")
        num = float(self.next().text)
        unit = self._time_unit()
        ms = num * unit
        ms += self._extra_time_ms()
        return int(ms)

    def _extra_time_ms(self) -> float:
        total = 0.0
        while self.peek().kind == "number":
            save = self.pos
            num = float(self.next().text)
            try:
                unit = self._time_unit()
            except ParseError:
                self.pos = save
                break
            total += num * unit
        return total

    def _time_unit(self) -> int:
        t = self.peek()
        if t.kind == "kw" and t.text in _TIME_UNITS:
            self.next()
            return _TIME_UNITS[t.text]
        raise ParseError(f"Expected time unit at {t.pos}, got {t.text!r}")


def parse_pattern(
    src: str,
    fields_types: dict[str, str] | None = None,
    tolerance_fraction: float = 0.0,
) -> Node:
    """Parse a TSP DSL pattern string into an AST.

    ``fields_types`` maps known column names to type tags ('float64', …);
    unknown identifiers default to float64 at compile time, matching the
    reference (ASTBuilder.scala fieldValue).
    """
    return Parser(src, fields_types, tolerance_fraction).parse()
