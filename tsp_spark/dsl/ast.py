"""AST node types for the TSP pattern DSL.

Mirrors the *shape* of the reference AST (dsl/.../AST.scala:14-172 —
Constant, Identifier, FunctionCall, ReducerFunctionCall, AggregateCall,
AndThen, Timer, Wait, ForWithInterval, Cast, Assert) as plain Python
dataclasses. Types are tracked loosely (Spark casts at compile time).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Node:
    """Base AST node."""


@dataclass(frozen=True)
class Constant(Node):
    value: object  # int | float | str | bool


@dataclass(frozen=True)
class Identifier(Node):
    name: str
    # declared type tag if known ('float64', 'string', …); None = infer
    dtype: str | None = None


@dataclass(frozen=True)
class TimeLiteral(Node):
    millis: int


@dataclass(frozen=True)
class FunctionCall(Node):
    name: str  # lower-cased
    args: tuple[Node, ...]


@dataclass(frozen=True)
class ReducerCall(Node):
    """sumOf/minOf/maxOf/countOf/avgOf(a, b, …; optional per-element
    underscore predicate like `_ > 0`). ``cond`` is a boolean AST over
    the placeholder Identifier('_')."""

    name: str  # 'sumof' | 'minof' | 'maxof' | 'countof' | 'avgof'
    args: tuple[Node, ...]
    cond: Node | None = None


@dataclass(frozen=True)
class AggregateCall(Node):
    """Windowed aggregate over trailing event time: avg/sum/count/min/max
    (x, T); lag(x) / lag(x, T)."""

    kind: str  # 'avg' | 'sum' | 'count' | 'min' | 'max' | 'lag'
    inner: Node
    window_ms: int  # 0 for plain lag(x)


@dataclass(frozen=True)
class Cast(Node):
    inner: Node
    dtype: str  # int8…float64, boolean, string


@dataclass(frozen=True)
class AndThen(Node):
    left: Node
    right: Node


@dataclass(frozen=True)
class Timer(Node):
    """`X for [exactly] T` — condition holds continuously for the window.

    ``window_ms`` is the effective (max) hold window — the reference's
    TimerPattern uses the tolerance interval's max
    (ASTPatternGenerator.scala Timer case); ``min_window_ms`` retains the
    interval min for completeness.
    """

    inner: Node
    window_ms: int
    exactly: bool = False
    min_window_ms: int | None = None


@dataclass(frozen=True)
class ForWithInterval(Node):
    """`X for [exactly] T <op> N times | <op> T' | N1 to N2 times | T1 to T2`
    — truth-count / truth-duration constraint within the window."""

    inner: Node
    window_ms: int
    exactly: bool
    # inclusive-bounds constraint on either the count of true events
    # ('times') or the total true duration in ms ('time') in the window
    kind: str  # 'times' | 'time'
    lo: float | None  # inclusive lower bound (0 = none)
    hi: float | None = None  # inclusive upper bound; None = unbounded


@dataclass(frozen=True)
class Until(Node):
    """`X until B` — X holds (up to a max window) until the first B."""

    left: Node
    right: Node


@dataclass(frozen=True)
class Wait(Node):
    """`wait(T, X)` — shift success interval start earlier by T."""

    window_ms: int
    inner: Node


@dataclass(frozen=True)
class Assert(Node):
    """Top-level boolean → success/fail (the implicit outermost node)."""

    inner: Node
