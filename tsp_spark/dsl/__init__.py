"""The TSP pattern DSL: tokenizer, AST, parser.

Grammar re-derived from the reference's parboiled2 PEG
(dsl/.../ASTBuilder.scala, surveyed in SURVEY.md §2.9) — implemented
fresh as a hand-written recursive-descent parser; no code ported.
"""

from tsp_spark.dsl.ast import *  # noqa: F401,F403
from tsp_spark.dsl.parser import parse_pattern  # noqa: F401
