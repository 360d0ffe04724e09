"""AST → Spark DataFrame compiler."""

from tsp_spark.compile.compiler import PatternCompiler, compile_pattern  # noqa: F401
