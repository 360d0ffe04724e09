"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship multi-pattern CEP job on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2 +
    pipeline extensions); each callable takes (spark, sf_dir).
``oracle_sql()`` — DuckDB-equivalent SQL per query (omitted only for
    genuinely non-SQL-expressible ops → rows-only check).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: multi-pattern incident search over sf0.001 events."""
    from tsp_spark.queries import q_cep_incidents_multi

    return q_cep_incidents_multi(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tsp_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from tsp_spark.queries import ORACLES

    return dict(ORACLES)
