"""JDBC source/sink (SURVEY §2.1).

The reference streams a user SQL query through a single connection in
1000-row pages (StreamSource.scala:244-252) — inherently one-node. Here
the same config becomes a Spark JDBC scan: Catalyst pushes the
projection down to the remote database (only pattern-referenced columns
are fetched), and on a cluster the read parallelizes via
partitionColumn bounds when provided. Schema inference matches
JdbcService.scala:9-25 (`SELECT * FROM (q) LIMIT 1` + metadata) —
Spark's JDBC relation does exactly that probe under the hood.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tsp_spark.io.conf import (
    SPARK_TO_WIRE as _TYPE_TAGS,
    JDBCInputConf,
    JDBCOutputConf,
)


def jdbc_source(spark: SparkSession, conf: JDBCInputConf) -> DataFrame:
    """The reference's JdbcSource (StreamSource.scala:136-315) as a
    Spark JDBC relation over the user's query."""
    reader = (
        spark.read.format("jdbc")
        .option("url", conf.jdbc_url)
        .option("driver", conf.driver_name)
        .option("fetchsize", conf.fetch_size)
    )
    if conf.user_name:
        reader = reader.option("user", conf.user_name)
    if conf.password:
        reader = reader.option("password", conf.password)
    if conf.partition_column:
        # parallel scan: Spark splits the query into numPartitions range
        # predicates — the scale path the single-connection reference
        # lacks. Spark forbids `query` alongside partitionColumn, so the
        # user query becomes a derived table.
        reader = (
            reader.option("dbtable", f"({conf.query}) tsp_src")
            .option("partitionColumn", conf.partition_column)
            .option("numPartitions", conf.num_partitions or 32)
            .option("lowerBound", conf.lower_bound or 0)
            .option("upperBound", conf.upper_bound or 1 << 31)
        )
    else:
        reader = reader.option("query", conf.query)
    return reader.load()


def infer_fields_types(spark: SparkSession, conf: JDBCInputConf) -> dict[str, str]:
    """Schema inference (JdbcService.scala:9-25): field → wire type tag."""
    df = jdbc_source(spark, conf)
    return {
        f.name: _TYPE_TAGS.get(f.dataType.simpleString(), "float64")
        for f in df.schema.fields
    }


def jdbc_sink(df: DataFrame, conf: JDBCOutputConf, mode: str = "append") -> None:
    """Row inserts through doobie (OutputConf.scala:62-71) → Spark JDBC
    batch writer (`batchsize` mirrors the reference's 100-row batches)."""
    writer = (
        df.write.format("jdbc")
        .option("url", conf.jdbc_url)
        .option("driver", conf.driver_name)
        .option("dbtable", conf.table_name)
        .option("batchsize", conf.batch_size)
    )
    if conf.user_name:
        writer = writer.option("user", conf.user_name)
    if conf.password:
        writer = writer.option("password", conf.password)
    writer.mode(mode).save()
