"""Kafka source/sink (SURVEY §2.1, streaming).

The reference subscribes with fs2-kafka and JSON-decodes each record
positionally against the declared `fieldsTypes`
(StreamSource.scala:319-443, serialization/Deserializer.scala:14-40).
Here: `readStream.format("kafka")` + `from_json` with the declared
schema — the decode is a Column expression (`kafka_value_schema` /
`decode_json_value`), so it is unit-testable without a broker and
identical in batch (`spark.read.format("kafka")`) and streaming.

Test-environment boundary (verified r8): this container ships NO
`spark-sql-kafka` connector jar (pyspark/jars holds 287 jars, none
kafka-*), so `.format("kafka")` cannot be loaded here at all —
independent of any broker. Everything after the socket IS exercised:
`decode_kafka_records` runs through a real watermarked Structured
Streaming query over rows byte-shaped exactly like the kafka source's
output (tests/test_io_streaming.py::test_kafka_decode_through_streaming_query),
the sink's `value` JSON round-trips
(test_kafka_wire_contract_end_to_end), and the NETWORK half is
covered by a live TCP source: Spark's built-in `socket` format
streaming the same JSON wire lines from a real local server through
the same decode + incident kernel with exact batch parity
(test_socket_source_live_network_e2e). On a cluster with the
connector jar, `kafka_source`/`kafka_sink` below are the production
path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tsp_spark.io.conf import (
    WIRE_TO_SPARK as _SPARK_TYPES,
    KafkaInputConf,
    KafkaOutputConf,
)


def kafka_value_schema(fields_types: dict[str, str]) -> str:
    """DDL schema string for the declared positional field map
    (KafkaInputConf.scala:21, KafkaService.scala:13-26)."""
    return ", ".join(
        f"`{name}` {_SPARK_TYPES.get(t, 'double')}" for name, t in fields_types.items()
    )


def decode_json_value(value: Column, fields_types: dict[str, str]) -> Column:
    """JSON record → struct of declared fields (Deserializer.scala:14-40).
    Bad/missing numerics become NULL, which the compiler decodes to NaN
    (BasicDecoders rule)."""
    return F.from_json(value.cast("string"), kafka_value_schema(fields_types))


def decode_kafka_records(raw: DataFrame, fields_types: dict[str, str]) -> DataFrame:
    """The ENTIRE post-socket pipeline of `kafka_source`: Spark's kafka
    wire frame (binary key/value + topic/partition/offset/timestamp)
    → positional JSON decode → one column per declared field. Kept as
    a separate function so tests drive it through a REAL streaming
    query over wire-shaped rows (tests/test_io_streaming.py:
    test_kafka_decode_through_streaming_query) — the only production
    line a broker-less container can't execute is the
    `.format("kafka")` load itself."""
    decoded = raw.select(decode_json_value(F.col("value"), fields_types).alias("r"))
    return decoded.select("r.*")


def kafka_source(
    spark: SparkSession, conf: KafkaInputConf, streaming: bool = True
) -> DataFrame:
    """Subscribe and decode; returns one column per declared field."""
    reader = (spark.readStream if streaming else spark.read).format("kafka")
    # Spark forbids startingOffsets=latest for BATCH kafka reads (the
    # batch query would be empty by definition) — map the streaming
    # default to earliest there, like kafka-console-consumer's
    # --from-beginning (review-caught: the batch path never worked
    # without the caller overriding offset_reset)
    offsets = conf.offset_reset
    if not streaming and offsets == "latest":
        offsets = "earliest"
    reader = (
        reader.option("kafka.bootstrap.servers", conf.brokers)
        .option("subscribe", conf.topic)
        .option("startingOffsets", offsets)
    )
    if conf.group_id:
        reader = reader.option("kafka.group.id", conf.group_id)
    raw = reader.load()
    return decode_kafka_records(raw, conf.fields_types)


def encode_json_row(df: DataFrame) -> DataFrame:
    """All columns → one JSON `value` column (OutputConf.scala:140-201)."""
    return df.select(F.to_json(F.struct(*df.columns)).alias("value"))


def kafka_sink(
    df: DataFrame,
    conf: KafkaOutputConf,
    checkpoint_dir: str | None = None,
):
    """JSON-serialize and produce to a topic. Streaming DataFrames get a
    writeStream (checkpointed — the reference's Redis row-count
    checkpoints, CheckpointingService.scala:12-168, are native here);
    batch DataFrames write once."""
    out = encode_json_row(df)
    if df.isStreaming:
        writer = (
            out.writeStream.format("kafka")
            .option("kafka.bootstrap.servers", conf.broker)
            .option("topic", conf.topic)
        )
        if checkpoint_dir:
            writer = writer.option("checkpointLocation", checkpoint_dir)
        return writer.start()
    (
        out.write.format("kafka")
        .option("kafka.bootstrap.servers", conf.broker)
        .option("topic", conf.topic)
        .save()
    )
    return None
