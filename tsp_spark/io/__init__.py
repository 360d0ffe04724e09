"""Sources, sinks, and schema handling (SURVEY §2.1).

JDBC and Kafka sources/sinks mirroring the reference's
`streaming/.../io/{JDBCInputConf,KafkaInputConf,OutputConf}.scala`,
plus the declarative NewRowSchema sink projection
(`streaming/.../io/SinkSchema.scala`, `mappers/PatternsToRowMapper.scala`).
"""

from tsp_spark.io.conf import (
    JDBCInputConf,
    JDBCOutputConf,
    KafkaInputConf,
    KafkaOutputConf,
    NarrowDataUnfolding,
    WideDataFilling,
)
from tsp_spark.io.jdbc import infer_fields_types, jdbc_sink, jdbc_source
from tsp_spark.io.kafka import kafka_sink, kafka_source, kafka_value_schema
from tsp_spark.io.shards import (
    compact_training_generations,
    read_training_generations,
    read_training_shards,
    stream_training_shards,
    write_training_shards,
)
from tsp_spark.io.sink_schema import NewRowSchema, compile_sink_row

__all__ = [
    "JDBCInputConf",
    "JDBCOutputConf",
    "KafkaInputConf",
    "KafkaOutputConf",
    "NarrowDataUnfolding",
    "WideDataFilling",
    "NewRowSchema",
    "compile_sink_row",
    "infer_fields_types",
    "compact_training_generations",
    "read_training_generations",
    "read_training_shards",
    "stream_training_shards",
    "write_training_shards",
    "jdbc_sink",
    "jdbc_source",
    "kafka_sink",
    "kafka_source",
    "kafka_value_schema",
]
