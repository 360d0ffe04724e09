"""Source/sink configuration dataclasses.

Field-for-field mirrors of the reference's config case classes so a
user of the reference can port a job request unchanged:

* JDBCInputConf   — streaming/.../io/JDBCInputConf.scala:24-49
* KafkaInputConf  — streaming/.../io/KafkaInputConf.scala:6-28
* JDBCOutputConf  — streaming/.../io/OutputConf.scala:37-120
* KafkaOutputConf — streaming/.../io/OutputConf.scala:140-201
* NarrowDataUnfolding / WideDataFilling —
  streaming/.../io/SourceDataTransformation.scala:9-24

Defaults follow the reference (eventsMaxGapMs 60000,
defaultEventsGapMs 2000, chunkSizeMs 900000, fetch size 1000,
max 8192 key partitions — io/InputConf.scala:20).
"""

from __future__ import annotations


# Wire-tag ("int64") ↔ Spark simple-type ("bigint") mapping — the ONE
# copy (review-caught: four hand-maintained dicts in kafka.py,
# sink_schema.py, jdbc.py and api.py had already drifted on their
# unknown-type defaults). Unknown wire tags pass through unchanged so
# Spark's own parser reports them; unknown Spark types tag as float64
# (the parser/compiler default for undeclared fields).
WIRE_TO_SPARK = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float32": "float",
    "float64": "double",
    "boolean": "boolean",
    "string": "string",
    "timestamp": "timestamp",
}
SPARK_TO_WIRE = {v: k for k, v in WIRE_TO_SPARK.items()}


def spark_type_of(wire_tag: str) -> str:
    return WIRE_TO_SPARK.get(wire_tag, wire_tag)


def wire_tag_of(spark_simple: str) -> str:
    return SPARK_TO_WIRE.get(spark_simple, "float64")


from dataclasses import dataclass, field


@dataclass
class NarrowDataUnfolding:
    key_column: str
    default_value_column: str
    fields_timeouts_ms: dict[str, int] = field(default_factory=dict)
    value_column_mapping: dict[str, list[str]] | None = None
    default_timeout_ms: int | None = None


@dataclass
class WideDataFilling:
    fields_timeouts_ms: dict[str, int] = field(default_factory=dict)
    default_timeout_ms: int | None = None


@dataclass
class JDBCInputConf:
    source_id: int
    jdbc_url: str
    query: str
    driver_name: str
    datetime_field: str
    partition_fields: list[str]
    unit_id_field: str | None = None
    user_name: str | None = None
    password: str | None = None
    events_max_gap_ms: int = 60_000
    default_events_gap_ms: int = 2_000
    chunk_size_ms: int = 900_000
    processing_batch_size: int = 10_000
    fetch_size: int = 1_000  # StreamSource.scala:245
    data_transformation: NarrowDataUnfolding | WideDataFilling | None = None
    default_tolerance_fraction: float = 0.0
    # Spark-side scale knobs (no reference equivalent — the reference is
    # single-process; these drive parallel JDBC reads on a cluster)
    partition_column: str | None = None
    num_partitions: int | None = None
    lower_bound: int | None = None
    upper_bound: int | None = None


@dataclass
class KafkaInputConf:
    brokers: str
    topic: str
    datetime_field: str
    partition_fields: list[str]
    fields_types: dict[str, str]  # name -> int8…float64|boolean|string
    group_id: str | None = None
    offset_reset: str = "latest"  # StreamSource.scala:383
    unit_id_field: str | None = None
    events_max_gap_ms: int = 60_000
    default_events_gap_ms: int = 2_000
    data_transformation: NarrowDataUnfolding | WideDataFilling | None = None


@dataclass
class JDBCOutputConf:
    table_name: str
    jdbc_url: str
    driver_name: str
    user_name: str | None = None
    password: str | None = None
    batch_size: int = 100  # PatternsSearchJob.scala:82


@dataclass
class KafkaOutputConf:
    broker: str
    topic: str
