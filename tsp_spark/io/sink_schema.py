"""Declarative sink row schema with $-interpolation (SURVEY §2.1).

Mirrors NewRowSchema (streaming/.../io/SinkSchema.scala:28-62) and the
interpolation/type-conversion in PatternsToRowMapper.scala:54-131:
each sink column is a literal int/float/string/object value whose
string form may reference `$PatternID`, `$IncidentStart`, `$IncidentEnd`,
`$UUID`, `$Unit`, `$Subunit`, `$IncidentID`, `$ProcessingDate`,
`$PatternMetadata@key`, and `$$` for a literal dollar.

The whole projection compiles to Column expressions (concat/uuid/
format), so sink-row construction is JVM-side — no Python per-row work.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tsp_spark.io.conf import WIRE_TO_SPARK as _SPARK_TYPES

# incident-column expressions for each $-variable; timestamps render in
# the reference's "yyyy-MM-dd HH:mm:ss.SSS" UTC form (Time.scala:26)


def _utc_fmt(col: Column) -> Column:
    """Render a timestamp in UTC wall time REGARDLESS of the session
    timezone (Time.scala:26: DateTimeFormatter ... withZone(UTC)).

    Pure epoch arithmetic, no timezone functions at all: the previous
    `to_utc_timestamp(col, current_timezone())` + `date_format` pair
    resolved the session-zone offset at two different instants, so a
    timestamp inside a DST transition rendered one hour off in
    DST-observing session zones (review-caught, r7 ADVICE low #5).
    `unix_micros` is the zone-free instant; days/time-of-day fields
    derive from it by integer math, which is exact for any instant,
    pre-1970 included (floor division keeps the remainder
    non-negative). Milliseconds truncate, matching `date_format`'s
    SSS field. All JVM-side expressions — no UDF."""
    us = F.unix_micros(col)
    day_us = F.lit(86_400_000_000)
    # ALL-INTEGER division (SQL div), never floor(double /): a double
    # quotient loses low bits for |us| > 2^53 (~±year 2255/1685), which
    # could flip the day at a midnight boundary and drive the remainder
    # negative (review-caught, r8). pmod keeps the remainder
    # non-negative for pre-1970 instants; us − pmod is exactly
    # divisible, so div is exact at any range.
    us_mod = F.pmod(us, day_us)
    days = F.call_function("div", us - us_mod, day_us)
    ms = F.call_function("div", us_mod, F.lit(1000))
    d = F.date_add(F.to_date(F.lit("1970-01-01")), days.cast("int"))
    return F.format_string(
        "%04d-%02d-%02d %02d:%02d:%02d.%03d",
        F.year(d),
        F.month(d),
        F.dayofmonth(d),
        F.call_function("div", ms, F.lit(3_600_000)),
        F.call_function("div", ms, F.lit(60_000)) % 60,
        F.call_function("div", ms, F.lit(1_000)) % 60,
        ms % 1000,
    )


@dataclass
class IntESValue:
    type: str
    value: int


@dataclass
class FloatESValue:
    type: str
    value: float


@dataclass
class StringESValue:
    type: str
    value: str


@dataclass
class ObjectESValue:
    type: str
    value: dict


@dataclass
class NewRowSchema:
    """data: sink column name → ESValue (SinkSchema.scala:38-53)."""

    data: dict[str, object]


_VAR_RE = re.compile(
    r"\$(PatternMetadata@[A-Za-z0-9_]+|IncidentID|UUID|PatternID|Unit|Subunit|"
    r"IncidentStart|IncidentEnd|ProcessingDate|\$)"
)


def _var_col(name: str, metadata: dict[str, str]) -> Column:
    if name == "$":
        return F.lit("$")
    if name == "UUID":
        return F.expr("uuid()")
    if name == "PatternID":
        return F.col("pattern_id").cast("string")
    if name == "Unit":
        return F.col("unit").cast("string")
    if name == "Subunit":
        return F.col("subunit").cast("string")
    if name == "IncidentID":
        return F.col("incident_id").cast("string")
    if name == "IncidentStart":
        return _utc_fmt(F.col("from_ts"))
    if name == "IncidentEnd":
        return _utc_fmt(F.col("to_ts"))
    if name == "ProcessingDate":
        return _utc_fmt(F.current_timestamp())
    if name.startswith("PatternMetadata@"):
        return F.lit(metadata.get(name.split("@", 1)[1], ""))
    raise ValueError(f"unknown interpolation ${name}")


def interpolate(template: str, metadata: dict[str, str] | None = None) -> Column:
    """$-template → Column (PatternsToRowMapper.interpolateString)."""
    metadata = metadata or {}
    parts: list[Column] = []
    pos = 0
    for m in _VAR_RE.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        parts.append(_var_col(m.group(1), metadata))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        return F.lit("")
    return parts[0] if len(parts) == 1 else F.concat(*parts)


def _convert(col: Column, to_type: str) -> Column:
    """convertFromString/Int/Float (PatternsToRowMapper.scala:72-131)."""
    if to_type == "timestamp":
        # reference parses back the rendered string; equivalent: cast
        return F.to_timestamp(col)
    if to_type == "boolean":
        # CASE-SENSITIVE on purpose: PatternsToRowMapper.scala:110 is
        # `value != "0" && value != "false" && value != "off"`, so
        # "FALSE"/"no" convert to true in the reference too
        return ~col.cast("string").isin("0", "false", "off")
    if to_type == "object":
        return col
    return col.cast(_SPARK_TYPES.get(to_type, "string"))


def compile_sink_row(
    incidents: DataFrame,
    schema: NewRowSchema,
    metadata: dict[str, str] | None = None,
) -> DataFrame:
    """Incident DataFrame (pattern_id, unit, subunit, incident_id,
    from_ts, to_ts, …) → sink rows per the declared schema."""
    cols: list[Column] = []
    for name, v in schema.data.items():
        if isinstance(v, (IntESValue, FloatESValue)):
            col = _convert(F.lit(v.value), v.type)
        elif isinstance(v, StringESValue):
            col = _convert(interpolate(v.value, metadata), v.type)
        elif isinstance(v, ObjectESValue):
            col = F.to_json(
                F.struct(
                    *[
                        interpolate(sv.value, metadata).alias(k)
                        if isinstance(sv, StringESValue)
                        else F.lit(getattr(sv, "value", sv)).alias(k)
                        for k, sv in v.value.items()
                    ]
                )
            )
        else:
            raise TypeError(f"bad ESValue for {name}: {v!r}")
        cols.append(col.alias(name))
    return incidents.select(*cols)
