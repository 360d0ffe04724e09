"""Portable deterministic hashing shared by Spark queries and their
DuckDB oracles.

``xxhash64`` is the fastest JVM-side hash Spark offers, but no
equivalent exists in DuckDB, so operators built on it can only get a
rows-only correctness check. ``md5_long`` trades a little throughput
for a hash both engines compute bit-identically:

* Spark:  ``conv(substring(md5(x), 1, 15), 16, 10)`` cast to long
* DuckDB: ``('0x' || substring(md5(x), 1, 15))::BIGINT``

15 hex chars = 60 bits, so the value is non-negative and fits a long
with headroom for universal-hash arithmetic (a·h + b with a, h < 2^31).

Operators that are pure similarity plumbing (band hashes used only as
join keys) keep xxhash64 — equality is all that matters there and it
never reaches the output.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(c: Column) -> Column:
    """60-bit non-negative hash of a string column, reproducible in
    DuckDB as ``('0x' || substring(md5(x), 1, 15))::BIGINT``."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """The DuckDB expression computing exactly ``md5_long(expr)``."""
    return f"('0x' || substring(md5({expr}), 1, 15))::BIGINT"
