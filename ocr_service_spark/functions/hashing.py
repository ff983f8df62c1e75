"""Deterministic cross-engine hashing helpers.

All dedup/sketch operators hash through md5 so the DuckDB oracles can
reproduce values bit-for-bit: Spark ``conv(substr(md5(x),1,8),16,10)``
equals DuckDB ``('0x'||substr(md5(x),1,8))::BIGINT`` — a 32-bit
unsigned value in a BIGINT, engine-portable and seedable by prefixing
a salt. (Spark's xxhash64/hash are not reproducible in DuckDB, so they
are reserved for engine-internal keys like part_hash.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h32(col: Column, salt: str = "") -> Column:
    """32-bit md5-derived hash as bigint; identical in DuckDB via
    ``('0x'||substr(md5('<salt>'||x),1,8))::BIGINT``."""
    salted = F.concat(F.lit(salt), col) if salt else col
    return F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("bigint")


def h32_sql(expr: str, salt: str = "") -> str:
    """The DuckDB-side twin of :func:`h32` (also valid Spark SQL is not
    required — oracles run in DuckDB only)."""
    salted = f"'{salt}' || {expr}" if salt else expr
    return f"CAST(('0x' || substr(md5({salted}), 1, 8)) AS BIGINT)"
