"""Portable (cross-engine) hashing expressions.

Spark's xxhash64/hash and DuckDB's hash() disagree, so every operator whose
oracle needs hash agreement uses a 60-bit integer derived from md5 — md5 is
identical everywhere. Verified bit-equal between Spark and DuckDB 1.0 for
ascii/unicode/empty strings.

Spark:  conv(substr(md5(x),1,15), 16, 10)::long
DuckDB: CAST('0x' || substr(md5(x),1,15) AS BIGINT)

15 hex digits = 60 bits → always positive, no overflow in either engine.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def md5_long(col) -> Column:
    """60-bit non-negative hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def sql_md5_long(expr: str) -> str:
    """Same hash, DuckDB SQL side."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


# Spark SQL-expression form, for use inside higher-order function lambdas
# (aggregate/transform), where Column-API functions can't reach.
def sql_expr_md5_long(expr: str) -> str:
    return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"
