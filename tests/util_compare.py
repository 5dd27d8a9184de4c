"""Local mimic of the driver's Spark-vs-DuckDB comparison gate."""

from __future__ import annotations

import math
import os

import duckdb

from pdfplucker_spark.sources.tables import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (int,)):
        return int(v)
    return v


def compare(spark_df, con, sql: str, float_tol: float = 1e-9):
    """Returns (ok, message). Columns sorted by name, rows sorted by repr."""
    sp = spark_df.toPandas()
    du = con.sql(sql).df()
    if sorted(sp.columns) != sorted(du.columns):
        return False, f"columns differ: spark={sorted(sp.columns)} duck={sorted(du.columns)}"
    cols = sorted(sp.columns)
    if len(sp) != len(du):
        return False, f"row count differs: spark={len(sp)} duck={len(du)}"
    a = sorted(
        (tuple(_norm(v) for v in row) for row in sp[cols].itertuples(index=False)),
        key=repr,
    )
    b = sorted(
        (tuple(_norm(v) for v in row) for row in du[cols].itertuples(index=False)),
        key=repr,
    )
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            return False, f"row {i} differs:\n  spark={ra!r}\n  duck ={rb!r}"
    return True, f"ok ({len(sp)} rows)"
