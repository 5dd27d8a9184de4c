"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the full extraction engine over
the derived interleaved-spans corpus at sf0.001). ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 plus
the training-data-pipeline operators; oracle SQL is DuckDB 1.0 dialect over
the pre-registered testdata views.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full vectorized extraction over derived spans at sf0.001."""
    from pdfplucker_spark.operators.spans_sql import q_extract_full

    return q_extract_full(spark, "/root/testdata/sf0.001")


def _registry() -> dict[str, tuple]:
    from pdfplucker_spark.registry import all_queries

    return all_queries()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _registry().items() if sql is not None}
