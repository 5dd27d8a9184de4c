"""Skew-aware doc partitioning (SURVEY.md §4 "large-doc detection" row).

The reference warns on >100-page PDFs (processor.py:271-273) and relies on a
per-doc kill timer; at 10^12-doc scale the equivalent problem is a handful
of giant documents landing in the same task as thousands of small ones.

``doc_id`` is unique, so plain hash partitioning already spreads *counts*
uniformly — key salting is unnecessary (it only helps duplicate keys). The
real skew is per-doc *size*. Strategy: size-tiered routing —

  - small docs  → hash-repartition(doc_id) into N partitions
  - giant docs  → hash-repartition(doc_id) into their own N partitions,
                  so no task mixes a giant with a large population of
                  smalls, and AQE can coalesce the small side freely.

Both tiers are map-side unions (no extra shuffle beyond the two
repartitions). ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds
per-batch memory for runs of giants (session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# spans-per-doc above which a doc is routed to the "giant" tier; mirrors the
# reference's 100-page heuristic at ~ |spans| ≈ pages × items/page
DEFAULT_SKEW_THRESHOLD = 20_000


def balance_docs(
    df: DataFrame,
    num_partitions: int,
    skew_threshold: int = DEFAULT_SKEW_THRESHOLD,
    giant_partitions: int | None = None,
) -> DataFrame:
    """Route docs into size tiers and hash-partition each on doc_id.

    Returns a DataFrame with the same columns, partitioned so that giant
    docs never share a task with the bulk of small docs.
    """
    sized = df.withColumn("_n_spans", F.coalesce(F.size("spans"), F.lit(0)))
    small = (
        sized.where(F.col("_n_spans") < skew_threshold)
        .repartition(num_partitions, "doc_id")
        .drop("_n_spans")
    )
    giant = (
        sized.where(F.col("_n_spans") >= skew_threshold)
        .repartition(giant_partitions or num_partitions, "doc_id")
        .drop("_n_spans")
    )
    return small.unionByName(giant)
