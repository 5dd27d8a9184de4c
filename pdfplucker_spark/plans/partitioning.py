"""Skew-aware doc partitioning (SURVEY.md §4 "large-doc detection" row).

The reference warns on >100-page PDFs (processor.py:271-273) and relies on a
per-doc kill timer; at 10^12-doc scale the equivalent problem is a handful
of giant documents landing in the same task as thousands of small ones.

Design decision (measured, see BENCH/BASELINE.md): the parquet/Iceberg scan
already yields byte-balanced partitions (``spark.sql.files.maxPartitionBytes``),
and bytes ≈ spans for this schema — so re-shuffling the WHOLE corpus to
"balance" it costs a full-dataset exchange and bought nothing (scaling
efficiency collapsed from ~0.8 to ~0.35 in local measurement). Skew is
defused by moving only the pathological tail:

  - small docs (≈99.99%): stay in their scan partitions — NO shuffle;
  - giant docs (spans ≥ threshold): filtered out and hash-repartitioned on
    doc_id into their own partitions — a shuffle of a tiny fraction.

``doc_id`` is unique, so hash partitioning the giant tier spreads it evenly;
key salting is unnecessary (it only helps duplicate keys). For inputs with
genuinely pathological file layout, ``full_shuffle=True`` restores the
full-corpus repartition.
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
    full_shuffle: bool = False,
) -> DataFrame:
    """Isolate giant docs into their own hash partitions; leave the small-doc
    bulk unshuffled (or fully repartition with ``full_shuffle=True``)."""
    n_spans = F.coalesce(F.size("spans"), F.lit(0))
    small = df.where(n_spans < skew_threshold)
    if full_shuffle:
        small = small.repartition(num_partitions, "doc_id")
    giant = df.where(n_spans >= skew_threshold).repartition(
        giant_partitions or num_partitions, "doc_id"
    )
    return small.unionByName(giant)
