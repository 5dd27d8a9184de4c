"""Skew-aware doc partitioning (SURVEY.md §4 "large-doc detection" row).

The reference warns on >100-page PDFs (processor.py:271-273) and relies on a
per-doc kill timer; at 10^12-doc scale the equivalent problem is a handful
of giant documents landing in the same task as thousands of small ones.

Design decision (re-measured r10, history in BENCH/BASELINE.md): the
parquet/Iceberg scan already yields byte-balanced partitions
(``spark.sql.files.maxPartitionBytes``), and bytes ≈ spans for this schema —
so per-task span mass is bounded by the split size NO MATTER how giants
cluster in the input. The r1-r9 "giant tier" (filter the >threshold docs
out and hash-repartition them separately) therefore bought nothing the
byte-balanced scan does not already guarantee, and it cost a SECOND full
scan of the input (the union's two branches cannot share one FileScan):
2x the read I/O at any scale, and measured locally (r10, 50k-doc corpus,
local[32]) +22% on the end-to-end extract wall. The honest failure mode
that remains — ONE doc bigger than a scan split — is single-task work under
any routing (a parquet row cannot split); ``span_budget`` is that defense.

Defaults are therefore: NO route, NO shuffle — scan partitioning is the
balance. Remaining knobs for pathological layouts:

  - ``full_shuffle=True``: one hash repartition on doc_id (single scan,
    one exchange) — for inputs whose file layout genuinely denies scan
    parallelism (one huge gzip-style file, heavily size-sorted files).
  - ``route_giants=True``: the old two-branch tiering (giants isolated
    into their own hash partitions, smalls untouched) — strict isolation
    when the kernel cost is super-linear in doc size; costs the second
    scan that made it a net loss for this linear-cost kernel.

``doc_id`` is unique, so hash partitioning spreads evenly; key salting is
unnecessary (it only helps duplicate keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# spans-per-doc above which a doc is routed to the "giant" tier when
# route_giants=True; mirrors the reference's 100-page heuristic at
# ~ |spans| ≈ pages × items/page
DEFAULT_SKEW_THRESHOLD = 20_000


def balance_docs(
    df: DataFrame,
    num_partitions: int,
    skew_threshold: int = DEFAULT_SKEW_THRESHOLD,
    giant_partitions: int | None = None,
    full_shuffle: bool = False,
    route_giants: bool = False,
) -> DataFrame:
    """Balance per-task extraction work. Default: the byte-balanced scan IS
    the balance (single scan, no exchange — see module docstring). Opt-in:
    ``full_shuffle`` for layout-denied parallelism, ``route_giants`` for
    strict giant isolation (pays a second input scan)."""
    if full_shuffle:
        return df.repartition(num_partitions, "doc_id")
    if not route_giants:
        return df
    n_spans = F.coalesce(F.size("spans"), F.lit(0))
    small = df.where(n_spans < skew_threshold)
    giant = df.where(n_spans >= skew_threshold).repartition(
        giant_partitions or num_partitions, "doc_id"
    )
    return small.unionByName(giant)
