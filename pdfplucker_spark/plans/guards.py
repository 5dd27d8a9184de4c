"""Shuffle-skew guards for LSH candidate self-joins.

A banded-LSH pair stage joins a key table to itself on the band key; its
cost is sum(occupancy^2) over buckets. On honest corpora occupancy tracks
near-dup cluster size (BENCH/PLANS.md capacity math), but a degenerate
corpus — boilerplate-heavy crawl, constant column — collapses into a few
giant buckets and the within-bucket self-join goes quadratic. A bucket that
large is non-discriminative BY DEFINITION (everything matches everything:
it carries no similarity signal), so the scale-correct move is to drop it,
loudly, before the join.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, functions as F

log = logging.getLogger(__name__)

# Never fires on the driver corpora (max observed band-key occupancy at
# sf0.1 is ~3 orders of magnitude below); at 10^9 rows the r/T scaling knobs
# (similarity.py docstring, BENCH/PLANS.md) keep honest buckets far under it.
DEFAULT_BUCKET_CAP = 100_000


def drop_oversized_buckets(
    keys: DataFrame,
    key_cols: tuple[str, ...],
    cap: int | None,
    log_label: str,
    with_occupancy: bool = False,
):
    """Drop rows of bucket keys whose occupancy exceeds ``cap``.

    One counting aggregation on the SAME shuffle key as the downstream
    candidate join (the exchange is reused), then an inner join keeps only
    rows of surviving buckets. Dropped buckets are counted and logged —
    silence here would read as full recall when it isn't. ``keys`` should be
    persisted by the caller (the guard is its second consumer); the
    occupancy frame (one row per distinct bucket key) is persisted HERE so
    the logging count and the filtering join share one aggregation pass
    instead of recomputing it per consumer. Note the occupancy frame's
    cardinality is the DISTINCT-key count — tiny for banded LSH (2^r per
    table) but corpus-scale for raw-shingle guards (decontaminate /
    containment); MEMORY_AND_DISK default spills it, and the downstream
    join needs that frame materialized regardless, so the persist trades
    no extra state for one saved aggregation pass.

    ``with_occupancy=True`` additionally returns the SURVIVING occupancy
    frame ``(key_cols..., _occ)`` — for callers that need the counts
    themselves (e.g. the prefix filters rank shingles by document
    frequency): one shared aggregation instead of the caller recomputing
    it beside the guard. In that mode the filtered frame also CARRIES the
    ``_occ`` column (the filtering join has it in hand anyway), so callers
    ranking by occupancy need no second join against the counts.

    Contract note: ``cap=None`` disables the *drop*, but with
    ``with_occupancy=True`` the returned frame is still ``keys`` inner-joined
    to the occupancy counts — the schema gains ``_occ`` and any NULL-valued
    key rows are dropped by the join (NULL never equi-joins NULL). Current
    callers build shingle/band keys that are never NULL, so this only
    matters to a future caller that can carry NULL keys: such a caller must
    pre-filter or use ``with_occupancy=False`` (true pass-through)."""
    cols = list(key_cols)
    if cap is None:
        if not with_occupancy:
            return keys
        occ = keys.groupBy(*cols).agg(F.count("*").alias("_occ")).persist()
        return keys.join(occ, cols), occ
    if not with_occupancy:
        # Filter by broadcast ANTI-join against the OVER-cap key set instead
        # of an inner join against the (corpus-scale, for raw-shingle
        # guards) surviving set: at most sum(occ)/cap keys can exceed the
        # cap, so the dropped set is bounded and broadcastable by
        # construction, and ``keys`` never pays a join-back shuffle — the
        # guard is one counting aggregation plus a map-side filter. Row
        # semantics vs the inner-join form: identical for every non-NULL
        # key; NULL-keyed rows (null-text docs in the *_nulls variants) are
        # now KEPT, which downstream candidate equi-joins drop anyway —
        # NULL never equi-joins NULL (the documented dedup-family policy).
        dropped = (
            keys.groupBy(*cols)
            .agg(F.count("*").alias("_occ"))
            .where(F.col("_occ") > cap)
            .persist()
        )
        n_dropped = dropped.count()
        if n_dropped:
            log.warning(
                "%s: dropped %d over-capacity LSH buckets (cap=%d) — "
                "non-discriminative keys excluded from the candidate join",
                log_label,
                n_dropped,
                cap,
            )
        return keys.join(F.broadcast(dropped.select(*cols)), cols, "left_anti")
    occ = keys.groupBy(*cols).agg(F.count("*").alias("_occ")).persist()
    n_dropped = occ.where(F.col("_occ") > cap).count()
    if n_dropped:
        log.warning(
            "%s: dropped %d over-capacity LSH buckets (cap=%d) — "
            "non-discriminative keys excluded from the candidate join",
            log_label,
            n_dropped,
            cap,
        )
    surviving = occ.where(F.col("_occ") <= cap)
    return keys.join(surviving, cols), surviving
