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
    # ROUND-9 rotation (r8 verdict #1). The driver samples 50 names; 145
    # live names means a two-round union covers at most 100, so priority
    # is: (1) the 43 names new or with a changed EXECUTED PATH this
    # round (new/changed lead, per CLAUDE.md); (2) the 8 names still
    # riding r6 records — the stalest, each judge-strict-verified green
    # in r8. The round-9 new set: dedup_simhash_pairs + its _nulls
    # variant (Manku block-banded Hamming join), docs_line_dedup +
    # stream_line_dedup_incremental (repeated-segment removal and its
    # wave-cumulative counts-index cadence), docs_substring_dedup (Lee
    # et al. ExactSubstr duplicated-span reporter), docs_unigram_logppl
    # (integer-micro-grid perplexity scoring), docs_dsir_weights
    # (hashed-n-gram importance resampling), docs_balanced_sample
    # (exact water-filling quotas + two-level per-stratum rank),
    # docs_contamination_report (the eval-side leakage audit),
    # docs_zorder_layout + docs_zorder_stats (Morton 2-D clustering key
    # + the min/max pruning-stats table), docs_length_outlier
    # (per-source Tukey-fence robust length gate), sim_random_projection
    # (seeded-Rademacher JL reduction), sim_kcenter_sample (greedy
    # Gonzalez coreset), stream_topk_terms (trending board over the
    # counts index), sim_pq_assign + sim_pq_adc_topk (IVF-PQ codes +
    # shuffle-free ADC search); sim_ann_recall grew from 2 rows to the
    # 6-point recall-vs-cost sweep; stream_dedup_incremental now stages
    # production-shaped multi-file waves (files_per_wave=3, same
    # oracle), and stream_line_dedup_incremental now compacts its
    # standing index IN-LOOP (compact_every=3, same oracle — the driver
    # record is the compaction-invariance check). The final r9 wave adds
    # twelve more: sim_ivfpq_topk (composed IVF+ADC search),
    # sim_ivfpq_residual_topk (full IVFADC, per-list query LUTs),
    # sim_ivf_fitted_topk (IVF over the k-means fit, unrolled-CTE
    # oracle), docs_bloom_decontaminate (sublinear eval state),
    # docs_bigram_logppl (Jelinek-Mercer interpolated LM),
    # docs_ppl_buckets (CCNet per-language terciles, prefix-bucketed
    # rank), docs_substring_dedup_apply + _keep_one (the ExactSubstr
    # removal passes), docs_winnow_fingerprints + docs_winnow_pairs
    # (MOSS winnowing + guarded matching); sim_ann_recall grew again to
    # the 9-point three-method sweep. The closing wave adds three:
    # dedup_simhash_clusters (star-contraction components over the
    # Hamming pair graph — the simhash side of the cluster-table diff),
    # docs_token_entropy (micro-grid Shannon entropy quality signal),
    # spans_heading_outline (section-structure reconstruction from
    # heading spans), dedup_pairs_agreement (the three detectors'
    # pair-set overlap matrix), spans_section_chunks (semantic chunking
    # over the outline), docs_cdc_chunks + docs_cdc_dedup_ratio
    # (FastCDC-style content-defined chunking and its per-source
    # dedup-potential report), events_cms_heavy_hitters (deterministic
    # count-min grid — the one sketch with a FULL hash-exact oracle),
    # stream_cms_topk_terms (the bounded-state streaming CMS board: 256
    # sum-mergeable grid cells of standing state regardless of
    # vocabulary, compaction-invariant), media_dedup_exact (payload-byte
    # identity dedup across media items — the media-axis dedup_exact),
    # docs_cdc_incremental (chunk-grain batch-vs-index screening, edit-
    # robust by CDC realignment), docs_dsir_sample (the DSIR resampling
    # step: exact Bernoulli(w/w_max) via the log-space integer gate),
    # docs_winnow_clusters (the third detector's cluster table),
    # events_cms_accuracy_curve (the CMS error-vs-width sweep at
    # w ∈ {16,64,256} — the sim_ann_recall curve precedent applied to
    # the sketch tier). Then (3) 23 of the 45 r7-record names are listed,
    # of which NONE now fit the 50-name sample: the 43 new/changed names
    # lead, then 7 of the 8 r6-stale fit (lineitem_approx_quantiles, the
    # 8th, spills — it is judge-strict-verified green in r8) — so all 23
    # listed r7 names spill to r10 alongside the 22 never listed. The 22 — regional_revenue_sql,
    # the 8 map-only textstats names (text_fingerprint, text_langid,
    # text_pii_scan, text_quality, text_regex_stats, text_repetition,
    # text_tokens, text_top_terms), and the 13 trimmed for the r9
    # additions (sim_kmeans_fit, sim_lsh_buckets, sim_ivf_recenter,
    # sim_ivf_topk, sim_cosine_topk, sim_cosine_dup_pairs, sim_ann_topk,
    # regional_supply, returnflag_rollup, media_decode_image,
    # spans_derive, spans_main_content, text_gopher_rules) — are each pytest-covered and MUST lead the
    # r10 rotation; text_quality and spans_main_content additionally
    # get bench legs every round.
    # --- round-9 new / changed paths (new/changed lead, per the header
    # comment + CLAUDE.md; membership is what the 50-name sample sees,
    # but a narrower sample must record these first) ---
    "dedup_simhash_clusters",
    "dedup_pairs_agreement",
    "docs_cdc_chunks",
    "docs_cdc_dedup_ratio",
    "events_cms_heavy_hitters",
    "stream_cms_topk_terms",
    "media_dedup_exact",
    "docs_cdc_incremental",
    "docs_dsir_sample",
    "docs_winnow_clusters",
    "events_cms_accuracy_curve",
    "docs_token_entropy",
    "spans_heading_outline",
    "spans_section_chunks",
    "sim_ivfpq_topk",
    "sim_ivfpq_residual_topk",
    "sim_ivf_fitted_topk",
    "docs_substring_dedup_apply",
    "docs_substring_dedup_keep_one",
    "docs_winnow_fingerprints",
    "docs_winnow_pairs",
    "docs_bigram_logppl",
    "docs_ppl_buckets",
    "docs_bloom_decontaminate",
    "docs_balanced_sample",
    "docs_contamination_report",
    "docs_zorder_layout",
    "docs_zorder_stats",
    "docs_length_outlier",
    "sim_random_projection",
    "docs_substring_dedup",
    "docs_dsir_weights",
    "docs_unigram_logppl",
    "sim_kcenter_sample",
    "stream_topk_terms",
    "sim_pq_assign",
    "sim_pq_adc_topk",
    "dedup_simhash_pairs",
    "dedup_simhash_pairs_nulls",
    "docs_line_dedup",
    "stream_line_dedup_incremental",
    "sim_ann_recall",
    "stream_dedup_incremental",
    # --- the 8 names still riding r6 records (the stalest) ---
    "lineitem_price_histogram",
    "events_transition_matrix",
    "lineitem_quantiles",
    "docs_sample",
    "docs_sample_weighted",
    "events_approx_overlap",
    "events_approx_distinct",
    "lineitem_approx_quantiles",
    # --- 23 of the 45 remaining r7-record names ---
    "dedup_bag",
    "dedup_bag_nulls",
    "dedup_exact",
    "dedup_incremental",
    "dedup_minhash_pairs",
    "dedup_minhash_pairs_nulls",
    "dedup_minhash_sig",
    "dedup_ngram_pairs",
    "dedup_simhash",
    "docs_decontaminate_incremental",
    "docs_domain_cap",
    "event_type_pivot",
    "events_asof_purchase",
    "events_daily_ma",
    "events_funnel",
    "events_json_props",
    "events_minutely_gapfill",
    "events_retention",
    "events_salted_agg",
    "events_sessionize",
    "events_window",
    "lineitem_cube",
    "media_decode_audio",
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
