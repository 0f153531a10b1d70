"""Named query plans: the oracle-checked corpus (SURVEY.md §2 coverage)."""

from martech_pipelines_spark.plans.corpus import ORACLE, QUERIES
from martech_pipelines_spark.plans import corpus_extended  # noqa: F401  (registers)
from martech_pipelines_spark.plans import corpus_more  # noqa: F401  (registers)
from martech_pipelines_spark.plans import corpus_tpch2  # noqa: F401  (registers)
from martech_pipelines_spark.plans import corpus_scale  # noqa: F401  (registers)
from martech_pipelines_spark.plans import corpus_r4  # noqa: F401  (registers)
from martech_pipelines_spark.plans import corpus_tpch3  # noqa: F401  (registers)
from martech_pipelines_spark.plans import corpus_r5  # noqa: F401  (registers)
from martech_pipelines_spark.plans import corpus_r5b  # noqa: F401  (registers)
from martech_pipelines_spark.plans import corpus_r5c  # noqa: F401  (registers)
from martech_pipelines_spark.plans import corpus_r5d  # noqa: F401  (registers)
from martech_pipelines_spark.plans import corpus_r5e  # noqa: F401  (registers)
from martech_pipelines_spark.plans import corpus_r5f  # noqa: F401  (registers)
from martech_pipelines_spark.plans import corpus_r5g  # noqa: F401  (registers)
from martech_pipelines_spark.plans import corpus_r5h  # noqa: F401  (registers)
from martech_pipelines_spark.plans import corpus_r5i  # noqa: F401  (registers)
from martech_pipelines_spark.plans import corpus_r5j  # noqa: F401  (registers)
from martech_pipelines_spark.plans import corpus_r5k  # noqa: F401  (registers)
from martech_pipelines_spark.plans import corpus_r5l  # noqa: F401  (registers)
from martech_pipelines_spark.plans import corpus_r5m  # noqa: F401  (registers)
from martech_pipelines_spark.plans import corpus_r5n  # noqa: F401  (registers)
from martech_pipelines_spark.plans import corpus_r5o  # noqa: F401  (registers)
from martech_pipelines_spark.plans import corpus_r5p  # noqa: F401  (registers)
from martech_pipelines_spark.plans import corpus_r5q  # noqa: F401  (registers)
from martech_pipelines_spark.plans import corpus_r5r  # noqa: F401  (registers)
from martech_pipelines_spark.plans import corpus_r5s  # noqa: F401  (registers)

# ---------------------------------------------------------------------------
# Driver-window ordering.
#
# The correctness driver hashes only the FIRST 50 entries of queries() each
# round (CORRECTNESS_r{N}.json).  Rounds 1-4 verified 65 distinct queries;
# 90 registered queries have never been driver-checked.  We lead the registry
# with 50 never-driver-verified, full-oracle queries (new round-5 work first,
# then the hardest carried work: TPC-H q2/q9/q20, dd8-dd11, s6/s7, t13-t22,
# mart1-6, h6/h8, pipe1-4) so the driver's window converts local-only
# verification into hard driver signal.  Everything else keeps its original
# registration order after the priority block; nothing is removed.
# ---------------------------------------------------------------------------
_WINDOW_PRIORITY = [
    # --- round-5q/5p additions (newest, least-verified; lead the window) ---
    "t38_tfidf_keywords",
    "h18_incremental_join",
    "dq7_k_anonymity",
    "w7_session_conversion",
    "g3_link_prediction",
    "h17_incremental_rolling_active",
    "a10_orc_roundtrip",
    "t37_sentiment",
    "r31_rolling_active",
    # --- round-5o additions ---
    "w6_windowed_funnel",
    "g2_triangles",
    "mart14_funnel",
    "mart15_retention",
    "h16_incremental_retention",
    # --- round-5k..5g additions ---
    "r30_debounce",
    "t36_langid_confusion",
    "r29_exact_percentiles",
    "dq5_erasure_audit",
    "pipe9_campaign_report",
    "mart13_rfm",
    "h15_incremental_baskets",
    "a9_jsonl_scan",
    "h14_incremental_scd2",
    "mart12_top_paths",
    "pipe8_entity_resolution",
    "h13_incremental_reach",
    "mart11_audience_overlap",
    # --- round-5f additions (registered in corpus_r5f) ---
    "pipe7_propensity_training_set",
    "r28_cumulative_reach",
    # --- round-5e additions (registered in corpus_r5e) ---
    "fe1_pit_features",
    "s14_negative_sampling",
    "r27_unpivot",
    "mart10_basket_affinity",
    # --- round-5d additions (registered in corpus_r5d) ---
    "r22_asof_join",
    "r23_campaign_range_join",
    "r24_cube",
    "r25_pivot",
    "r26_group_linreg",
    "t31_classifier_auc",
    "s12_covariance",
    "s12b_covariance_arrow",
    "g1_pagerank_copurchase",
    # --- round-5c additions (registered in corpus_r5c) ---
    "t30_countmin",
    "h12_incremental_histogram",
    "mart9_transition_matrix",
    "r21_order_streaks",
    "s11_mips_topk",
    "dd13_bloom_prefilter",
    "w5_click_purchase_join",
    # --- round-5b additions (registered in corpus_r5b) ---
    "mart8_time_decay_attribution",
    "dq3_referential_integrity",
    "t28_stratified_sample",
    "t29_quality_classifier",
    "w4_late_data_admission",
    "s10_knn_graph",
    "s10b_knn_graph_lsh",
    "h11_incremental_topk",
    "dq4_source_freshness",
    # --- round-5 additions (never checked, registered in corpus_r5) ---
    "pipe5_export_e2e",
    "t23_domain_cap",
    "t24_curriculum_bins",
    "dd12_keep_best_per_cluster",
    "r20_gap_fill",
    "h9_merge_upsert",
    "mart7_cohort_ltv",
    "dq2_rolling_zscore",
    "t27_heavy_hitters",
    "s9_hard_negatives",
    "s9b_hard_negatives_ivf",
    "pipe6_tokenize_pack",
    "h10_incremental_cohort",
    # --- TPC-H completions (round 4, never driver-checked) ---
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q20_potential_promotion",
    "q11_important_stock",
    "q16_supplier_relationship",
    # --- dedup / decontamination ---
    "dd8_substring_window",
    "dd8b_substring_window_skew",
    "dd9_decontaminate",
    "dd9b_contamination_overlap",
    "dd10_incremental_dedup",
    "dd11_paragraph_dedup",
    "dd7b_dup_clusters_star",
    # --- similarity ---
    "s6_semdedup",
    "s7_sq8_topk",
    # --- text / training-data prep ---
    "t13_gopher_filter",
    "t14_bpe_pairs",
    "t15_url_filter",
    "t16_mixture_weights",
    "t17_ngram_lm_score",
    "t18_dsir_importance",
    "t19_bm25",
    "t19b_bm25_materialized",
    "t20_weighted_sample",
    "t21_length_buckets",
    "t22_source_drift",
    # --- marts / SCD2 / attribution ---
    "mart1_funnel",
    "mart2_retention",
    "mart3_last_touch",
    "mart4_scd2",
    "mart4b_scd2_snapshot",
    "mart5_linear_attribution",
    "mart6_pit_join",
    "mart6b_pit_window",
    # --- incremental view maintenance ---
    "h6_incremental_agg",
    "h8_snapshot_diff",
    # --- composed pipelines ---
    "pipe1_training_prep",
    "pipe2_scale_prep",
    "pipe3_mixture_resample",
    "pipe4_leakage_safe_split",
    # --- layout / DQ / relational fill-ins ---
    # NOTE (round 6): the 12 round-5 names above push the tail of this
    # block past the driver's 50-slot window — as of round 5 the entries
    # from ~z1 down are the remaining never-driver-checked set (all
    # local-oracle-verified). Rotate them to the top next round.
    "z1_zorder_key",
    "dq1_constraint_check",
    "r17_fuzzy_join",
    "r18_mad_outliers",
    "r19_histogram",
    "mm6_phash_near_dup",
    "mm1_media_meta",
    "mm2_media_features",
    "t6_tfidf",
    "f12_standardize",
    "dp1_profile_customer",
]


def _reorder_registry() -> None:
    ordered = {n: QUERIES[n] for n in _WINDOW_PRIORITY if n in QUERIES}
    for name, fn in list(QUERIES.items()):
        if name not in ordered:
            ordered[name] = fn
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder_registry()

__all__ = ["QUERIES", "ORACLE"]
