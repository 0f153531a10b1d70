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
from martech_pipelines_spark.plans import corpus_r6  # noqa: F401  (registers)

# ---------------------------------------------------------------------------
# Driver-window ordering (round 6 rotation — VERDICT r5 "Next round" #2).
#
# The correctness driver hashes only the FIRST 50 entries of queries() each
# round.  Cumulative driver coverage after r1-r5: 109/229; 114 registered
# queries (103 with full oracles) have never been driver-checked.  Round-6
# window (slots 1-50): the two covariance queries whose contract was made
# integer-exact this round (they FAILED the r5 driver hash and must
# re-verify), then 48 never-driver-verified full-oracle queries — all of
# TPC-H q1-q22, mart1-7 (+SCD2/PIT twins), dd7b-dd12, s6/s7/s9/s10(+lsh),
# t13/t19, pipe1, h6.  Slots 51-100 queue the rest of the never-verified
# backlog for round 7.  Everything else keeps registration order; nothing
# is removed.
# ---------------------------------------------------------------------------
_WINDOW_PRIORITY = [
    # === round-6 window, slots 1-50 ===
    # -- r5 driver FAILs, contract hardened this round (must re-verify) --
    "s12_covariance",
    "s12b_covariance_arrow",
    # -- TPC-H (never driver-checked) --
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_volume",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q12_priority_class",
    "q13_order_distribution",
    "q14_promo_share",
    "q15_top_supplier",
    "q16_supplier_relationship",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q20_potential_promotion",
    "q21_waiting_suppliers",
    "q22_dormant_customers",
    # -- marts / SCD2 / PIT (never driver-checked) --
    "mart1_funnel",
    "mart2_retention",
    "mart3_last_touch",
    "mart4_scd2",
    "mart4b_scd2_snapshot",
    "mart5_linear_attribution",
    "mart6_pit_join",
    "mart6b_pit_window",
    "mart7_cohort_ltv",
    # -- dedup / decontamination (never driver-checked) --
    "dd7b_dup_clusters_star",
    "dd8_substring_window",
    "dd8b_substring_window_skew",
    "dd9_decontaminate",
    "dd9b_contamination_overlap",
    "dd10_incremental_dedup",
    "dd11_paragraph_dedup",
    "dd12_keep_best_per_cluster",
    # -- similarity (never driver-checked, full-oracle forms) --
    "s6_semdedup",
    "s7_sq8_topk",
    "s9_hard_negatives",
    "s10_knn_graph",
    "s10b_knn_graph_lsh",
    # -- text / pipelines / IVM picks --
    "t13_gopher_filter",
    "t19_bm25",
    "pipe1_training_prep",
    "h6_incremental_agg",
    # === round-7 queue, slots 51+ (new round-6 work first, then the
    # remaining never-driver-verified backlog) ===
    "g2b_triangles_support2",
    "s15_label_centroids",
    "h19_incremental_covariance",
    "s17_centroid_distances",
    "mart17_churn",
    "dq8_profile_drift",
    "r32_ntile_deciles",
    "a11_schema_evolution",
    "h20_incremental_percentiles",
    "r33_asof_nearest",
    "s18_covariance_drift",
    "fe2_multiwindow_features",
    "pipe10_prep_funnel",
    "r34_latest_n_per_key",
    "mart18_revenue_share",
    "s19_recall_report",
    "r35_sessionize",
    "r36_interval_overlap",
    "mart19_abc_analysis",
    "mart20_first_touch",
    "t39_tokenizer_fertility",
    "w9_conversion_latency",
    "t41_vocab_coverage",
    "t14_bpe_pairs",
    "t15_url_filter",
    "t16_mixture_weights",
    "t17_ngram_lm_score",
    "t18_dsir_importance",
    "t19b_bm25_materialized",
    "t20_weighted_sample",
    "t21_length_buckets",
    "t22_source_drift",
    "t23_domain_cap",
    "t24_curriculum_bins",
    "t27_heavy_hitters",
    "t28_stratified_sample",
    "t29_quality_classifier",
    "t6_tfidf",
    "t7_rolling_fingerprint",
    "pipe2_scale_prep",
    "pipe3_mixture_resample",
    "pipe4_leakage_safe_split",
    "pipe5_export_e2e",
    "h8_snapshot_diff",
    "h9_merge_upsert",
    "h10_incremental_cohort",
    "h11_incremental_topk",
    "mm1_media_meta",
    "mm2_media_features",
    "mm3_binary_ingest",
    "mm4_resize",
    "mm5_frame_sample",
    "mm6_phash_near_dup",
    "dq1_constraint_check",
    "dq2_rolling_zscore",
    "dq3_referential_integrity",
    "dq4_source_freshness",
    "w4_late_data_admission",
    "z1_zorder_key",
    "r7_range_join",
    "r4b_cube",
    "r8_percentiles",
    "r9_pivot",
    "r10_running_window",
    "r11_grouping_sets",
    "r12_exists_subquery",
    "r13_lead_lag",
    "r14_json_map",
    "r15_time_range_frame",
    "r16_winsorize",
    "r17_fuzzy_join",
    "r18_mad_outliers",
    "r19_histogram",
    "r20_gap_fill",
    "f12_standardize",
    "dp1_profile_customer",
    "a4_conf_read",
    "a5_csv_scan",
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
