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
from martech_pipelines_spark.plans import corpus_r7  # noqa: F401  (registers)

# ---------------------------------------------------------------------------
# Driver-window ordering (round 7 rotation — VERDICT r6 "Next round" #1).
#
# The correctness driver hashes only the FIRST 50 entries of queries() each
# round.  Cumulative driver coverage after r1-r6: 159/252; 93 registered
# queries have never been driver-checked.  Round-7 window (slots 1-50): the
# round-6 queue promoted verbatim — the 23 round-6 additions (g2b, s15-s19,
# h19/h20, mart17-20, dq8, r32-r36, a11, fe2, pipe10, t39/t41, w9), then
# t14-t29, t6/t7, pipe2-5, h8-h11, mm1-mm3.  Every entry was triple-verified
# in round 6 (check_oracle, 7-vs-32-partition stability sweep, bare-session
# driver rehearsal).  Slots 51+ queue the round-7 additions (pipe10b + the
# ANN candidate-generation component oracles) and the remaining backlog for
# round 8.  Everything else keeps registration order; nothing is removed.
# ---------------------------------------------------------------------------
_WINDOW_PRIORITY = [
    # === round-7 window, slots 1-50 (all never driver-checked) ===
    # -- round-6 additions --
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
    # === round-8 queue, slots 51+ (round-7 additions first, then the
    # remaining never-driver-verified backlog) ===
    "pipe10b_prep_funnel_materialized",
    "s2e_ivf_cells",
    "s2f_ivf_probe_sets",
    "s8b_pq_codes",
    "s2g_ivf_deterministic_topk",
    "s2g2_ivf_deterministic_arrow",
    "s2h_ivf_delta_probe",
    "s8c_pq_adc_deterministic_topk",
    "s2i_ivfpq_deterministic_topk",
    "s8c2_pq_adc_arrow",
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
    # -- rows-only backlog (trained/approximate ops: the driver records
    # the weaker rows-only check for these; queued last so the full-
    # oracle backlog drains first) --
    "s2b_ivf_topk",
    "s2c_ivf_materialized",
    "s2d_ivfpq_materialized",
    "s8_pq_topk",
    "s9b_hard_negatives_ivf",
    "s13_pca_project",
    "r3b_approx_distinct",
    "r8b_approx_percentiles",
    "r31b_rolling_active_hll",
    "t14b_bpe_learn",
    "t26_bpe_encode",
    "h7_incremental_distinct",
    "pipe6_tokenize_pack",
]


def _reorder_registry() -> None:
    # Fail fast on a typo/renamed query: a silently-skipped name would shift
    # the driver's 50-slot verification window (ADVICE r6).
    missing = [n for n in _WINDOW_PRIORITY if n not in QUERIES]
    assert not missing, f"_WINDOW_PRIORITY names absent from QUERIES: {missing}"
    dupes = {n for n in _WINDOW_PRIORITY if _WINDOW_PRIORITY.count(n) > 1}
    assert not dupes, f"_WINDOW_PRIORITY duplicate names: {sorted(dupes)}"
    ordered = {n: QUERIES[n] for n in _WINDOW_PRIORITY}
    for name, fn in list(QUERIES.items()):
        if name not in ordered:
            ordered[name] = fn
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder_registry()

__all__ = ["QUERIES", "ORACLE"]
