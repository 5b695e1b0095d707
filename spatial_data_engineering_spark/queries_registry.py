"""Merged query/oracle registry backing the driver contract.

``__spark_entry__.queries()`` / ``oracle_sql()`` delegate here.  Modules
register into their own QUERIES/ORACLES dicts; this module merges them and
asserts name uniqueness.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    # Imports are deliberately LOUD: a broken module must fail the whole
    # registry, not silently shrink the inventory — the parity gate
    # parametrizes over whatever this returns, so a swallowed ImportError
    # would turn missing queries into a false-green run.
    from .operators import (analytics, clustering, dedup, multimodal,
                            relational, similarity, sketches, subqueries,
                            textops, zonal)
    from .plans import curation

    return [relational, dedup, similarity, textops, zonal, multimodal,
            clustering, analytics, subqueries, sketches, curation]


# The driver's correctness harness verifies the FIRST 50 registry entries in
# iteration order, so ordering is a coverage decision, not cosmetics.
#
# ROTATION POLICY (round 3+): least-recently-driver-verified first.  Each
# round, (1) queries whose newest driver row is oldest lead the window,
# (2) queries whose implementation or oracle changed this round are forced
# in-window regardless of age, (3) queries verified last round take the
# tail.  Combined with tests/test_oracle_parity.py — which re-runs the
# DuckDB hash-match for the FULL inventory on every pytest run and is the
# actual completeness gate — this keeps every oracled query's driver row at
# most one round old.  The driver window is the sampling gate, not the
# completeness gate.
#
# Round-11 window (driver verifies the FIRST 50), executing the written
# r11 schedule committed in round 10 (VERDICT r10 task 1), amended twice
# mid-round by rule (2) — the full story in the _PRIORITY block comment:
# the new sf1 parity sweep caught (a) a cross-engine halfway-rounding
# divergence in the shared quality score (fixed with the floor-device;
# 11 consumers changed) and (b) the latent quantile_cont-vs-Spark
# interpolation mismatch, after which EVERY oracle's percentile was
# ported to common.sql_spark_pct (Spark's exact arithmetic, incl. the
# equal-endpoint short-circuit; prob literals cast to DOUBLE).  Changed
# queries already in-window keep their slots; the other 13
# (9 quality consumers + 4 percentile-family) are forced into slots
# 38-50, displacing the 13 youngest r6 rows to the r12 lead.  The
# q148/q201 scale-path refactor ships the identical DAG (gate defaults
# off; r10 q52/q208 precedent) and owes no force.
# WRITTEN SCHEDULE (continuing):
#   - r12: q214/q215 (new) + the 13 displaced r6 rows + the 16
#     remaining r6 rows + the 19 oldest r8-verified rows = 50; after
#     r12, max staleness is r8 evidence (r13: remaining r8 + oldest r9;
#     r14: remaining r9 + the r10-verified tail).
# tests/test_driver_window.py pins the first 50 names to this plan so the
# rotation is reviewed code, not comment policy.  The FULL inventory is
# still re-proven by tests/test_oracle_parity.py on every pytest run (the
# completeness gate); the driver window is the sampling gate.
_PRIORITY = [
    # --- ROUND-11 DRIVER WINDOW (first 50) ---
    # Executing the written r11 schedule committed in round 10 (VERDICT
    # r10 task 1), AMENDED TWICE mid-round by rule (2) after the new
    # sf1 parity sweep (scripts/sf1_parity.py):
    #  (a) the quality-score halfway-rounding fix (floor-device in
    #      _scored_quality/_SCORED_SQL) changed 11 consumers;
    #  (b) eliminating quantile_cont from EVERY oracle (sql_spark_pct
    #      replicates Spark's exact-percentile arithmetic incl. the
    #      equal-endpoint short-circuit) changed the percentile family.
    # All changed queries owe a fresh driver row; those already in the
    # window stay put, the rest are forced into slots 38-50, displacing
    # the 13 youngest r6 rows of the original plan to the r12 lead.
    # slots 1-25: the 4 rows displaced from the r10 window + the 21
    # remaining r5-verified rows — the oldest driver evidence (6 rounds)
    "q121_token_entropy", "q122_grouping_sets", "q123_mad_outliers",
    "q124_incremental_agg_merge", "q125_small_quantity_revenue",
    "q126_revenue_share", "q129_hamming_topk", "q130_weighted_median",
    "q131_user_trend", "q132_skew_report", "q133_video_neardup", "q134_ewma",
    "q135_benford_audit", "q136_transition_matrix", "q137_time_to_convert",
    "q138_session_stats", "q140_class_separation", "q94_dedup_canonical",
    "q95_stratified_split", "q96_doc_bigram_lift", "q93_embedding_covariance",
    "q56_dedup_components", "q86_pagerank_centrality",
    "q127_score_calibration", "q105_lone_returner",
    # slots 26-37: the oldest r6-verified rows (q127/q199/q149 among
    # them are also rule-(2) forced)
    "q112_scd2_intervals", "q29_asof_join", "q154_knn_label_accuracy",
    "q155_pmi_collocations", "q172_zipf_fit", "q185_bigram_cond_entropy",
    "q186_negative_sampling", "q202_cramers_v", "q211_discount_quantity_corr",
    "q199_dup_quality_link", "q141_unigram_logprob", "q149_winsorized_stats",
    # slots 38-46: rule-(2) forces — quality floor-device consumers
    "q44_quality_score", "q80_quality_filter", "q145_curriculum_stages",
    "q163_score_auc", "q176_score_normalization", "q188_aa_test",
    "q209_source_scorecard", "q212_curation_shards", "q213_curation_funnel",
    # slots 47-50: rule-(2) forces — quantile_cont -> sql_spark_pct
    # oracle ports (q137/q138/q127/q163/q149/q80/q212/q213 also ported
    # but already hold window slots above)
    "q33_percentiles", "q181_order_interarrival", "q203_quantization_error",
    "q206_ship_latency",
    # --- tail: rotates into r12+ windows, least-recently-verified
    # first ---
    # WRITTEN SCHEDULE (continuing): r12 window = q214/q215 (new,
    # never-driver-verified) + the 13 displaced r6 rows + the 16
    # remaining r6 rows + the 19 oldest r8 rows = 50; r13 = remaining
    # r8 + oldest r9; r14 = remaining r9 + the r10-verified tail.
    # NEW in r11 (inventory 212 -> 214): lead the r12 window
    "q214_url_domain_dedup", "q215_rate_limited_sample",
    # the 13 r6 rows displaced by this round's forces — owed next (r12)
    "q142_stopword_discovery", "q143_bpe_pair_counts", "q146_vocab_overlap",
    "q147_chi2_keywords", "q150_hhi_concentration", "q151_returned_revenue",
    "q152_dup_cluster_sizes", "q157_mix_rebalance", "q158_session_paths",
    "q159_bm25_topk", "q160_lang_mislabel", "q161_wilson_proportion",
    "q162_churn_rate",
    # remaining stale tail, least-recently-verified first: the 16
    # remaining r6 rows, then the r8 block (minus this round's forces),
    # the r9 block (minus forces), and the r10-verified window last
    "q165_nation_trade_volume", "q166_market_share", "q168_dedup_cost_model",
    "q170_burst_detection", "q171_dup_degree_distribution",
    "q173_order_reconciliation", "q175_error_rate_timeline",
    "q177_weekday_seasonality", "q178_new_vs_returning", "q164_rfm_segments",
    "q174_value_gini", "q189_runs_test", "q193_heaps_law", "q22_cube",
    "q23_unpivot", "q24_in_subquery", "q25_window_analytics", "q26_median",
    "q27_first_limit", "q30_range_join", "q31_sliding_window",
    "q32_session_window", "q35_rank_functions", "q36_full_outer",
    "q37_array_agg", "q38_profile", "q39_local_supplier_revenue",
    "q63_date_functions", "q64_bag_set_ops", "q28_approx_distinct",
    "q34_approx_quantiles", "q52_ivf_ann", "q76_ngram_jaccard_join",
    "q77_pack_sequences", "q83_embedding_stats", "q84_sample_exact_k",
    "q85_twophase_topk", "q10_row_number", "q71_frame_sample",
    "q50_embedding_neardup", "q53_embedding_centroids", "q47_minhash_lsh",
    "q48_simhash", "q73_hash_split", "q78_balance_corpus",
    "q91_temperature_sample", "q113_cms_heavy_hitters", "q114_kmv_distinct",
    "q118_weighted_sample", "q119_kmv_setops", "q128_detector_agreement",
    "q139_split_contamination", "q144_training_order",
    "q153_simhash_hamming_join", "q156_minhash_estimate_audit",
    "q167_dedup_strategy_venn", "q55_kmeans", "q42_lang_id",
    "q180_basket_lift", "q182_subword_diversity", "q183_fk_audit",
    "q184_bounce_rate", "q187_dedup_survivor_bias", "q190_prefix_dup",
    "q191_dim_redundancy", "q192_segment_migration", "q194_truncation_loss",
    "q195_effective_tokens", "q197_session_survival",
    "q198_position_value_decay", "q200_corpus_stats", "q204_forecast_revenue",
    "q205_supplier_coverage", "q207_brand_return_rate",
    "q208_embedding_norm_qa", "q210_word_length_hist", "q79_decontaminate",
    "q81_substring_dup", "q67_overlap_dissolve", "q60_point_in_polygon",
    "q61_zonal_histogram", "q43_fingerprint", "q54_dedup_materialize",
    "q15_count_distinct", "q19_hourly_window", "q21_props_extract",
    "q18_sessionization", "q01_pricing_summary", "q45_dedup_exact",
    "q46_dedup_tokensort", "q40_text_stats", "q41_token_count",
    "q08_var_argmax", "q72_hierarchical_rollup", "q57_normalize_text",
    "q58_edit_distance", "q65_blocklist_filter", "q169_vocab_coverage",
    "q179_hapax_ratio", "q196_crosssplit_perplexity", "q66_repetition",
    "q68_chunk_documents", "q69_embedding_quantize", "q70_multimodal_meta",
    "q74_vocab_topk", "q02_ilike_filter", "q03_join_enrich", "q04_semi_join",
    "q05_anti_join", "q06_monthly_revenue", "q07_month_spine",
    "q09_histogram", "q11_topk_per_group", "q12_pivot", "q13_setops",
    "q14_rollup", "q16_extent", "q17_case_thresholds", "q20_above_avg",
    "q75_golden_variance", "q82_incremental_dedup", "q62_dissolve_area",
    "q88_containment_join", "q89_bigram_lift", "q90_pattern_redact",
    "q92_random_projection", "q87_ngram_novelty", "q97_funnel",
    "q98_cohort_retention", "q99_zscore_anomaly", "q100_time_weighted_avg",
    "q101_gap_fill_interpolate", "q102_bottomk_sample",
    "q103_order_count_distribution", "q104_large_volume_orders",
    "q106_bloom_semi_join", "q107_line_dedup", "q108_tfidf_keywords",
    "q109_triangle_count", "q110_mmr_diversify", "q111_pq_adc_topk",
    "q115_bfs_hops", "q116_psi_drift", "q117_rolling_median",
    "q120_asof_forward", "q148_semdedup", "q201_cluster_label_purity",
    "q49_cosine_topk", "q51_srp_lsh_buckets",
]




def _ordered(merged: dict) -> dict:
    """Reorder the merged registry by ``_PRIORITY``, loudly.

    Set equality is asserted in both directions so a new query that was not
    deliberately placed (or a typo in the priority list) fails the registry
    instead of silently landing outside the verification window.
    """
    missing = [n for n in _PRIORITY if n not in merged]
    unplaced = [n for n in merged if n not in _PRIORITY]
    if missing or unplaced:
        raise ValueError(
            f"registry/priority mismatch: missing={missing} unplaced={unplaced}")
    return {name: merged[name] for name in _PRIORITY}


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict = {}
    for mod in _modules():
        for name, fn in mod.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name {name!r}")
            out[name] = fn
    return _ordered(out)


def all_oracles() -> dict[str, str]:
    out: dict = {}
    for mod in _modules():
        for name, sql in mod.ORACLES.items():
            if name in out:
                raise ValueError(f"duplicate oracle name {name!r}")
            out[name] = sql
    # Not every query has an oracle; order the ones that do consistently.
    return {name: out[name] for name in _PRIORITY if name in out}
