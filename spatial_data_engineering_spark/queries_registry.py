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

    return [relational, dedup, similarity, textops, zonal, multimodal,
            clustering, analytics, subqueries, sketches]


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
# Round-7 window (driver verifies the FIRST 50).  INVENTORY STILL FROZEN
# at 210 — the schedule completes the never-verified burn-down this round:
#   1. The 23 never-driver-verified leftovers (q180-q210 tail) lead, as
#      pre-pinned by r6's tests/test_driver_window.py.  After the r7
#      driver run, EVERY query in the inventory has at least one driver
#      row ever.
#   2. 7 forced by policy rule (2) — implementation changed this round:
#      the exact-rank family rerouted through the two-pass global-order
#      kernel (q127 q145 q163 q164 q174 q189 q193; q192 already leads).
#      Deliberately NOT forced despite being touched: q155/q180 (only a
#      plan-shape pin; q180 leads anyway) and the pair-cache consumers
#      (cache-key derivation change only — parity surface identical,
#      re-proven by the full oracle-parity gate every pytest run).
#   3. The 20 oldest r3-verified rows (q47_minhash_lsh .. q35).
# WRITTEN SCHEDULE (continuing r6's):
#   - r8: the remaining 27 r3-verified rows (q26 .. q53 — incl. the 6
#     displaced from this window by rule (2); they lead right after this
#     window) + the oldest r4-verified rows.
#   - r9 on: steady-state full rotation every ~5 rounds; NEW queries may
#     not exceed (50 - stale backlog) per round.
# tests/test_driver_window.py pins the first 50 names to this plan so the
# rotation is reviewed code, not comment policy.  The FULL inventory is
# still re-proven by tests/test_oracle_parity.py on every pytest run (the
# completeness gate); the driver window is the sampling gate.
_PRIORITY = [
    # --- ROUND-7 DRIVER WINDOW (first 50) ---
    # slots 1-23: the never-driver-verified leftovers — the mandatory
    # lead pinned since r6 (tests/test_driver_window.py); after this
    # round ZERO queries remain with no driver row ever.
    "q180_basket_lift", "q181_order_interarrival", "q182_subword_diversity",
    "q183_fk_audit", "q184_bounce_rate", "q187_dedup_survivor_bias",
    "q190_prefix_dup", "q191_dim_redundancy", "q192_segment_migration",
    "q194_truncation_loss", "q195_effective_tokens", "q197_session_survival",
    "q198_position_value_decay", "q200_corpus_stats",
    "q201_cluster_label_purity", "q203_quantization_error",
    "q204_forecast_revenue", "q205_supplier_coverage", "q206_ship_latency",
    "q207_brand_return_rate", "q208_embedding_norm_qa",
    "q209_source_scorecard", "q210_word_length_hist",
    # slots 24-30: implementation changed this round (policy rule 2) —
    # the exact-rank family rerouted through the two-pass global-order
    # kernel (global_row_number / global_ntile / global_lag); q192 is
    # already in the lead above.  NOT forced despite being touched:
    # q155/q180 (plan pinned, code unchanged / q180 in lead anyway) and
    # the pair-cache consumers (key-derivation-only change; full oracle
    # parity re-proves them in-session every pytest run).
    "q127_score_calibration", "q145_curriculum_stages", "q163_score_auc",
    "q164_rfm_segments", "q174_value_gini", "q189_runs_test",
    "q193_heaps_law",
    # slots 31-39: also changed this round (policy rule 2) — the SimHash
    # signature family rewrite (shared _simhash_sig: row-local token
    # dedup + one-md5 digit projection), q55's fused per-iteration
    # action, q79's merged match/size branch, q81's linear gram walk,
    # q105's expand-free two-level aggregation, and the q139
    # scan-spread reroute (q43/q182/q209 already in-window)
    "q48_simhash", "q55_kmeans", "q79_decontaminate",
    "q81_substring_dup", "q105_lone_returner", "q128_detector_agreement",
    "q139_split_contamination", "q153_simhash_hamming_join",
    "q167_dedup_strategy_venn",
    # slots 40-49: the 10 oldest r3-stale rows (least recently verified)
    "q47_minhash_lsh", "q67_overlap_dissolve", "q60_point_in_polygon",
    "q61_zonal_histogram", "q49_cosine_topk", "q43_fingerprint",
    "q54_dedup_materialize", "q15_count_distinct", "q19_hourly_window",
    "q21_props_extract",
    # slot 50: q87 forced by rule (2) — this session pinned its shared
    # shingle frame (the q47/q156 localCheckpoint policy), a plan-level
    # rewrite; it displaces q22_cube to the round-8 lead.  The session's
    # other rewrites (q47/q139/q167) were already in-window above.
    "q87_ngram_novelty",
    # --- remaining r3-stale rows (29, incl. the 9 displaced by rule 2
    #     and q22_cube displaced by the q87 force): LEAD THE ROUND-8
    #     WINDOW ---
    "q22_cube",
    "q23_unpivot", "q24_in_subquery", "q25_window_analytics",
    "q26_median", "q27_first_limit", "q30_range_join",
    "q31_sliding_window", "q32_session_window", "q35_rank_functions",
    "q36_full_outer", "q37_array_agg", "q38_profile",
    "q39_local_supplier_revenue", "q63_date_functions", "q64_bag_set_ops",
    "q28_approx_distinct", "q34_approx_quantiles", "q52_ivf_ann",
    "q76_ngram_jaccard_join", "q77_pack_sequences",
    "q83_embedding_stats",
    "q84_sample_exact_k", "q85_twophase_topk", "q10_row_number",
    "q71_frame_sample", "q50_embedding_neardup", "q51_srp_lsh_buckets",
    "q53_embedding_centroids",
    # --- last driver row round 4: fill round-8 slots, rotate via r9 ---
    "q42_lang_id", "q44_quality_score", "q18_sessionization",
    "q01_pricing_summary", "q45_dedup_exact", "q46_dedup_tokensort",
    "q40_text_stats", "q41_token_count", "q08_var_argmax",
    "q33_percentiles", "q72_hierarchical_rollup", "q57_normalize_text",
    "q58_edit_distance", "q65_blocklist_filter", "q66_repetition",
    "q68_chunk_documents", "q69_embedding_quantize", "q70_multimodal_meta",
    "q73_hash_split", "q74_vocab_topk", "q02_ilike_filter", "q03_join_enrich",
    "q04_semi_join", "q05_anti_join", "q06_monthly_revenue",
    "q07_month_spine", "q09_histogram", "q11_topk_per_group", "q12_pivot",
    "q13_setops", "q14_rollup", "q16_extent", "q17_case_thresholds",
    "q20_above_avg", "q75_golden_variance", "q78_balance_corpus",
    "q80_quality_filter", "q82_incremental_dedup", "q62_dissolve_area",
    "q88_containment_join", "q89_bigram_lift",
    "q90_pattern_redact", "q91_temperature_sample", "q92_random_projection",
    # --- last driver row round 5 ---
    "q97_funnel", "q98_cohort_retention", "q99_zscore_anomaly",
    "q100_time_weighted_avg", "q101_gap_fill_interpolate",
    "q102_bottomk_sample", "q103_order_count_distribution",
    "q104_large_volume_orders", "q106_bloom_semi_join",
    "q107_line_dedup", "q108_tfidf_keywords", "q109_triangle_count",
    "q110_mmr_diversify", "q111_pq_adc_topk", "q113_cms_heavy_hitters",
    "q114_kmv_distinct", "q115_bfs_hops", "q116_psi_drift",
    "q117_rolling_median", "q118_weighted_sample", "q119_kmv_setops",
    "q120_asof_forward", "q121_token_entropy", "q122_grouping_sets",
    "q123_mad_outliers", "q124_incremental_agg_merge",
    "q125_small_quantity_revenue", "q126_revenue_share",
    "q129_hamming_topk",
    "q130_weighted_median", "q131_user_trend", "q132_skew_report",
    "q133_video_neardup", "q134_ewma", "q135_benford_audit",
    "q136_transition_matrix", "q137_time_to_convert", "q138_session_stats",
    "q140_class_separation",
    "q94_dedup_canonical", "q95_stratified_split", "q96_doc_bigram_lift",
    "q93_embedding_covariance", "q56_dedup_components",
    "q86_pagerank_centrality",
    # --- last driver row round 6 (newest evidence; rotate last) ---
    "q112_scd2_intervals", "q29_asof_join",
    "q154_knn_label_accuracy", "q155_pmi_collocations",
    "q156_minhash_estimate_audit", "q172_zipf_fit",
    "q185_bigram_cond_entropy", "q186_negative_sampling", "q188_aa_test",
    "q196_crosssplit_perplexity", "q202_cramers_v",
    "q211_discount_quantity_corr", "q199_dup_quality_link",
    "q141_unigram_logprob", "q142_stopword_discovery", "q143_bpe_pair_counts",
    "q144_training_order", "q146_vocab_overlap", "q147_chi2_keywords",
    "q148_semdedup", "q149_winsorized_stats", "q150_hhi_concentration",
    "q151_returned_revenue", "q152_dup_cluster_sizes", "q157_mix_rebalance",
    "q158_session_paths", "q159_bm25_topk", "q160_lang_mislabel",
    "q161_wilson_proportion", "q162_churn_rate", "q165_nation_trade_volume",
    "q166_market_share", "q168_dedup_cost_model",
    "q169_vocab_coverage", "q170_burst_detection",
    "q171_dup_degree_distribution", "q173_order_reconciliation",
    "q175_error_rate_timeline", "q176_score_normalization",
    "q177_weekday_seasonality", "q178_new_vs_returning", "q179_hapax_ratio",
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
