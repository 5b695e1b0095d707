"""Driver-window regression guard (since round 6).

The driver's correctness harness verifies the FIRST 50 entries of
``__spark_entry__.queries()`` in iteration order.  Rotation used to be
comment policy in ``queries_registry.py``; round 5 proved that policy can
silently lose (71 late additions never reached the window).  This test
pins the window for the current round to a checked-in expected list, so
any registry reorder — deliberate rotation or accidental append — shows
up as a reviewed diff in BOTH files, and any query added without a
rotation decision fails CI instead of landing outside the window.

Update EXPECTED_WINDOW together with ``_PRIORITY`` each round, following
the written schedule in queries_registry.py (never-driver-verified rows
first, then changed-this-round rows forced in, then oldest driver
evidence).
"""

from __future__ import annotations

from spatial_data_engineering_spark.queries_registry import all_queries

# Round-17 window, executing the written r17 schedule committed in
# round 15: the full 37-row r12-verified remainder (q158 leads) + the
# oldest 13 r13-verified rows.  Max driver staleness advances to r13.
# This optimization round changed no operator definition or oracle
# (value-identical restructurings only, re-proven by the sf1-parity and
# partition-independence artifacts), so nothing is rule-(2) forced and
# the window is exactly the schedule.
EXPECTED_WINDOW = [
    "q158_session_paths", "q159_bm25_topk", "q160_lang_mislabel",
    "q161_wilson_proportion", "q162_churn_rate",
    "q165_nation_trade_volume", "q166_market_share",
    "q168_dedup_cost_model", "q170_burst_detection",
    "q171_dup_degree_distribution", "q173_order_reconciliation",
    "q175_error_rate_timeline", "q177_weekday_seasonality",
    "q178_new_vs_returning", "q164_rfm_segments", "q174_value_gini",
    "q189_runs_test", "q193_heaps_law", "q22_cube", "q23_unpivot",
    "q24_in_subquery", "q25_window_analytics", "q26_median",
    "q27_first_limit", "q28_approx_distinct", "q34_approx_quantiles",
    "q137_time_to_convert", "q138_session_stats",
    "q127_score_calibration", "q149_winsorized_stats",
    "q80_quality_filter", "q163_score_auc", "q176_score_normalization",
    "q33_percentiles", "q181_order_interarrival",
    "q203_quantization_error", "q206_ship_latency",
    "q216_dsir_importance", "q217_domain_quota_sample", "q220_mmr_audit",
    "q30_range_join", "q31_sliding_window", "q32_session_window",
    "q35_rank_functions", "q36_full_outer", "q37_array_agg",
    "q38_profile", "q39_local_supplier_revenue", "q63_date_functions",
    "q64_bag_set_ops",
]

# The rows that must LEAD the round-18 window: the r13-verified
# remainder in least-recently-verified order.
EXPECTED_R18_LEAD = [
    "q76_ngram_jaccard_join", "q77_pack_sequences", "q83_embedding_stats",
    "q84_sample_exact_k", "q85_twophase_topk", "q10_row_number",
    "q71_frame_sample", "q50_embedding_neardup", "q53_embedding_centroids",
    "q73_hash_split", "q78_balance_corpus", "q91_temperature_sample",
    "q113_cms_heavy_hitters", "q114_kmv_distinct",
]


def test_driver_window_is_the_reviewed_round17_plan():
    names = list(all_queries())
    assert len(EXPECTED_WINDOW) == 50
    got = names[:50]
    assert got == EXPECTED_WINDOW, (
        "driver window drifted from the reviewed round-17 rotation plan; "
        f"first divergence at slot "
        f"{next(i for i, (a, b) in enumerate(zip(got, EXPECTED_WINDOW)) if a != b) + 1}"
    )


def test_round18_queue_is_next():
    names = list(all_queries())
    assert names[50:50 + len(EXPECTED_R18_LEAD)] == EXPECTED_R18_LEAD, (
        "the r18 lead (the r13-verified remainder) must sit immediately "
        "after the window"
    )


def test_r16_window_rotated_to_tail():
    # the rows verified in round 16 are the freshest evidence and must
    # close the registry
    names = list(all_queries())
    r16_tail = set(names[-50:])
    for probe in ("q226_incremental_near_dedup", "q227_audio_neardup",
                  "q224_exact_substring_dedup",
                  "q225_substring_dedup_materialize", "q121_token_entropy",
                  "q86_pagerank_centrality", "q209_source_scorecard",
                  "q152_dup_cluster_sizes", "q157_mix_rebalance"):
        assert probe in r16_tail, f"{probe} missing from the rotated tail"
    assert "q158_session_paths" not in r16_tail


def test_inventory_growth_is_a_rotation_decision():
    # New queries must enter between the window and the stale rows
    # (never-driver-verified rows outrank stale ones) and keep
    # (new + stale) <= 50 per round.
    n = len(all_queries())
    assert 216 <= n <= 230, n
