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

# Round-12 window, executing the written r12 schedule committed in round
# 11 (VERDICT r11 task 1), amended once mid-round by rule (2): the
# ADVICE-r11 fixes changed every sql_spark_pct consumer's oracle text
# (NULL-semantics filter) and q80/q137/q138's implementation
# (floor-device on interpolated percentile outputs), so all 13 consumers
# are forced into slots 38-50 — displacing the youngest 13 of the 19
# planned r8 rows to the r13 lead.  Slots 1-2 are the never-driver-
# verified r11 additions; slots 3-28 retire the ENTIRE r6 debt.
EXPECTED_WINDOW = [
    "q214_url_domain_dedup", "q215_rate_limited_sample",
    "q142_stopword_discovery", "q143_bpe_pair_counts", "q146_vocab_overlap",
    "q147_chi2_keywords", "q150_hhi_concentration", "q151_returned_revenue",
    "q152_dup_cluster_sizes", "q157_mix_rebalance", "q158_session_paths",
    "q159_bm25_topk", "q160_lang_mislabel", "q161_wilson_proportion",
    "q162_churn_rate", "q165_nation_trade_volume", "q166_market_share",
    "q168_dedup_cost_model", "q170_burst_detection",
    "q171_dup_degree_distribution", "q173_order_reconciliation",
    "q175_error_rate_timeline", "q177_weekday_seasonality",
    "q178_new_vs_returning", "q164_rfm_segments", "q174_value_gini",
    "q189_runs_test", "q193_heaps_law", "q22_cube", "q23_unpivot",
    "q24_in_subquery", "q25_window_analytics", "q26_median",
    "q27_first_limit", "q28_approx_distinct", "q34_approx_quantiles",
    "q52_ivf_ann", "q137_time_to_convert", "q138_session_stats",
    "q127_score_calibration", "q149_winsorized_stats", "q80_quality_filter",
    "q163_score_auc", "q176_score_normalization", "q212_curation_shards",
    "q213_curation_funnel", "q33_percentiles", "q181_order_interarrival",
    "q203_quantization_error", "q206_ship_latency",
]

# The rows that must LEAD the round-13 window: the five NEW r12 queries
# (never driver-verified), then the 13 r8-verified rows displaced by
# this round's two rule-(2) force amendments (q30/q31/q32 by the
# second, q35..q83 by the first; q28/q34/q52 were displaced and then
# re-admitted).  r13 fills the rest with the remaining r8 rows and the
# oldest r9 rows that follow.
EXPECTED_R13_LEAD = [
    "q216_dsir_importance", "q217_domain_quota_sample",
    "q218_pq_recall_audit", "q219_kmeans_audit", "q220_mmr_audit",
    "q30_range_join", "q31_sliding_window", "q32_session_window",
    "q35_rank_functions", "q36_full_outer", "q37_array_agg", "q38_profile",
    "q39_local_supplier_revenue", "q63_date_functions", "q64_bag_set_ops",
    "q76_ngram_jaccard_join", "q77_pack_sequences", "q83_embedding_stats",
]


def test_driver_window_is_the_reviewed_round12_plan():
    names = list(all_queries())
    assert len(EXPECTED_WINDOW) == 50
    got = names[:50]
    assert got == EXPECTED_WINDOW, (
        "driver window drifted from the reviewed round-12 rotation plan; "
        f"first divergence at slot "
        f"{next(i for i, (a, b) in enumerate(zip(got, EXPECTED_WINDOW)) if a != b) + 1}"
    )


def test_round13_queue_is_next():
    names = list(all_queries())
    assert names[50:50 + len(EXPECTED_R13_LEAD)] == EXPECTED_R13_LEAD, (
        "the r13 lead (the r8 rows displaced by this round's forces) "
        "must sit immediately after the window"
    )


def test_r11_window_rotated_to_tail():
    # the rows verified in round 11 are the freshest evidence and must
    # close the registry (minus the 13 sql_spark_pct consumers this
    # round's forces pulled back into the window)
    names = list(all_queries())
    r11_tail = set(names[-37:])
    for probe in ("q121_token_entropy", "q44_quality_score",
                  "q56_dedup_components", "q209_source_scorecard",
                  "q93_embedding_covariance"):
        assert probe in r11_tail, f"{probe} missing from the rotated tail"


def test_inventory_growth_is_a_rotation_decision():
    # New queries must enter between the window and the stale rows
    # (never-driver-verified rows outrank stale ones) and keep
    # (new + stale) <= 50 per round.
    n = len(all_queries())
    assert 216 <= n <= 222, n
