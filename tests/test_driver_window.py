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

# Round-11 window, executing the written r11 schedule committed in round
# 10 (VERDICT r10 task 1): the 4 rows displaced from the r10 window by
# that round's rule-(2) forces + the 21 remaining r5-verified rows (the
# registry's oldest driver evidence, 6 rounds), then the 25 oldest
# r6-verified rows.  No rule-(2) forces this round — the ADVICE fixes
# are byte-identical on the default path (same oracle SQL text, same
# DAGs, same outputs), and the q148/q201 scale-path refactor ships the
# identical DAG (its gate defaults off; r10 q52/q208 precedent).
EXPECTED_WINDOW = [
    "q121_token_entropy", "q122_grouping_sets", "q123_mad_outliers",
    "q124_incremental_agg_merge", "q125_small_quantity_revenue",
    "q126_revenue_share", "q129_hamming_topk", "q130_weighted_median",
    "q131_user_trend", "q132_skew_report", "q133_video_neardup", "q134_ewma",
    "q135_benford_audit", "q136_transition_matrix", "q137_time_to_convert",
    "q138_session_stats", "q140_class_separation", "q94_dedup_canonical",
    "q95_stratified_split", "q96_doc_bigram_lift", "q93_embedding_covariance",
    "q56_dedup_components", "q86_pagerank_centrality",
    "q127_score_calibration", "q105_lone_returner", "q112_scd2_intervals",
    "q29_asof_join", "q154_knn_label_accuracy", "q155_pmi_collocations",
    "q172_zipf_fit", "q185_bigram_cond_entropy", "q186_negative_sampling",
    "q202_cramers_v", "q211_discount_quantity_corr", "q199_dup_quality_link",
    "q141_unigram_logprob", "q142_stopword_discovery", "q143_bpe_pair_counts",
    "q146_vocab_overlap", "q147_chi2_keywords", "q149_winsorized_stats",
    "q150_hhi_concentration", "q151_returned_revenue",
    "q152_dup_cluster_sizes", "q157_mix_rebalance", "q158_session_paths",
    "q159_bm25_topk", "q160_lang_mislabel", "q161_wilson_proportion",
    "q162_churn_rate",
]

# The rows that must LEAD the round-12 window (the written schedule's
# next step): the 16 remaining r6-verified rows.  r12 fills the rest of
# its window with the 34 oldest r8-verified rows that follow them in the
# registry.  Guarded so the r12 rotation cannot accidentally bury them.
# (Never-driver-verified queries added in r11, if any, are allowed to
# sit in front of these — new rows outrank stale ones.)
EXPECTED_R12_LEAD = [
    "q165_nation_trade_volume", "q166_market_share", "q168_dedup_cost_model",
    "q170_burst_detection", "q171_dup_degree_distribution",
    "q173_order_reconciliation", "q175_error_rate_timeline",
    "q176_score_normalization", "q177_weekday_seasonality",
    "q178_new_vs_returning", "q145_curriculum_stages", "q163_score_auc",
    "q164_rfm_segments", "q174_value_gini", "q189_runs_test",
    "q193_heaps_law",
]


def test_driver_window_is_the_reviewed_round11_plan():
    names = list(all_queries())
    assert len(EXPECTED_WINDOW) == 50
    got = names[:50]
    assert got == EXPECTED_WINDOW, (
        "driver window drifted from the reviewed round-11 rotation plan; "
        f"first divergence at slot "
        f"{next(i for i, (a, b) in enumerate(zip(got, EXPECTED_WINDOW)) if a != b) + 1}"
    )


def test_round12_queue_is_next():
    names = list(all_queries())
    # new never-driver-verified rows may precede the stale block
    known = set(EXPECTED_WINDOW) | set(EXPECTED_R12_LEAD)
    stale_positions = [n for n in names[50:] if n in set(EXPECTED_R12_LEAD)]
    assert stale_positions == EXPECTED_R12_LEAD, (
        "the remaining r6-verified rows must keep their order immediately "
        "after the window (modulo new never-verified rows) so they lead "
        "the round-12 rotation"
    )
    # and nothing may sit between the window and the r12 lead except
    # never-driver-verified newcomers
    idx_first_stale = names.index(EXPECTED_R12_LEAD[0])
    for n in names[50:idx_first_stale]:
        assert n not in known, (
            f"{n} (already driver-verified) may not displace the r12 lead"
        )


def test_r10_window_rotated_to_tail():
    # the rows verified in round 10 are the freshest evidence and must
    # close the registry (they rotate back in at r14 per the schedule)
    names = list(all_queries())
    r10_tail = set(names[-50:])
    for probe in ("q66_repetition", "q70_multimodal_meta",
                  "q148_semdedup", "q51_srp_lsh_buckets",
                  "q02_ilike_filter"):
        assert probe in r10_tail, f"{probe} missing from the rotated tail"


def test_inventory_growth_is_a_rotation_decision():
    # The round-9 freeze (VERDICT r9 task 6) lifts after this round's
    # debt service: max driver staleness reaches r6 (<= 5 rounds) once
    # the r11 window executes.  New queries added in r11 must sit
    # between the window and the r12 stale lead (never-driver-verified
    # rows outrank stale ones) and keep (new + stale) <= 50 per round.
    n = len(all_queries())
    assert 212 <= n <= 216, n
