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

# Round-16 window, executing the written r16 schedule committed in
# round 15 ("the full r11 block leads, then the oldest r12 rows"),
# amended by the standing rules: slots 1-2 the new q226/q227
# (MinHash-tier incremental admission + audio near-dup —
# never-driver-verified outranks stale), slots 3-4 the rule-(2) forces
# q224/q225 (q225's oracle gained the empty/NULL-text LEFT JOIN fix
# and both now read the disk-persisted span table), slots 5-40 the
# ENTIRE 36-row r11-verified block (retires the r11 debt; max driver
# staleness advances to r12), slots 41-50 the oldest 10 r12 rows.
EXPECTED_WINDOW = [
    "q226_incremental_near_dedup", "q227_audio_neardup",
    "q224_exact_substring_dedup", "q225_substring_dedup_materialize",
    "q121_token_entropy", "q122_grouping_sets", "q123_mad_outliers",
    "q124_incremental_agg_merge", "q125_small_quantity_revenue",
    "q126_revenue_share", "q129_hamming_topk", "q130_weighted_median",
    "q131_user_trend", "q132_skew_report", "q133_video_neardup",
    "q134_ewma", "q135_benford_audit", "q136_transition_matrix",
    "q140_class_separation", "q94_dedup_canonical",
    "q95_stratified_split", "q96_doc_bigram_lift",
    "q93_embedding_covariance", "q86_pagerank_centrality",
    "q105_lone_returner", "q112_scd2_intervals", "q29_asof_join",
    "q154_knn_label_accuracy", "q155_pmi_collocations", "q172_zipf_fit",
    "q185_bigram_cond_entropy", "q186_negative_sampling",
    "q202_cramers_v", "q211_discount_quantity_corr",
    "q199_dup_quality_link", "q141_unigram_logprob", "q44_quality_score",
    "q145_curriculum_stages", "q188_aa_test", "q209_source_scorecard",
    "q214_url_domain_dedup", "q215_rate_limited_sample",
    "q142_stopword_discovery", "q143_bpe_pair_counts",
    "q146_vocab_overlap", "q147_chi2_keywords", "q150_hhi_concentration",
    "q151_returned_revenue", "q152_dup_cluster_sizes",
    "q157_mix_rebalance",
]

# The rows that must LEAD the round-17 window: the r12-verified
# remainder in least-recently-verified order (no never-verified rows
# remain once q226 gets its r16 row).
EXPECTED_R17_LEAD = [
    "q158_session_paths", "q159_bm25_topk", "q160_lang_mislabel", "q161_wilson_proportion",
    "q162_churn_rate", "q165_nation_trade_volume", "q166_market_share",
    "q168_dedup_cost_model", "q170_burst_detection",
    "q171_dup_degree_distribution", "q173_order_reconciliation",
    "q175_error_rate_timeline", "q177_weekday_seasonality",
    "q178_new_vs_returning",
]


def test_driver_window_is_the_reviewed_round16_plan():
    names = list(all_queries())
    assert len(EXPECTED_WINDOW) == 50
    got = names[:50]
    assert got == EXPECTED_WINDOW, (
        "driver window drifted from the reviewed round-16 rotation plan; "
        f"first divergence at slot "
        f"{next(i for i, (a, b) in enumerate(zip(got, EXPECTED_WINDOW)) if a != b) + 1}"
    )


def test_round17_queue_is_next():
    names = list(all_queries())
    assert names[50:50 + len(EXPECTED_R17_LEAD)] == EXPECTED_R17_LEAD, (
        "the r17 lead (the r12-verified remainder) must sit immediately "
        "after the window"
    )


def test_r15_window_rotated_to_tail():
    # the rows verified in round 15 are the freshest evidence and must
    # close the registry — all of them except the q224/q225 rule-(2)
    # forces, which this round's window re-verifies post-change
    names = list(all_queries())
    r15_tail = set(names[-48:])
    for probe in ("q55_kmeans", "q218_pq_recall_audit", "q47_minhash_lsh",
                  "q56_dedup_components", "q212_curation_shards",
                  "q148_semdedup", "q201_cluster_label_purity",
                  "q49_cosine_topk", "q51_srp_lsh_buckets"):
        assert probe in r15_tail, f"{probe} missing from the rotated tail"
    assert "q224_exact_substring_dedup" not in r15_tail
    assert "q225_substring_dedup_materialize" not in r15_tail


def test_inventory_growth_is_a_rotation_decision():
    # New queries must enter between the window and the stale rows
    # (never-driver-verified rows outrank stale ones) and keep
    # (new + stale) <= 50 per round.
    n = len(all_queries())
    assert 216 <= n <= 230, n
