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
# 10 (VERDICT r10 task 1), amended mid-round by rule (2): the new sf1
# parity sweep caught a cross-engine halfway-rounding divergence in the
# shared quality score; the floor-device fix changed 11 queries'
# implementation + oracle text, so the 9 consumers not already in-window
# (q44/q80/q145/q163/q176/q188/q209/q212/q213) are forced in, and a
# second amendment ported EVERY oracle percentile from quantile_cont to
# common.sql_spark_pct (Spark-faithful interpolation), forcing
# q33/q181/q203/q206 too — 13 forces in slots 38-50, displacing the 13
# youngest r6 rows of the original plan to the r12 lead.  The q148/q201 scale-path refactor ships the identical DAG
# (gate defaults off; r10 q52/q208 precedent) and owes no force.
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
    "q141_unigram_logprob", "q149_winsorized_stats", "q44_quality_score",
    "q80_quality_filter", "q145_curriculum_stages", "q163_score_auc",
    "q176_score_normalization", "q188_aa_test", "q209_source_scorecard",
    "q212_curation_shards", "q213_curation_funnel", "q33_percentiles",
    "q181_order_interarrival", "q203_quantization_error", "q206_ship_latency",
]

# The rows that must LEAD the round-12 window: the two NEW queries
# (never driver-verified), then the 13 r6 rows displaced by this
# round's forces.  r12 fills the rest with the 16 remaining r6 rows and
# the 19 oldest r8-verified rows that follow in the registry.
EXPECTED_R12_LEAD = [
    "q214_url_domain_dedup", "q215_rate_limited_sample",
    "q142_stopword_discovery", "q143_bpe_pair_counts", "q146_vocab_overlap",
    "q147_chi2_keywords", "q150_hhi_concentration", "q151_returned_revenue",
    "q152_dup_cluster_sizes", "q157_mix_rebalance", "q158_session_paths",
    "q159_bm25_topk", "q160_lang_mislabel", "q161_wilson_proportion",
    "q162_churn_rate",
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
    assert names[50:50 + len(EXPECTED_R12_LEAD)] == EXPECTED_R12_LEAD, (
        "the r12 lead (new queries + displaced r6 rows) must sit "
        "immediately after the window"
    )


def test_r10_window_rotated_to_tail():
    # the rows verified in round 10 are the freshest evidence and must
    # close the registry (they rotate back in at r14 per the schedule;
    # q44 was pulled forward by this round's rule-2 forces)
    names = list(all_queries())
    r10_tail = set(names[-49:])
    for probe in ("q66_repetition", "q70_multimodal_meta",
                  "q148_semdedup", "q51_srp_lsh_buckets",
                  "q02_ilike_filter"):
        assert probe in r10_tail, f"{probe} missing from the rotated tail"


def test_inventory_growth_is_a_rotation_decision():
    # The round-9 freeze (VERDICT r9 task 6) lifts after this round's
    # debt service.  New queries added in r11 (q214/q215) sit between
    # the window and the displaced/stale rows (never-driver-verified
    # rows outrank stale ones) and keep (new + stale) <= 50 per round.
    n = len(all_queries())
    assert 212 <= n <= 216, n
