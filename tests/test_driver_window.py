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

# Round-10 window, executing the written r10 schedule committed in round
# 9 (VERDICT r9 task 1): q66/q68/q69 (displaced from the r9 window by
# that round's rule-(2) forces), then the 25 remaining r4-verified rows
# (the oldest driver evidence in the registry, 5 rounds), then the 16
# oldest r5-verified rows, then this round's rule-(2) forces: the sf1
# scale probe drove an adaptive SemDeDup K (q148/q201 — outputs change,
# oracle co-moves) and a corpus-count probe gating an unrolled dim-64
# fold-dot/plane-dot fast path (q49/q51 — values bit-identical, plan
# gains the probe; q52/q208/q92/q110 ship with their r9 DAGs since the
# gate defaults to the fold).
EXPECTED_WINDOW = [
    # displaced r9 rows (3)
    "q66_repetition", "q68_chunk_documents", "q69_embedding_quantize",
    # remaining r4-verified (25) — oldest driver evidence
    "q70_multimodal_meta", "q74_vocab_topk", "q02_ilike_filter",
    "q03_join_enrich", "q04_semi_join", "q05_anti_join",
    "q06_monthly_revenue", "q07_month_spine", "q09_histogram",
    "q11_topk_per_group", "q12_pivot", "q13_setops", "q14_rollup",
    "q16_extent", "q17_case_thresholds", "q20_above_avg",
    "q75_golden_variance", "q80_quality_filter", "q82_incremental_dedup",
    "q62_dissolve_area", "q88_containment_join", "q89_bigram_lift",
    "q90_pattern_redact", "q92_random_projection", "q87_ngram_novelty",
    # oldest r5-verified (18)
    "q97_funnel", "q98_cohort_retention", "q99_zscore_anomaly",
    "q100_time_weighted_avg", "q101_gap_fill_interpolate",
    "q102_bottomk_sample", "q103_order_count_distribution",
    "q104_large_volume_orders", "q106_bloom_semi_join", "q107_line_dedup",
    "q108_tfidf_keywords", "q109_triangle_count", "q110_mmr_diversify",
    "q111_pq_adc_topk", "q115_bfs_hops", "q116_psi_drift",
    "q117_rolling_median", "q120_asof_forward",
    # rule-(2) forces (4)
    "q148_semdedup", "q201_cluster_label_purity", "q49_cosine_topk",
    "q51_srp_lsh_buckets",
]

# The rows that must LEAD the round-11 window (the written schedule's
# next step): the 4 displaced r5 rows, then the 21 remaining r5-verified
# rows.  Guarded so the r11 rotation cannot accidentally bury them.
EXPECTED_R11_LEAD = [
    "q121_token_entropy",
    "q122_grouping_sets", "q123_mad_outliers", "q124_incremental_agg_merge",
    "q125_small_quantity_revenue", "q126_revenue_share", "q129_hamming_topk",
    "q130_weighted_median", "q131_user_trend", "q132_skew_report",
    "q133_video_neardup", "q134_ewma", "q135_benford_audit",
    "q136_transition_matrix", "q137_time_to_convert", "q138_session_stats",
    "q140_class_separation", "q94_dedup_canonical", "q95_stratified_split",
    "q96_doc_bigram_lift", "q93_embedding_covariance", "q56_dedup_components",
    "q86_pagerank_centrality", "q127_score_calibration", "q105_lone_returner",
]


def test_driver_window_is_the_reviewed_round10_plan():
    names = list(all_queries())
    assert len(EXPECTED_WINDOW) == 50
    got = names[:50]
    assert got == EXPECTED_WINDOW, (
        "driver window drifted from the reviewed round-10 rotation plan; "
        f"first divergence at slot "
        f"{next(i for i, (a, b) in enumerate(zip(got, EXPECTED_WINDOW)) if a != b) + 1}"
    )


def test_round11_queue_is_next():
    names = list(all_queries())
    assert names[50:50 + len(EXPECTED_R11_LEAD)] == EXPECTED_R11_LEAD, (
        "the remaining r5-verified rows must sit immediately after the "
        "window so they lead the round-11 rotation"
    )


def test_r9_window_rotated_to_tail():
    # the rows verified in round 9 are the freshest evidence and must
    # close the registry (they rotate back in at r13 per the schedule;
    # q49/q201 were pulled forward by this round's rule-2 forces)
    names = list(all_queries())
    r9_tail = set(names[-48:])
    for probe in ("q180_basket_lift", "q209_source_scorecard",
                  "q169_vocab_coverage", "q01_pricing_summary",
                  "q79_decontaminate"):
        assert probe in r9_tail, f"{probe} missing from the rotated tail"


def test_inventory_growth_is_a_rotation_decision():
    # Round 10 keeps the inventory frozen at 212 (VERDICT r9 task 6: no
    # new operators until max driver staleness <= 2 rounds — after r11
    # on the written schedule).  Growing this number requires a rotation
    # decision that keeps (new + stale) <= 50 per round.
    assert len(all_queries()) == 212
