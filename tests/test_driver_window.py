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

# Round-15 window, executing the written r15 schedule committed in round
# 14 (VERDICT r14 tasks 1/3/5/6): slots 1-2 the new q224/q225 (never-
# driver-verified ExactSubstr pair), slots 3-5 the r14 fit/codebook-memo
# family (q55/q218/q219 — hash-green post-memo but their driver rows
# predate it), slots 6-14 the r15 memo forces (q47/q48/q56/q128/q153/
# q156/q167 now read session-memoized signature frames; q212/q213 the
# memoized curation stages), slots 15-50 the ENTIRE remaining r10 block
# (retires the r10 debt; max staleness advances to r11).
EXPECTED_WINDOW = [
    "q224_exact_substring_dedup", "q225_substring_dedup_materialize",
    "q55_kmeans", "q218_pq_recall_audit",
    "q219_kmeans_audit", "q47_minhash_lsh", "q48_simhash",
    "q56_dedup_components", "q128_detector_agreement",
    "q153_simhash_hamming_join", "q156_minhash_estimate_audit",
    "q167_dedup_strategy_venn", "q212_curation_shards",
    "q213_curation_funnel", "q09_histogram", "q11_topk_per_group",
    "q12_pivot", "q13_setops", "q14_rollup", "q16_extent",
    "q17_case_thresholds", "q20_above_avg", "q75_golden_variance",
    "q82_incremental_dedup", "q62_dissolve_area", "q88_containment_join",
    "q89_bigram_lift", "q90_pattern_redact", "q92_random_projection",
    "q87_ngram_novelty", "q97_funnel", "q98_cohort_retention",
    "q99_zscore_anomaly", "q100_time_weighted_avg",
    "q101_gap_fill_interpolate", "q102_bottomk_sample",
    "q103_order_count_distribution", "q104_large_volume_orders",
    "q106_bloom_semi_join", "q107_line_dedup", "q108_tfidf_keywords",
    "q109_triangle_count", "q115_bfs_hops", "q116_psi_drift",
    "q117_rolling_median", "q120_asof_forward", "q148_semdedup",
    "q201_cluster_label_purity", "q49_cosine_topk",
    "q51_srp_lsh_buckets",
]

# The rows that must LEAD the round-16 window: the full r11-verified
# block in least-recently-verified order (q121 rotated back out of the
# r15 window when q225 arrived — never-verified outranks stale; no
# never-verified rows remain once q224/q225 get their r15 rows).
EXPECTED_R16_LEAD = [
    "q121_token_entropy", "q122_grouping_sets", "q123_mad_outliers",
    "q124_incremental_agg_merge", "q125_small_quantity_revenue",
    "q126_revenue_share", "q129_hamming_topk", "q130_weighted_median",
    "q131_user_trend", "q132_skew_report", "q133_video_neardup",
    "q134_ewma", "q135_benford_audit",
]


def test_driver_window_is_the_reviewed_round15_plan():
    names = list(all_queries())
    assert len(EXPECTED_WINDOW) == 50
    got = names[:50]
    assert got == EXPECTED_WINDOW, (
        "driver window drifted from the reviewed round-15 rotation plan; "
        f"first divergence at slot "
        f"{next(i for i, (a, b) in enumerate(zip(got, EXPECTED_WINDOW)) if a != b) + 1}"
    )


def test_round16_queue_is_next():
    names = list(all_queries())
    assert names[50:50 + len(EXPECTED_R16_LEAD)] == EXPECTED_R16_LEAD, (
        "the r16 lead (the r11-verified remainder) must sit immediately "
        "after the window"
    )


def test_r14_window_rotated_to_tail():
    # the rows verified in round 14 are the freshest evidence and must
    # close the registry (all 50 — none of the r15 forces pulls any of
    # them back: the memo family and q224 are not in the r14 window)
    names = list(all_queries())
    r14_tail = set(names[-50:])
    for probe in ("q221_gopher_rules", "q222_bigram_lm_buckets",
                  "q223_cluster_silhouette", "q111_pq_adc_topk",
                  "q79_decontaminate", "q01_pricing_summary",
                  "q45_dedup_exact", "q70_multimodal_meta"):
        assert probe in r14_tail, f"{probe} missing from the rotated tail"


def test_inventory_growth_is_a_rotation_decision():
    # New queries must enter between the window and the stale rows
    # (never-driver-verified rows outrank stale ones) and keep
    # (new + stale) <= 50 per round.
    n = len(all_queries())
    assert 216 <= n <= 228, n
