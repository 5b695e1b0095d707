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

# Round-7 window: the 23 never-driver-verified leftovers (the burn-down
# lead r6 pre-pinned) + the 17 queries changed this round (policy rule
# 2: the 7 rerouted through the global-order kernel — q192 already
# leads — the 9 SimHash-family / scan-spread rewrites, and q87's late
# shingle-frame pin) + the 10 oldest r3-stale rows.
EXPECTED_WINDOW = [
    # never-driver-verified lead (23)
    "q180_basket_lift", "q181_order_interarrival",
    "q182_subword_diversity", "q183_fk_audit", "q184_bounce_rate",
    "q187_dedup_survivor_bias", "q190_prefix_dup", "q191_dim_redundancy",
    "q192_segment_migration", "q194_truncation_loss",
    "q195_effective_tokens", "q197_session_survival",
    "q198_position_value_decay", "q200_corpus_stats",
    "q201_cluster_label_purity", "q203_quantization_error",
    "q204_forecast_revenue", "q205_supplier_coverage", "q206_ship_latency",
    "q207_brand_return_rate", "q208_embedding_norm_qa",
    "q209_source_scorecard", "q210_word_length_hist",
    # changed this round: rerouted exact-rank family (7)
    "q127_score_calibration", "q145_curriculum_stages", "q163_score_auc",
    "q164_rfm_segments", "q174_value_gini", "q189_runs_test",
    "q193_heaps_law",
    # changed this round: SimHash signature rewrite + fused k-means
    # iteration + linear gram walk + expand-free q105 + scan spreads (9)
    "q48_simhash", "q55_kmeans", "q79_decontaminate",
    "q81_substring_dup", "q105_lone_returner", "q128_detector_agreement",
    "q139_split_contamination", "q153_simhash_hamming_join",
    "q167_dedup_strategy_venn",
    # oldest r3-stale (10)
    "q47_minhash_lsh", "q67_overlap_dissolve", "q60_point_in_polygon",
    "q61_zonal_histogram", "q49_cosine_topk", "q43_fingerprint",
    "q54_dedup_materialize", "q15_count_distinct", "q19_hourly_window",
    "q21_props_extract",
    # forced by rule 2 late in the round: q87's shared shingle frame was
    # pinned (plan-level rewrite) in the continued session; displaces
    # q22_cube to the round-8 lead
    "q87_ngram_novelty",
]

# The 29 remaining r3-stale rows that must LEAD the round-8 window (the
# written schedule's next step; 9 were displaced from the r7 window by
# changed-this-round rule 2, q22_cube by the late q87 force).  Guarded
# so the r8 rotation cannot accidentally bury them.
EXPECTED_R8_LEAD = [
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
]


def test_driver_window_is_the_reviewed_round7_plan():
    names = list(all_queries())
    assert len(EXPECTED_WINDOW) == 50
    got = names[:50]
    assert got == EXPECTED_WINDOW, (
        "driver window drifted from the reviewed round-7 rotation plan; "
        f"first divergence at slot "
        f"{next(i for i, (a, b) in enumerate(zip(got, EXPECTED_WINDOW)) if a != b) + 1}"
    )


def test_round8_queue_is_next():
    names = list(all_queries())
    assert names[50:50 + len(EXPECTED_R8_LEAD)] == EXPECTED_R8_LEAD, (
        "the 22 remaining r3-stale rows must sit immediately after the "
        "window so they lead the round-8 rotation"
    )


def test_inventory_frozen_at_210():
    # Frozen until the stale backlog clears (r5 verdict task 1; r6/r7
    # schedule).  Growing this number requires a rotation decision that
    # keeps (new + stale) <= 50 per round.
    assert len(all_queries()) == 210
