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

# Round-9 window, executing VERDICT r8 task 1: the 23 queries with ZERO
# driver CORRECTNESS rows ever lead (round 7's planned burn-down window
# never got a driver pass — never-verified debt outranks stale rows),
# then the 11 r3-stale rows, then the 13 oldest r4-verified rows, then
# the three rule-(2) forces: q169 (rerouted through the
# global_rank_cumsum kernel), q179 and q196 (token-instance joins
# pre-aggregated to the vocab x vocab shape; q209, also reshaped,
# already leads the window as a never-verified row).
EXPECTED_WINDOW = [
    # never-driver-verified (23) — the q180-q210 tail
    "q180_basket_lift", "q181_order_interarrival", "q182_subword_diversity",
    "q183_fk_audit", "q184_bounce_rate", "q187_dedup_survivor_bias",
    "q190_prefix_dup", "q191_dim_redundancy", "q192_segment_migration",
    "q194_truncation_loss", "q195_effective_tokens", "q197_session_survival",
    "q198_position_value_decay", "q200_corpus_stats",
    "q201_cluster_label_purity", "q203_quantization_error",
    "q204_forecast_revenue", "q205_supplier_coverage", "q206_ship_latency",
    "q207_brand_return_rate", "q208_embedding_norm_qa",
    "q209_source_scorecard", "q210_word_length_hist",
    # r3-stale (11)
    "q79_decontaminate", "q81_substring_dup", "q67_overlap_dissolve",
    "q60_point_in_polygon", "q61_zonal_histogram", "q49_cosine_topk",
    "q43_fingerprint", "q54_dedup_materialize", "q15_count_distinct",
    "q19_hourly_window", "q21_props_extract",
    # oldest r4-verified (13)
    "q44_quality_score", "q18_sessionization", "q01_pricing_summary",
    "q45_dedup_exact", "q46_dedup_tokensort", "q40_text_stats",
    "q41_token_count", "q08_var_argmax", "q33_percentiles",
    "q72_hierarchical_rollup", "q57_normalize_text", "q58_edit_distance",
    "q65_blocklist_filter",
    # rule-(2) forces: DAGs changed this round (q169 kernel reroute,
    # q179/q196 instance-join pre-agg)
    "q169_vocab_coverage", "q179_hapax_ratio",
    "q196_crosssplit_perplexity",
]

# The remaining r4-verified rows that must LEAD the round-10 window (the
# written schedule's next step).  Guarded so the r10 rotation cannot
# accidentally bury them.
EXPECTED_R10_LEAD = [
    "q66_repetition", "q68_chunk_documents", "q69_embedding_quantize",
    "q70_multimodal_meta", "q74_vocab_topk", "q02_ilike_filter",
    "q03_join_enrich", "q04_semi_join", "q05_anti_join",
    "q06_monthly_revenue", "q07_month_spine", "q09_histogram",
    "q11_topk_per_group", "q12_pivot", "q13_setops", "q14_rollup",
    "q16_extent", "q17_case_thresholds", "q20_above_avg",
    "q75_golden_variance", "q80_quality_filter", "q82_incremental_dedup",
    "q62_dissolve_area", "q88_containment_join", "q89_bigram_lift",
    "q90_pattern_redact", "q92_random_projection", "q87_ngram_novelty",
]


def test_driver_window_is_the_reviewed_round9_plan():
    names = list(all_queries())
    assert len(EXPECTED_WINDOW) == 50
    got = names[:50]
    assert got == EXPECTED_WINDOW, (
        "driver window drifted from the reviewed round-9 rotation plan; "
        f"first divergence at slot "
        f"{next(i for i, (a, b) in enumerate(zip(got, EXPECTED_WINDOW)) if a != b) + 1}"
    )


def test_round10_queue_is_next():
    names = list(all_queries())
    assert names[50:50 + len(EXPECTED_R10_LEAD)] == EXPECTED_R10_LEAD, (
        "the remaining r4-verified rows must sit immediately after the "
        "window so they lead the round-10 rotation"
    )


def test_inventory_growth_is_a_rotation_decision():
    # Round 9 keeps the inventory frozen at 212 (VERDICT r8 task 7: no
    # new operators until driver-evidence debt is zero and max staleness
    # <= 2 rounds).  Growing this number requires a rotation decision
    # that keeps (new + stale) <= 50 per round.
    assert len(all_queries()) == 212
