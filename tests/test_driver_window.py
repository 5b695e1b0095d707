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

# Round-8 window, executing the written r8 schedule: the 29 remaining
# r3-stale rows lead (the oldest driver evidence in the inventory), then
# the 17 queries whose Spark DAG changed this round (the conv() hex-fold
# rewrite — every runtime evaluator of dedup._hex_fold / _simhash_sig /
# q153's signature; near_dup_pairs consumers deliberately NOT forced,
# the r7 cache-hit precedent), then the round's 2 new queries (the
# oracled end-to-end curation pipeline), then the 2 oldest r4 rows.
EXPECTED_WINDOW = [
    # r3-stale backlog lead (29) — the scheduled r8 step
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
    # changed this round: conv() md5-fold rewrite evaluators (17)
    "q47_minhash_lsh", "q48_simhash", "q73_hash_split",
    "q78_balance_corpus", "q91_temperature_sample",
    "q113_cms_heavy_hitters", "q114_kmv_distinct", "q118_weighted_sample",
    "q119_kmv_setops", "q128_detector_agreement",
    "q139_split_contamination", "q144_training_order",
    "q153_simhash_hamming_join", "q156_minhash_estimate_audit",
    "q167_dedup_strategy_venn", "q188_aa_test",
    "q196_crosssplit_perplexity",
    # new this round: the composed curation pipeline, driver-gated (2)
    "q212_curation_shards", "q213_curation_funnel",
    # rule (2) late force: kmeans_fit's DAG changed this round (pinned
    # vector projection + eager assignment checkpoint)
    "q55_kmeans",
    # oldest r4-verified row (1)
    "q42_lang_id",
]

# The remaining r4-verified rows that must LEAD the round-9 window (the
# written schedule's next step).  Guarded so the r9 rotation cannot
# accidentally bury them.
EXPECTED_R9_LEAD = [
    "q44_quality_score",
    "q18_sessionization", "q01_pricing_summary", "q45_dedup_exact",
    "q46_dedup_tokensort", "q40_text_stats", "q41_token_count",
    "q08_var_argmax", "q33_percentiles", "q72_hierarchical_rollup",
    "q57_normalize_text", "q58_edit_distance", "q65_blocklist_filter",
    "q66_repetition", "q68_chunk_documents", "q69_embedding_quantize",
    "q70_multimodal_meta", "q74_vocab_topk", "q02_ilike_filter",
    "q03_join_enrich", "q04_semi_join", "q05_anti_join",
    "q06_monthly_revenue", "q07_month_spine", "q09_histogram",
    "q11_topk_per_group", "q12_pivot", "q13_setops", "q14_rollup",
    "q16_extent", "q17_case_thresholds", "q20_above_avg",
    "q75_golden_variance", "q80_quality_filter", "q82_incremental_dedup",
    "q62_dissolve_area", "q88_containment_join", "q89_bigram_lift",
    "q90_pattern_redact", "q92_random_projection",
]


def test_driver_window_is_the_reviewed_round8_plan():
    names = list(all_queries())
    assert len(EXPECTED_WINDOW) == 50
    got = names[:50]
    assert got == EXPECTED_WINDOW, (
        "driver window drifted from the reviewed round-8 rotation plan; "
        f"first divergence at slot "
        f"{next(i for i, (a, b) in enumerate(zip(got, EXPECTED_WINDOW)) if a != b) + 1}"
    )


def test_round9_queue_is_next():
    names = list(all_queries())
    assert names[50:50 + len(EXPECTED_R9_LEAD)] == EXPECTED_R9_LEAD, (
        "the remaining r4-verified rows must sit immediately after the "
        "window so they lead the round-9 rotation"
    )


def test_inventory_growth_is_a_rotation_decision():
    # The r5-r7 freeze at 210 ended when the stale backlog cleared (r7:
    # zero queries without driver evidence).  Round 8 adds exactly the
    # two curation-pipeline queries, BOTH placed inside the verification
    # window.  Growing this number further requires a rotation decision
    # that keeps (new + stale) <= 50 per round.
    assert len(all_queries()) == 212
