"""Driver-window regression guard (round-6 verdict task 4).

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
first, then oldest driver evidence, changed-this-round rows forced in).
"""

from __future__ import annotations

from spatial_data_engineering_spark.queries_registry import all_queries

# Round-6 window: q112 (oracle fixed this round) + q29 (r5 slot-51
# casualty) + the 14 judge-flagged high-risk never-verified queries +
# q199 (impl changed this round) + numeric fill from q141-q211.
EXPECTED_WINDOW = [
    "q112_scd2_intervals", "q29_asof_join",
    "q153_simhash_hamming_join", "q154_knn_label_accuracy",
    "q155_pmi_collocations", "q156_minhash_estimate_audit",
    "q163_score_auc", "q172_zipf_fit", "q185_bigram_cond_entropy",
    "q186_negative_sampling", "q188_aa_test", "q189_runs_test",
    "q193_heaps_law", "q196_crosssplit_perplexity", "q202_cramers_v",
    "q211_discount_quantity_corr", "q199_dup_quality_link",
    "q141_unigram_logprob", "q142_stopword_discovery",
    "q143_bpe_pair_counts", "q144_training_order",
    "q145_curriculum_stages", "q146_vocab_overlap", "q147_chi2_keywords",
    "q148_semdedup", "q149_winsorized_stats", "q150_hhi_concentration",
    "q151_returned_revenue", "q152_dup_cluster_sizes", "q157_mix_rebalance",
    "q158_session_paths", "q159_bm25_topk", "q160_lang_mislabel",
    "q161_wilson_proportion", "q162_churn_rate", "q164_rfm_segments",
    "q165_nation_trade_volume", "q166_market_share",
    "q167_dedup_strategy_venn", "q168_dedup_cost_model",
    "q169_vocab_coverage", "q170_burst_detection",
    "q171_dup_degree_distribution", "q173_order_reconciliation",
    "q174_value_gini", "q175_error_rate_timeline",
    "q176_score_normalization", "q177_weekday_seasonality",
    "q178_new_vs_returning", "q179_hapax_ratio",
]

# The 23 never-driver-verified rows that must LEAD the round-7 window
# (the written burn-down schedule).  Guarded so the r7 rotation cannot
# accidentally bury them again.
EXPECTED_R7_LEAD = [
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
]


def test_driver_window_is_the_reviewed_round6_plan():
    names = list(all_queries())
    assert len(EXPECTED_WINDOW) == 50
    got = names[:50]
    assert got == EXPECTED_WINDOW, (
        "driver window drifted from the reviewed round-6 rotation plan; "
        f"first divergence at slot "
        f"{next(i for i, (a, b) in enumerate(zip(got, EXPECTED_WINDOW)) if a != b) + 1}"
    )


def test_round7_burndown_queue_is_next():
    names = list(all_queries())
    assert names[50:50 + len(EXPECTED_R7_LEAD)] == EXPECTED_R7_LEAD, (
        "the 23 never-driver-verified leftovers must sit immediately after "
        "the window so they lead the round-7 rotation"
    )


def test_inventory_frozen_at_210():
    # Round-6 policy: zero new queries until the verification debt clears
    # (r5 verdict task 1).  Growing this number requires a rotation
    # decision that keeps never-verified rows <= 50.
    assert len(all_queries()) == 210
