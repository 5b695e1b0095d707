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

# Round-13 window, executing the written r13 schedule committed in round
# 12 (VERDICT r12 task 1), amended once by rule (2): the ADVICE-r12
# halfway-semantics fix changed q52's oracle text (every rounding in the
# IVF replay moved onto the fround6 floor device), forcing q52 into
# slot 42 and displacing one planned r9 row (q194) to the r14 lead.
# Slots 1-5 are the never-driver-verified r12 additions; slots 6-41
# retire the ENTIRE r8 debt; slots 43-49 start on the r9 block; a
# second rule-(2) amendment put q110 (new full MMR-replay oracle) in
# slot 50, displacing q192 to the r14 lead.
EXPECTED_WINDOW = [
    "q216_dsir_importance", "q217_domain_quota_sample",
    "q218_pq_recall_audit", "q219_kmeans_audit", "q220_mmr_audit",
    "q30_range_join", "q31_sliding_window", "q32_session_window",
    "q35_rank_functions", "q36_full_outer", "q37_array_agg",
    "q38_profile", "q39_local_supplier_revenue", "q63_date_functions",
    "q64_bag_set_ops", "q76_ngram_jaccard_join", "q77_pack_sequences",
    "q83_embedding_stats", "q84_sample_exact_k", "q85_twophase_topk",
    "q10_row_number", "q71_frame_sample", "q50_embedding_neardup",
    "q53_embedding_centroids", "q47_minhash_lsh", "q48_simhash",
    "q73_hash_split", "q78_balance_corpus", "q91_temperature_sample",
    "q113_cms_heavy_hitters", "q114_kmv_distinct", "q118_weighted_sample",
    "q119_kmv_setops", "q128_detector_agreement",
    "q139_split_contamination", "q144_training_order",
    "q153_simhash_hamming_join", "q156_minhash_estimate_audit",
    "q167_dedup_strategy_venn", "q55_kmeans", "q42_lang_id",
    "q52_ivf_ann",
    "q180_basket_lift", "q182_subword_diversity", "q183_fk_audit",
    "q184_bounce_rate", "q187_dedup_survivor_bias", "q190_prefix_dup",
    "q191_dim_redundancy", "q110_mmr_diversify",
]

# The rows that must LEAD the round-14 window: the r13 addition (the
# only never-driver-verified query), then the rows displaced by this
# round's two rule-(2) forces (q192 by q110, q194 by q52), then the
# remaining r9-verified rows in least-recently-verified order.
EXPECTED_R14_LEAD = [
    "q221_gopher_rules",
    "q192_segment_migration",
    "q194_truncation_loss", "q195_effective_tokens",
    "q197_session_survival", "q198_position_value_decay",
    "q200_corpus_stats", "q204_forecast_revenue",
    "q205_supplier_coverage", "q207_brand_return_rate",
    "q208_embedding_norm_qa", "q210_word_length_hist",
]


def test_driver_window_is_the_reviewed_round13_plan():
    names = list(all_queries())
    assert len(EXPECTED_WINDOW) == 50
    got = names[:50]
    assert got == EXPECTED_WINDOW, (
        "driver window drifted from the reviewed round-13 rotation plan; "
        f"first divergence at slot "
        f"{next(i for i, (a, b) in enumerate(zip(got, EXPECTED_WINDOW)) if a != b) + 1}"
    )


def test_round14_queue_is_next():
    names = list(all_queries())
    assert names[50:50 + len(EXPECTED_R14_LEAD)] == EXPECTED_R14_LEAD, (
        "the r14 lead (q194 displaced by the q52 force + the r9 "
        "remainder) must sit immediately after the window"
    )


def test_r12_window_rotated_to_tail():
    # the rows verified in round 12 are the freshest evidence and must
    # close the registry (minus q52, which this round's fround6 force
    # pulled back into the window)
    names = list(all_queries())
    r12_tail = set(names[-49:])
    for probe in ("q214_url_domain_dedup", "q215_rate_limited_sample",
                  "q28_approx_distinct", "q212_curation_shards",
                  "q206_ship_latency", "q193_heaps_law"):
        assert probe in r12_tail, f"{probe} missing from the rotated tail"
    assert "q52_ivf_ann" not in r12_tail


def test_inventory_growth_is_a_rotation_decision():
    # New queries must enter between the window and the stale rows
    # (never-driver-verified rows outrank stale ones) and keep
    # (new + stale) <= 50 per round.
    n = len(all_queries())
    assert 216 <= n <= 224, n
