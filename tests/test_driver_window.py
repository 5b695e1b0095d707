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

# Round-14 window, executing the written r14 schedule committed in round
# 13 (VERDICT r13 task 1): slots 1-3 never-driver-verified (q221 + the
# two r14 additions), slots 4-5 the rows displaced by r13's forces,
# slots 6-38 the ENTIRE remaining r9 block (retires the r9 debt; max
# staleness advances to r10), slots 39-49 the oldest r10 rows, slot 50
# the q111 rule-(2) force (its new full PQ replay oracle closes the
# no-oracle set to zero and owes a hash-verified driver row).
EXPECTED_WINDOW = [
    "q221_gopher_rules", "q222_bigram_lm_buckets",
    "q223_cluster_silhouette", "q192_segment_migration",
    "q194_truncation_loss", "q195_effective_tokens",
    "q197_session_survival", "q198_position_value_decay",
    "q200_corpus_stats", "q204_forecast_revenue",
    "q205_supplier_coverage", "q207_brand_return_rate",
    "q208_embedding_norm_qa", "q210_word_length_hist",
    "q79_decontaminate", "q81_substring_dup", "q67_overlap_dissolve",
    "q60_point_in_polygon", "q61_zonal_histogram", "q43_fingerprint",
    "q54_dedup_materialize", "q15_count_distinct", "q19_hourly_window",
    "q21_props_extract", "q18_sessionization", "q01_pricing_summary",
    "q45_dedup_exact", "q46_dedup_tokensort", "q40_text_stats",
    "q41_token_count", "q08_var_argmax", "q72_hierarchical_rollup",
    "q57_normalize_text", "q58_edit_distance", "q65_blocklist_filter",
    "q169_vocab_coverage", "q179_hapax_ratio",
    "q196_crosssplit_perplexity", "q66_repetition",
    "q68_chunk_documents", "q69_embedding_quantize",
    "q70_multimodal_meta", "q74_vocab_topk", "q02_ilike_filter",
    "q03_join_enrich", "q04_semi_join", "q05_anti_join",
    "q06_monthly_revenue", "q07_month_spine", "q111_pq_adc_topk",
]

# The rows that must LEAD the round-15 window: the r10-verified
# remainder in least-recently-verified order (no never-verified rows
# remain — every query in the inventory has had a driver row or sits in
# this round's window).
EXPECTED_R15_LEAD = [
    "q09_histogram", "q11_topk_per_group", "q12_pivot", "q13_setops",
    "q14_rollup", "q16_extent", "q17_case_thresholds", "q20_above_avg",
    "q75_golden_variance", "q82_incremental_dedup", "q62_dissolve_area",
    "q88_containment_join",
]


def test_driver_window_is_the_reviewed_round14_plan():
    names = list(all_queries())
    assert len(EXPECTED_WINDOW) == 50
    got = names[:50]
    assert got == EXPECTED_WINDOW, (
        "driver window drifted from the reviewed round-14 rotation plan; "
        f"first divergence at slot "
        f"{next(i for i, (a, b) in enumerate(zip(got, EXPECTED_WINDOW)) if a != b) + 1}"
    )


def test_round15_queue_is_next():
    names = list(all_queries())
    assert names[50:50 + len(EXPECTED_R15_LEAD)] == EXPECTED_R15_LEAD, (
        "the r15 lead (the r10-verified remainder) must sit immediately "
        "after the window"
    )


def test_r13_window_rotated_to_tail():
    # the rows verified in round 13 are the freshest evidence and must
    # close the registry (all 50 — no r14 force pulls any of them back:
    # q111 was r10-stale, q222/q223 are new)
    names = list(all_queries())
    r13_tail = set(names[-50:])
    for probe in ("q216_dsir_importance", "q220_mmr_audit",
                  "q55_kmeans", "q110_mmr_diversify", "q52_ivf_ann",
                  "q42_lang_id", "q30_range_join", "q191_dim_redundancy"):
        assert probe in r13_tail, f"{probe} missing from the rotated tail"


def test_inventory_growth_is_a_rotation_decision():
    # New queries must enter between the window and the stale rows
    # (never-driver-verified rows outrank stale ones) and keep
    # (new + stale) <= 50 per round.
    n = len(all_queries())
    assert 216 <= n <= 226, n
