#!/usr/bin/env python
"""Late-round-5 operator scale stress: corpus ops (q141-q147, q153,
q155), embedding ops (q148, q154) and the relational trio (q149-q151),
driven at 10-100x bench scale through the REGISTERED query functions on
synthetic parquet tables shaped like the testdata.

Invariants checked on outputs (not just timings): training order is a
permutation, curriculum stages are quality-monotone, SemDeDup masses
conserve, HHI lands in (0, 1], Hamming histogram respects the band
guarantee.

Usage: python scripts/stress_late_r5.py [n_docs] [n_emb] [n_lineitem]
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    n_emb = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    n_li = int(sys.argv[3]) if len(sys.argv) > 3 else 3_000_000

    from pyspark.sql import functions as F

    from spatial_data_engineering_spark.queries_registry import all_queries
    from spatial_data_engineering_spark.session import build_session

    spark = build_session(app_name="stress_late_r5")
    qs = all_queries()
    out: dict = {"n_docs": n_docs, "n_emb": n_emb, "n_lineitem": n_li,
                 "loadavg": open("/proc/loadavg").read().split()[0]}
    tmp = tempfile.mkdtemp(prefix="stress_lr5_")

    # ---- documents: 40 shared-template words + unique tail (same shape as
    # stress_r5_new_ops so dedup-family ops see real duplicate mass)
    words = ("the fast key order sort table scan merge part window small "
             "hash join query row data slow filter customer line batch "
             "value agg group stream column vector").split()
    arr = "array(" + ", ".join(f"'{w}'" for w in words) + ")"
    terms = ", ".join(
        f"element_at({arr}, pmod(hash(id DIV 5, {i}), {len(words)}) + 1)"
        for i in range(40))
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(f"concat(concat_ws(' ', {terms}), ' v', CAST(id AS STRING))"
               ).alias("text"),
        F.element_at(F.array(*[F.lit(x) for x in
                               ("en", "de", "fr", "es", "zh")]),
                     (F.pmod(F.xxhash64("id"), F.lit(5)) + 1).cast("int")
                     ).alias("lang"),
        F.concat(F.lit("src"),
                 F.pmod(F.xxhash64("id", F.lit(5)), F.lit(20)).cast("string")
                 ).alias("source"),
        F.length(F.expr(f"concat(concat_ws(' ', {terms}), ' v', CAST(id AS STRING))")).cast("bigint")
        .alias("n_chars"),
    )
    docs.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

    # ---- embeddings: 10 label clusters, center + hash noise, a few
    # exact-duplicate rows per cluster so SemDeDup has prune mass
    dims = ", ".join(
        f"CAST((CASE WHEN {d} % 10 = pmod(id, 10) THEN 3.0 ELSE 0.0 END)"
        f" + pmod(hash(id DIV 8, {d}), 200) / 100.0 AS FLOAT)"
        for d in range(64))
    emb = spark.range(n_emb).select(
        F.col("id").alias("vec_id"),
        F.expr(f"array({dims})").alias("embedding"),
        F.pmod(F.col("id"), F.lit(10)).cast("int").alias("label"),
    )
    emb.write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")

    # ---- orders/lineitem/customer/nation for q149-q151
    n_orders = n_li // 4
    n_cust = max(1000, n_orders // 10)
    spark.range(n_orders).select(
        F.col("id").alias("o_orderkey"),
        F.pmod(F.xxhash64("id", F.lit(9)), F.lit(n_cust)).alias("o_custkey"),
        (F.pmod(F.xxhash64("id"), F.lit(300_000)) / 1.0 + 1000.0
         ).alias("o_totalprice"),
        F.element_at(F.array(*[F.lit(p) for p in
                               ("1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW")]),
                     (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(4)) + 1)
                     .cast("int")).alias("o_orderpriority"),
        F.element_at(F.array(F.lit("P"), F.lit("O"), F.lit("F")),
                     (F.pmod(F.xxhash64("id", F.lit(6)), F.lit(3)) + 1)
                     .cast("int")).alias("o_orderstatus"),
        F.expr("CAST(date_add(DATE '1995-01-01', "
               "CAST(pmod(xxhash64(id, 8), 2000) AS INT)) AS TIMESTAMP)")
        .alias("o_orderdate"),
    ).write.mode("overwrite").parquet(f"{tmp}/orders.parquet")
    n_parts = max(200, n_li // 100)
    n_supp = max(50, n_li // 1000)
    spark.range(n_li).select(
        (F.col("id") / 4).cast("bigint").alias("l_orderkey"),
        F.pmod(F.xxhash64("id", F.lit(11)), F.lit(n_parts))
        .alias("l_partkey"),
        F.pmod(F.xxhash64("id", F.lit(12)), F.lit(n_supp))
        .alias("l_suppkey"),
        F.when(F.pmod(F.xxhash64("id", F.lit(2)), F.lit(4)) == 0, "R")
        .otherwise("N").alias("l_returnflag"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(5000)) / 100.0
         ).alias("l_extendedprice"),
        (F.pmod(F.xxhash64("id", F.lit(4)), F.lit(100)) / 1000.0
         ).alias("l_discount"),
        (F.pmod(F.xxhash64("id", F.lit(5)), F.lit(50)) + 1.0
         ).alias("l_quantity"),
    ).write.mode("overwrite").parquet(f"{tmp}/lineitem.parquet")
    spark.range(n_cust).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("c"), F.col("id").cast("string")).alias("c_name"),
        F.pmod(F.col("id"), F.lit(25)).alias("c_nationkey"),
        F.element_at(F.array(*[F.lit(s) for s in
                               ("AUTO", "BUILD", "HOUSE", "MACH", "FURN")]),
                     (F.pmod(F.xxhash64("id"), F.lit(5)) + 1).cast("int")
                     ).alias("c_mktsegment"),
    ).write.mode("overwrite").parquet(f"{tmp}/customer.parquet")
    spark.range(n_parts).select(
        F.col("id").alias("p_partkey"),
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("p_name"),
        F.concat(F.lit("Brand#"),
                 F.pmod(F.xxhash64("id"), F.lit(25)).cast("string"))
        .alias("p_brand"),
    ).write.mode("overwrite").parquet(f"{tmp}/part.parquet")
    spark.range(n_supp).select(
        F.col("id").alias("s_suppkey"),
        F.concat(F.lit("s"), F.col("id").cast("string")).alias("s_name"),
    ).write.mode("overwrite").parquet(f"{tmp}/supplier.parquet")
    spark.range(25).select(
        F.col("id").alias("n_nationkey"),
        F.concat(F.lit("n"), F.col("id").cast("string")).alias("n_name"),
    ).write.mode("overwrite").parquet(f"{tmp}/nation.parquet")

    # ---- events for q158/q162 (shape from stress_r5_new_ops)
    n_events = 2_000_000
    n_users = max(200, n_events // 1000)
    spark.range(n_events).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(1704067200000000)
            + F.pmod(F.xxhash64("id"), F.lit(60 * 86400)) * 1_000_000
            + F.pmod(F.xxhash64("id", F.lit(7)), F.lit(1_000_000))
        ).alias("ts"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_users)).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in
                      ("view", "click", "purchase", "signup", "error")]),
            (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(5)) + 1).cast("int")
        ).alias("event_type"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(10_000)) / 100.0
         ).alias("value"),
        F.lit('{"k": 1}').alias("props"),
    ).write.mode("overwrite").parquet(f"{tmp}/events.parquet")

    def run(name):
        print(f"stress: {name} ...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        df = qs[name](spark, tmp)
        rows = df.count()
        dt = round(time.perf_counter() - t0, 2)
        out[name] = {"rows": rows, "sec": dt}
        print(f"stress: {name} rows={rows} sec={dt}", file=sys.stderr,
              flush=True)
        return df

    # corpus ops
    df141 = run("q141_unigram_logprob")
    r = df141.collect()
    assert sum(x.n_docs for x in r) == n_docs, "q141 lost docs"
    assert all(x.avg_nll > 0 for x in r), "q141 non-positive NLL"

    df142 = run("q142_stopword_discovery")
    assert all(0.5 < x.df_ratio <= 1.0 for x in df142.collect()), "q142 ratio"

    df143 = run("q143_bpe_pair_counts")
    r = sorted(df143.collect(), key=lambda x: x.rk)
    assert len(r) == 20 and all(
        r[i].n >= r[i + 1].n for i in range(19)), "q143 top-20 not sorted"

    df144 = run("q144_training_order")
    agg = df144.agg(F.count("*").alias("n"),
                    F.countDistinct("step").alias("ns")).collect()[0]
    assert agg.n == n_docs and agg.ns == n_docs, "q144 not a permutation"

    df145 = run("q145_curriculum_stages")
    r = sorted(df145.collect(), key=lambda x: x.stage)
    assert len(r) == 4 and sum(x.n_docs for x in r) == n_docs, "q145 stages"
    assert all(r[i].avg_q >= r[i + 1].avg_q for i in range(3)), \
        "q145 stages not quality-monotone"

    df146 = run("q146_vocab_overlap")
    assert all(0.0 <= x.jaccard <= 1.0 for x in df146.collect()), "q146"

    df147 = run("q147_chi2_keywords")
    per_lang = df147.groupBy("lang").count().collect()
    assert all(x["count"] == 5 for x in per_lang), "q147 top-5 per lang"

    df153 = run("q153_simhash_hamming_join")
    assert all(0 <= x.hamming <= 3 for x in df153.collect()), "q153 hamming"

    df155 = run("q155_pmi_collocations")
    assert df155.count() == 20, "q155 top-20"

    # embedding ops
    df148 = run("q148_semdedup")
    r = df148.collect()
    assert all(x.n_kept + x.n_dropped == x.n_vectors for x in r), "q148 mass"
    assert sum(x.n_vectors for x in r) == n_emb, "q148 lost vectors"
    out["q148_drop_frac"] = round(
        sum(x.n_dropped for x in r) / n_emb, 4)

    df154 = run("q154_knn_label_accuracy")
    r = df154.collect()
    assert all(0.0 <= x.accuracy <= 1.0 for x in r), "q154 accuracy range"
    assert sum(x.n_vectors for x in r) == n_emb, "q154 lost vectors"
    out["q154_macro_acc"] = round(
        sum(x.accuracy for x in r) / len(r), 4)

    # relational trio
    df149 = run("q149_winsorized_stats")
    for x in df149.collect():
        assert x.n_clamped < x.n, "q149 clamped everything"

    df150 = run("q150_hhi_concentration")
    assert all(0.0 < x.hhi <= 1.0 for x in df150.collect()), "q150 hhi"

    df151 = run("q151_returned_revenue")
    r = df151.collect()
    assert len(r) == 20, "q151 top-20"

    # wave-4/5/6 additions
    df156 = run("q156_minhash_estimate_audit")
    assert all(0.0 <= x.mae <= 1.0 for x in df156.collect()), "q156 mae"

    df157 = run("q157_mix_rebalance")
    assert all(x.keep_rate <= 1.0 and x.expected_tokens <= x.n_tokens
               for x in df157.collect()), "q157 rates"

    df158 = run("q158_session_paths")
    assert df158.count() == 10, "q158 top-10"

    df159 = run("q159_bm25_topk")
    assert df159.count() == 10, "q159 top-10"

    run("q160_lang_mislabel")  # template corpus: conflicts expected

    df161 = run("q161_wilson_proportion")
    for x in df161.collect():
        assert x.wilson_lo <= x.p <= x.wilson_hi, "q161 interval"

    df162 = run("q162_churn_rate")
    r = df162.collect()[0]
    assert 0.0 <= r.churn_rate <= 1.0, "q162 range"

    df163 = run("q163_score_auc")
    r = df163.collect()[0]
    assert r.auc is None or 0.0 <= r.auc <= 1.0, "q163 auc range"
    out["q163_auc"] = r.auc

    df164 = run("q164_rfm_segments")
    r = df164.collect()
    assert len(r) <= 64, "q164 cell count"
    assert all(1 <= x.r <= 4 and 1 <= x.f <= 4 and 1 <= x.m <= 4
               for x in r), "q164 scores"

    # waves 11-18
    df167 = run("q167_dedup_strategy_venn")
    assert sum(x.n_docs for x in df167.collect()) == n_docs, "q167 mass"

    df168 = run("q168_dedup_cost_model")
    r = sorted(df168.collect(), key=lambda x: x.cap)
    assert all(r[i].max_candidate_pairs <= r[i + 1].max_candidate_pairs
               for i in range(len(r) - 1)), "q168 monotone in cap"

    df169 = run("q169_vocab_coverage")
    r = sorted(df169.collect(), key=lambda x: x.vocab_size)
    assert all(r[i].coverage <= r[i + 1].coverage + 1e-9
               for i in range(len(r) - 1)), "q169 monotone"

    df172 = run("q172_zipf_fit")
    assert df172.collect()[0].slope < 0, "q172 slope sign"

    df179 = run("q179_hapax_ratio")
    assert all(0.0 <= x.hapax_ratio <= 1.0 for x in df179.collect())

    df182 = run("q182_subword_diversity")
    assert all(0.0 < x.avg_diversity <= 1.0 for x in df182.collect())

    df185 = run("q185_bigram_cond_entropy")
    assert df185.collect()[0].cond_entropy >= 0, "q185 entropy sign"

    df180 = run("q180_basket_lift")
    assert df180.count() == 15, "q180 top-15"

    df183 = run("q183_fk_audit")
    assert {x.fk for x in df183.collect()} == {
        "lineitem->orders", "lineitem->part", "lineitem->supplier",
        "orders->customer", "customer->nation"}, "q183 coverage"

    df184 = run("q184_bounce_rate")
    assert all(0.0 <= x.bounce_rate <= 1.0 for x in df184.collect())

    # waves 19-23
    df186 = run("q186_negative_sampling")
    assert df186.count() == 20, "q186 top-20"

    df187 = run("q187_dedup_survivor_bias")
    assert all(0.0 <= x.removal_rate < 1.0 for x in df187.collect())

    df188 = run("q188_aa_test")
    r = df188.collect()[0]
    assert abs(r.t_stat) < 10, "q188 A/A blew up: splitter bias?"

    df189 = run("q189_runs_test")
    r = df189.collect()[0]
    assert r.n_runs >= 1 and r.n_majority + r.n_other == n_docs

    df190 = run("q190_prefix_dup")
    assert all(x.n_docs > 1 for x in df190.collect())

    df193 = run("q193_heaps_law")
    r = sorted(df193.collect(), key=lambda x: x.n_tokens)
    assert all(r[i].n_types <= r[i + 1].n_types for i in range(len(r) - 1))

    df194 = run("q194_truncation_loss")
    for x in df194.collect():
        assert 0.0 <= x.loss_frac < 1.0

    df195 = run("q195_effective_tokens")
    for x in df195.collect():
        assert x.effective_tokens <= x.raw_tokens and x.retention <= 1.0

    df196 = run("q196_crosssplit_perplexity")
    r = df196.collect()[0]
    assert 0.0 <= r.oov_rate <= 1.0 and (r.val_nll is None or r.val_nll > 0)

    df197 = run("q197_session_survival")
    r = sorted(df197.collect(), key=lambda x: x.k)
    assert all(r[i].n_reaching >= r[i + 1].n_reaching
               for i in range(len(r) - 1)), "q197 survival not monotone"

    df198 = run("q198_position_value_decay")
    assert df198.count() == 5, "q198 positions"

    df199 = run("q199_dup_quality_link")
    assert {x.status for x in df199.collect()} <= {"dup", "unique"}

    df200 = run("q200_corpus_stats")
    stats = {r.stat: r.value for r in df200.collect()}
    assert stats["n_documents"] == n_docs and stats["n_tokens"] > 0

    df201 = run("q201_cluster_label_purity")
    r = df201.collect()
    assert sum(x.n_vectors for x in r) == n_emb, "q201 lost vectors"
    assert all(0.0 < x.purity <= 1.0 for x in r)

    df202 = run("q202_cramers_v")
    assert 0.0 <= df202.collect()[0].cramers_v <= 1.0

    df203 = run("q203_quantization_error")
    r = df203.collect()[0]
    assert r.n_vectors == n_emb and r.max_rel_mae <= 0.5 + 1e-9, \
        "q203 int8 error above half-step"

    df205 = run("q205_supplier_coverage")
    assert sum(x.n_parts for x in df205.collect()) > 0

    df207 = run("q207_brand_return_rate")
    assert all(0.0 <= x.return_rate <= 1.0 for x in df207.collect())

    df208 = run("q208_embedding_norm_qa")
    assert sum(x.n_vectors for x in df208.collect()) == n_emb

    df209 = run("q209_source_scorecard")
    r = df209.collect()
    assert abs(sum(x.token_share for x in r) - 1.0) < 1e-3, "q209 shares"

    df210 = run("q210_word_length_hist")
    assert all(x.word_len >= 1 for x in df210.collect())

    df211 = run("q211_discount_quantity_corr")
    assert abs(df211.collect()[0].pearson_r) <= 1.0

    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
