#!/usr/bin/env python
"""Interleaved A/B for the r17 shingle-memo + probe-memo change set.

Old forms (inlined verbatim from the pre-change tree) vs the new
registry implementations, alternating in ONE session (the only
defensible methodology on this host — documented 3-10x co-tenant
swings).  Values are asserted identical for every pair before timing.

Pairs:
  q168  shingle histogram: private gram walk + countDistinct -> memo + count
  q79   decontaminate: private gram walk (2 branches)        -> memo
  q87   ngram novelty: private gram walk + private checkpoint-> memo
  q139  split contamination: private gram walk               -> memo
  q76   jaccard verify sides: rebuilt gram walk              -> memo
  q192  segment migration: 2 limit-count probes              -> footer-count bound
  q174  value gini: limit-count probe                        -> footer-count bound
"""

from __future__ import annotations

import gc
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("AB_ROUNDS", "7"))

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from spatial_data_engineering_spark.catalog import load  # noqa: E402
from spatial_data_engineering_spark.operators import dedup as DD  # noqa: E402
from spatial_data_engineering_spark.operators import textops as TX  # noqa: E402
from spatial_data_engineering_spark.operators.analytics import (  # noqa: E402
    q174_value_gini)
from spatial_data_engineering_spark.operators.relational import (  # noqa: E402
    dsum, global_ntile, global_row_number, q192_segment_migration)
from spatial_data_engineering_spark.session import build_session  # noqa: E402

SH = DD._SHINGLES_SPARK


def q168_old(spark, sf_dir):
    d = DD._spread_docs(load(spark, sf_dir, "documents"))
    df = (d.select("doc_id", F.explode(F.expr(
              SH.format(col="text"))).alias("sh"))
          .groupBy("sh").agg(F.countDistinct("doc_id").alias("df")))
    caps = F.explode(F.array(*[F.lit(c) for c in DD._Q168_CAPS])).alias("cap")
    m = F.least(F.col("df"), F.col("cap"))
    return (df.select("df", caps)
            .groupBy("cap")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
                 F.count(F.when(F.col("df") > F.col("cap"), 1))
                 .cast("bigint").alias("n_blocked"),
                 F.sum((m * (m - 1) / 2).cast("long")).cast("bigint")
                 .alias("max_candidate_pairs")))


def q79_old(spark, sf_dir):
    d = DD._spread_docs(load(spark, sf_dir, "documents"))
    sh = d.select("doc_id", F.expr(SH.format(col="text")).alias("tl"))
    is_bench = F.col("doc_id") % TX._DECON_MOD == 0
    bench = (sh.filter(is_bench)
             .select(F.explode("tl").alias("t")).distinct())
    doc_tok = (sh.filter(~is_bench)
               .select("doc_id",
                       F.size("tl").cast("bigint").alias("n_shingles"),
                       F.explode("tl").alias("t")))
    m = (doc_tok.join(F.broadcast(bench), "t")
         .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_matched"),
                                F.min("n_shingles").alias("n_shingles")))
    ratio = F.col("n_matched") * 1.0 / F.col("n_shingles")
    return (m.filter(ratio >= TX._DECON_THETA)
            .select("doc_id", "n_shingles", "n_matched",
                    F.round(ratio, 6).alias("overlap")))


def q87_old(spark, sf_dir):
    d = DD._spread_docs(load(spark, sf_dir, "documents"))
    sh = d.select("doc_id",
                  F.expr(SH.format(col="text")).alias("tl")).localCheckpoint()
    tok = sh.select("doc_id", F.explode("tl").alias("t"))
    nu = (tok.groupBy("t")
          .agg(F.count(F.lit(1)).alias("df"), F.min("doc_id").alias("doc_id"))
          .filter(F.col("df") == 1)
          .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_unique")))
    sz = sh.select("doc_id", F.size("tl").cast("bigint").alias("n_shingles"))
    n_unique = F.coalesce("n_unique", F.lit(0))
    return (sz.join(nu, "doc_id", "left")
            .select("doc_id", "n_shingles",
                    n_unique.cast("bigint").alias("n_unique"),
                    F.round(n_unique * 1.0 / F.col("n_shingles"), 6)
                    .alias("novelty")))


def q139_old(spark, sf_dir):
    d = DD._spread_docs(load(spark, sf_dir, "documents"))
    bucket = F.expr(TX._md5_bucket("spark", "doc_id"))
    split = (F.when(bucket < 80, "train")
             .when(bucket < 90, "val").otherwise("test"))
    grams = d.select(split.alias("split"),
                     F.explode(F.expr(SH.format(col="text"))).alias("sh"))
    per = grams.groupBy("sh").agg(
        F.max(F.when(F.col("split") == "train", 1).otherwise(0)).alias("tr"),
        F.max(F.when(F.col("split") == "val", 1).otherwise(0)).alias("va"),
        F.max(F.when(F.col("split") == "test", 1).otherwise(0)).alias("te"))
    tot = per.agg(
        F.sum("va").alias("va_n"),
        F.sum(F.col("va") * F.col("tr")).alias("va_hit"),
        F.sum("te").alias("te_n"),
        F.sum(F.col("te") * F.col("tr")).alias("te_hit"))
    return (tot.selectExpr(
        "stack(2, 'val', va_n, va_hit, 'test', te_n, te_hit)"
        " AS (split, n_shingles, n_in_train)")
        .filter(F.col("n_shingles") > 0)
        .select("split",
                F.col("n_shingles").cast("bigint").alias("n_shingles"),
                F.col("n_in_train").cast("bigint").alias("n_in_train"),
                F.round(F.col("n_in_train").cast("double")
                        / F.col("n_shingles"), 6).alias("contamination")))


def q76_old(spark, sf_dir):
    # old verify sides rebuilt the gram walk; candidates stay the shared
    # checkpoint (both eras), so the delta is exactly the sh rebuild
    d = DD._spread_docs(load(spark, sf_dir, "documents"))
    sh = d.select("doc_id", F.expr(SH.format(col="text")).alias("tl"))
    _, cand = DD.ssj_candidate_pairs(spark, sf_dir)
    ta, tb = sh.alias("ta"), sh.alias("tb")
    j = (F.size(F.array_intersect(F.col("ta.tl"), F.col("tb.tl"))) * 1.0
         / F.size(F.array_distinct(F.concat(F.col("ta.tl"),
                                            F.col("tb.tl")))))
    return (cand.join(ta, F.col("ta.doc_id") == F.col("a_id"))
            .join(tb, F.col("tb.doc_id") == F.col("b_id"))
            .select("a_id", "b_id", j.alias("__j"))
            .filter(F.col("__j") >= DD._SSJ_THETA)
            .select("a_id", "b_id", F.round("__j", 6).alias("jaccard")))


def q192_old(spark, sf_dir):
    o = load(spark, sf_dir, "orders")

    def year_q(y):
        yv = (o.filter((F.col("o_orderdate") >= f"{y}-01-01")
                       & (F.col("o_orderdate") < f"{y + 1}-01-01"))
              .groupBy("o_custkey").agg(dsum("o_totalprice", "v")))
        return (global_ntile(yv, 4, [("v", False), ("o_custkey", True)],
                             "q").select("o_custkey", "q"))

    q1 = year_q(1996).withColumnsRenamed({"o_custkey": "k1", "q": "qa"})
    q2 = year_q(1997).withColumnsRenamed({"o_custkey": "k2", "q": "qb"})
    return (q1.join(q2, q1.k1 == q2.k2, "full_outer")
            .groupBy(F.coalesce(F.col("qa"), F.lit(0)).alias("from_q"),
                     F.coalesce(F.col("qb"), F.lit(0)).alias("to_q"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers")))


def q174_old(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    uv = e.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double")
        .alias("v"))
    ranked = global_row_number(uv, [("v", True), ("user_id", True)], "i")
    d9 = lambda c: (F.sum(F.round(c, 9).cast("decimal(30,9)"))  # noqa: E731
                    .cast("double"))
    n = F.count(F.lit(1))
    return ranked.agg(
        n.cast("bigint").alias("n_users"),
        F.round(2.0 * d9(F.col("i") * F.col("v"))
                / (n * d9(F.col("v"))) - (n + 1.0) / n, 6).alias("gini"))


PAIRS = [
    ("q168", q168_old, "q168_dedup_cost_model"),
    ("q79", q79_old, "q79_decontaminate"),
    ("q87", q87_old, "q87_ngram_novelty"),
    ("q139", q139_old, "q139_split_contamination"),
    ("q76", q76_old, "q76_ngram_jaccard_join"),
    ("q192", q192_old, "q192_segment_migration"),
    ("q174", q174_old, "q174_value_gini"),
]


def main():
    from spatial_data_engineering_spark.queries_registry import all_queries
    spark = build_session(app_name="ab_r17_shingle")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    resolved = [(tag, old, qs[new]) for tag, old, new in PAIRS]

    for tag, old, new in resolved:
        if tag == "q174":
            # gini emits one double row; compare directly
            ov = [tuple(r) for r in old(spark, SF).collect()]
            nv = [tuple(r) for r in new(spark, SF).collect()]
        else:
            ov = sorted(map(tuple, old(spark, SF).collect()))
            nv = sorted(map(tuple, new(spark, SF).collect()))
        assert ov == nv, f"{tag}: values differ"
        print(f"{tag}: values identical ({len(nv)} rows)")

    times: dict[str, list[float]] = {}
    for tag, old, new in resolved:   # codegen/JIT warm both forms
        old(spark, SF).write.mode("overwrite").format("noop").save()
        new(spark, SF).write.mode("overwrite").format("noop").save()
    for _ in range(N):
        for tag, old, new in resolved:
            for era, fn in (("old", old), ("new", new)):
                gc.collect()
                t0 = time.perf_counter()
                fn(spark, SF).write.mode("overwrite").format("noop").save()
                times.setdefault(f"{tag}/{era}", []).append(
                    round(time.perf_counter() - t0, 3))
    for tag, _, _ in resolved:
        o, n_ = times[f"{tag}/old"], times[f"{tag}/new"]
        print(f"{tag}: old med {statistics.median(o):.3f} min {min(o):.3f} | "
              f"new med {statistics.median(n_):.3f} min {min(n_):.3f} | "
              f"ratio(med) {statistics.median(n_)/statistics.median(o):.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
