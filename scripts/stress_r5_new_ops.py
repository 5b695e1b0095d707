#!/usr/bin/env python
"""Round-5 new-operator scale stress: analytics (q97/q98/q100/q101/q112),
corpus ops (q107/q108/q113) and the subquery/graph pair (q106/q109),
driven at 10-100x bench scale through the REGISTERED query functions on
synthetic parquet tables shaped like the testdata.

Invariants checked on outputs (not just timings): line-dedup mass
conservation, funnel monotonicity, SCD2 interval nesting, CMS
no-undercount.

Usage: python scripts/stress_r5_new_ops.py [n_events] [n_docs] [n_lineitem]
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
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    n_li = int(sys.argv[3]) if len(sys.argv) > 3 else 6_000_000

    from pyspark.sql import functions as F

    from spatial_data_engineering_spark.queries_registry import all_queries
    from spatial_data_engineering_spark.session import build_session

    spark = build_session(app_name="stress_r5_new")
    qs = all_queries()
    out: dict = {"n_events": n_events, "n_docs": n_docs, "n_lineitem": n_li,
                 "loadavg": open("/proc/loadavg").read().split()[0]}
    tmp = tempfile.mkdtemp(prefix="stress_r5n_")

    # ---- events: n_users = n_events/1000, 60-day span, hash-spread ts so
    # per-user streams interleave; value heavy-tailed enough for z-scores
    n_users = max(200, n_events // 1000)
    ev = spark.range(n_events).select(
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
    )
    ev.write.mode("overwrite").parquet(f"{tmp}/events.parquet")

    # ---- documents: groups of 5 share a 40-word template (line dedup has
    # real mass to remove: 4 shared 10-word lines per group) + a unique tail
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
        F.length(F.expr("concat_ws(' ', 'x')")).cast("bigint")
        .alias("n_chars"),
    )
    docs.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

    # ---- orders/lineitem at ~10x sf0.1 for the bloom join + triangles
    n_orders = n_li // 4
    spark.range(n_orders).select(
        F.col("id").alias("o_orderkey"),
        F.pmod(F.xxhash64("id", F.lit(9)), F.lit(n_orders // 10))
        .alias("o_custkey"),
        (F.pmod(F.xxhash64("id"), F.lit(300_000)) / 1.0 + 1000.0
         ).alias("o_totalprice"),
        F.element_at(F.array(*[F.lit(p) for p in
                               ("1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW")]),
                     (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(4)) + 1)
                     .cast("int")).alias("o_orderpriority"),
    ).write.mode("overwrite").parquet(f"{tmp}/orders.parquet")
    spark.range(n_li).select(
        (F.col("id") / 4).cast("bigint").alias("l_orderkey"),
        F.pmod(F.xxhash64("id"), F.lit(n_li // 100)).alias("l_partkey"),
        F.when(F.pmod(F.xxhash64("id", F.lit(2)), F.lit(4)) == 0, "R")
        .otherwise("N").alias("l_returnflag"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(5000)) / 100.0
         ).alias("l_extendedprice"),
    ).write.mode("overwrite").parquet(f"{tmp}/lineitem.parquet")

    def run(name, **checks):
        t0 = time.perf_counter()
        df = qs[name](spark, tmp)
        rows = df.count()
        dt = round(time.perf_counter() - t0, 2)
        out[name] = {"rows": rows, "sec": dt}
        return df

    # corpus ops
    df107 = run("q107_line_dedup")
    agg = df107.agg(F.sum("n_lines").alias("nl"),
                    F.sum("n_kept").alias("nk")).collect()[0]
    assert agg["nk"] < agg["nl"], "line dedup removed nothing"
    out["q107_kept_frac"] = round(agg["nk"] / agg["nl"], 4)

    run("q108_tfidf_keywords")
    df113 = run("q113_cms_heavy_hitters")
    r = df113.collect()
    assert all(x.overestimate >= 0 for x in r), "CMS undercounted"

    # analytics
    df97 = run("q97_funnel")
    r = df97.collect()[0]
    assert r.n_view >= r.n_click >= r.n_purchase, "funnel not monotone"
    run("q98_cohort_retention")
    run("q100_time_weighted_avg")
    run("q101_gap_fill_interpolate")
    df112 = run("q112_scd2_intervals")
    bad = df112.filter(
        F.col("valid_to_us").isNotNull()
        & (F.col("valid_to_us") <= F.col("valid_from_us"))).count()
    assert bad == 0, "SCD2 intervals out of order"

    # sketches at corpus scale
    df114 = run("q114_kmv_distinct")
    r = df114.collect()[0]
    rel_err = abs(r.est_distinct - r.exact_distinct) / r.exact_distinct
    out["q114_rel_err"] = round(rel_err, 4)
    assert rel_err < 0.5, "KMV estimate wildly off"   # k=64 -> ~12% expected
    run("q119_kmv_setops")
    run("q121_token_entropy")

    # subquery/graph
    run("q106_bloom_semi_join")
    run("q109_triangle_count")
    run("q115_bfs_hops")
    run("q124_incremental_agg_merge")

    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
