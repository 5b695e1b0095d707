#!/usr/bin/env python
"""Round-5 scale stress: the round-4 operators (q87 novelty, q88
containment, q90 redaction, q91 temperature sampling, q92 projection)
plus the new q93 BLAS Gram covariance, driven at 10-500x bench scale.

Unlike stress_scale.py (which rebuilds plan shapes inline), this probe
writes synthetic `documents` / `embeddings` parquet tables to a temp dir
and calls the REGISTERED queries unchanged — the exact production code
paths, including their `_spread_docs` guards and shared candidate
generators, with invariants checked on the outputs.

Usage: python scripts/stress_r5.py [n_docs] [n_vecs] [n_sample_rows]
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
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    n_sample = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000_000

    from pyspark.sql import functions as F

    from spatial_data_engineering_spark.queries_registry import all_queries
    from spatial_data_engineering_spark.session import build_session

    spark = build_session(app_name="stress_r5")
    qs = all_queries()
    out: dict = {"n_docs": n_docs, "n_vecs": n_vecs, "n_sample": n_sample,
                 "loadavg": open("/proc/loadavg").read().split()[0]}
    tmp = tempfile.mkdtemp(prefix="stress_r5_")

    # ---- synthetic documents: per-group templates (5 docs/group share a
    # base word sequence, the stress_scale.py LSH corpus) + PII shapes in
    # ~1/8 of docs so q90 has real matches; 12 langs, zipf-ish counts
    words = ("the fast key order sort table scan merge part window small "
             "hash join query row data slow filter customer line batch "
             "value agg group stream column vector").split()
    arr = "array(" + ", ".join(f"'{w}'" for w in words) + ")"
    terms = ", ".join(
        f"element_at({arr}, pmod(hash(id DIV 5, {i}), {len(words)}) + 1)"
        for i in range(40))
    docs = (spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(f"concat(concat_ws(' ', {terms}), ' v', CAST(id AS STRING),"
               f" CASE WHEN id % 8 = 0 THEN concat(' u', CAST(id AS STRING),"
               f" '@ex.com id ', lpad(CAST(id AS STRING), 9, '0'))"
               f" ELSE '' END)").alias("text"),
        # zipf-ish language mix: lang_k gets ~n/2^(k+1) docs
        F.expr("concat('l', CAST(CAST(floor(log2(pmod(hash(id), 4096)"
               " + 2)) AS INT) AS STRING))").alias("lang"),
        F.expr("concat('s', CAST(pmod(id, 7) AS STRING))").alias("source")))
    docs = docs.withColumn("n_chars", F.length("text").cast("bigint"))
    docs.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

    emb = (spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.expr("transform(sequence(0, 63), j -> CAST(pmod(hash(id, j),"
               " 2000) / 1000.0 - 1.0 AS FLOAT))").alias("embedding"),
        F.expr("concat('c', CAST(pmod(id, 4) AS STRING))").alias("label")))
    emb.write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")

    def run(name, sf_dir=tmp):
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        return round(time.perf_counter() - t0, 2), df

    # ---- q87 novelty: one token shuffle; every doc scored, novelty<=1
    sec, df = run("q87_ngram_novelty")
    rows = df.agg(F.count(F.lit(1)).alias("n"),
                  F.max("novelty").alias("mx"),
                  F.min("novelty").alias("mn")).collect()[0]
    out["q87_sec"] = sec
    out["q87_all_docs_scored"] = rows["n"] == n_docs
    out["q87_novelty_bounded"] = bool(
        rows["mn"] >= 0.0 and rows["mx"] <= 1.0)

    # ---- q90 redaction: JVM regex pipeline.  The 'entity' pattern
    # legitimately fires on template words, so the exact invariant is the
    # PLANTED email shape: docs with n_email > 0 == the planted 1/8
    sec, df = run("q90_pattern_redact")
    n_email_docs = df.filter(F.col("n_email") > 0).count()
    out["q90_sec"] = sec
    out["q90_flagged"] = df.count()
    out["q90_email_docs"] = n_email_docs
    out["q90_email_exact"] = n_email_docs == (n_docs + 7) // 8

    # ---- q91 temperature sampling at n_sample rows: stateless hash
    # thinning; realized sample within 25% of the alpha=0.5 budget
    big = (spark.range(n_sample).select(
        F.col("id").alias("doc_id"),
        F.expr("concat('l', CAST(CAST(floor(log2(pmod(hash(id), 4096)"
               " + 2)) AS INT) AS STRING))").alias("lang"),
        F.lit("x").alias("source"),
        (F.col("id") % 997).cast("bigint").alias("n_chars"),
        F.lit("t").alias("text")))
    big_dir = f"{tmp}/big"
    big.write.mode("overwrite").parquet(f"{big_dir}/documents.parquet")
    from spatial_data_engineering_spark.operators.textops import _TEMP_BUDGET
    sec, df = run("q91_temperature_sample", big_dir)
    realized = df.count()
    out["q91_sec"] = sec
    out["q91_rows"] = n_sample
    out["q91_realized"] = realized
    out["q91_budget"] = _TEMP_BUDGET
    out["q91_within_25pct"] = bool(
        abs(realized - _TEMP_BUDGET) <= 0.25 * _TEMP_BUDGET)
    plan = df._jdf.queryExecution().executedPlan().toString()
    out["q91_no_window"] = "Window" not in plan

    # ---- q92 projection: single codegen projection, zero Exchange
    sec, df = run("q92_random_projection")
    out["q92_sec"] = sec
    plan = df._jdf.queryExecution().executedPlan().toString()
    out["q92_zero_exchange"] = "Exchange" not in plan

    # ---- q93 BLAS Gram covariance at n_vecs
    sec, df = run("q93_embedding_covariance")
    out["q93_sec"] = sec
    out["q93_cells"] = df.count()
    out["q93_cells_exact"] = out["q93_cells"] == 64 * 65 // 2

    # ---- q88 containment at a reduced doc count (exact verify over
    # df-capped candidates; candidate fraction is the scale contract)
    n88 = min(n_docs, 100_000)
    small = (spark.read.parquet(f"{tmp}/documents.parquet")
             .filter(F.col("doc_id") < n88))
    small_dir = f"{tmp}/small"
    small.write.mode("overwrite").parquet(f"{small_dir}/documents.parquet")
    sec, df = run("q88_containment_join", small_dir)
    n_pairs = df.count()
    out["q88_sec"] = sec
    out["q88_docs"] = n88
    out["q88_pairs"] = n_pairs
    out["q88_pair_fraction_of_n2"] = round(
        n_pairs / (n88 * (n88 - 1) / 2), 8)

    print(json.dumps(out))
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
