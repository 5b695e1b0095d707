#!/usr/bin/env python
"""Scale-stress for the round-7 third-session rewrites.

Runs the four queries rewritten this session — q47 (pinned shingle
frame), q87 (pinned shingle frame), q139 (single-pass presence-flag
aggregation), q167 (content-hash windows) — on synthetic corpora 10x
and 20x the sf0.1 bench document count, and prints one JSON line of
timings + output row counts per scale.  The point is the scaling curve:
each rewrite's cost must grow ~linearly in corpus size (the shingle
fan-out dominates), with no quadratic term and no driver-side
materialization beyond the pinned doc-sized frames.

Usage: python scripts/stress_r7_rewrites.py [n_docs_base] [factors...]
Defaults: base 20_000 (the sf0.1 corpus size), factors 10 20.
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

QUERIES = ("q47_minhash_lsh", "q87_ngram_novelty",
           "q139_split_contamination", "q167_dedup_strategy_venn")


def main() -> None:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    factors = [int(a) for a in sys.argv[2:]] or [10, 20]

    from pyspark.sql import functions as F

    from spatial_data_engineering_spark.queries_registry import all_queries
    from spatial_data_engineering_spark.session import build_session

    spark = build_session(app_name="stress_r7_rewrites")
    qs = all_queries()
    out: dict = {"base": base, "factors": factors,
                 "loadavg": open("/proc/loadavg").read().split()[0],
                 "scales": {}}

    # same per-group template corpus as stress_r5 (5 docs/group share a
    # word sequence so the dedup families have real near-dup structure)
    words = ("the fast key order sort table scan merge part window small "
             "hash join query row data slow filter customer line batch "
             "value agg group stream column vector").split()
    arr = "array(" + ", ".join(f"'{w}'" for w in words) + ")"
    terms = ", ".join(
        f"element_at({arr}, pmod(hash(id DIV 5, {i}), {len(words)}) + 1)"
        for i in range(40))

    for f in factors:
        n_docs = base * f
        tmp = tempfile.mkdtemp(prefix=f"stress_r7_{f}x_")
        docs = (spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.expr(f"concat(concat_ws(' ', {terms}), ' v',"
                   f" CAST(id AS STRING))").alias("text"),
            F.expr("concat('l', CAST(pmod(id, 5) AS STRING))").alias("lang"),
            F.expr("concat('s', CAST(pmod(id, 7) AS STRING))")
            .alias("source")))
        docs = docs.withColumn("n_chars", F.length("text").cast("bigint"))
        docs.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")

        row: dict = {"n_docs": n_docs}
        for name in QUERIES:
            t0 = time.perf_counter()
            df = qs[name](spark, tmp)
            n = df.count()
            row[name] = {"sec": round(time.perf_counter() - t0, 2),
                         "rows": n}
        out["scales"][f"{f}x"] = row
        shutil.rmtree(tmp, ignore_errors=True)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
