#!/usr/bin/env python
"""Interleaved A/B for the q227 fingerprint-stage rewrite (r16 opt).

One session, alternating old/new noop-sink executions — interleaving is
the only defensible methodology on this host (documented 3-10x co-tenant
swings make separate before/after sessions incomparable)."""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("AB_ROUNDS", "7"))

from pyspark.sql import functions as F  # noqa: E402

from spatial_data_engineering_spark.catalog import load  # noqa: E402
from spatial_data_engineering_spark.operators.multimodal import (  # noqa: E402
    _AF_DF_CAP, _AF_MIN_SHARED, _AF_P, _AF_STRIDE, _AF_W,
    q227_audio_neardup)
from spatial_data_engineering_spark.session import build_session  # noqa: E402


def q227_old(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    fr = (d.filter(F.length("text") >= _AF_W)
          .select("doc_id", "text",
                  F.explode(F.expr(
                      f"sequence(0, CAST(floor((length(text) - {_AF_W})"
                      f" / CAST({_AF_STRIDE} AS DOUBLE)) AS INT))"))
                  .alias("fi"))
          .select("doc_id", "text",
                  (F.col("fi") * _AF_STRIDE + 1).alias("p")))
    fp = (fr.select(
        "doc_id",
        (F.expr(f"aggregate(split(substring(text, p, {_AF_W}), ''), 0L,"
                f" (acc, c) -> acc + ascii(c))") % _AF_P).alias("fp"))
        .distinct())
    counts = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("n_docs"))
    keep = (fp.join(counts.filter(F.col("n_docs") <= _AF_DF_CAP), "fp")
            .select("doc_id", "fp"))
    a, b = keep.alias("a"), keep.alias("b")
    return (a.join(b, (F.col("a.fp") == F.col("b.fp"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("a_id"),
                     F.col("b.doc_id").alias("b_id"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_fp"))
            .filter(F.col("n_shared_fp") >= _AF_MIN_SHARED))


def main():
    spark = build_session(app_name="ab_q227")
    spark.sparkContext.setLogLevel("ERROR")
    import gc
    times = {"old": [], "new": []}
    # warm both plans once (codegen/JIT)
    for fn in (q227_old, q227_audio_neardup):
        fn(spark, SF).write.mode("overwrite").format("noop").save()
    for _ in range(N):
        for tag, fn in (("old", q227_old), ("new", q227_audio_neardup)):
            gc.collect()
            t0 = time.perf_counter()
            fn(spark, SF).write.mode("overwrite").format("noop").save()
            times[tag].append(round(time.perf_counter() - t0, 3))
    for tag, ts in times.items():
        print(f"{tag}: median {statistics.median(ts):.3f}  all {ts}")
    spark.stop()


if __name__ == "__main__":
    main()
