#!/usr/bin/env python
"""Interleaved A/B for q180's top-15 tail (r17 opt).

Old: row_number over a GLOBAL window (single-partition full sort of the
supported pair table) filtered to rk <= 15.
New: orderBy(lift desc, pa, pb).limit(15) -> TakeOrderedAndProject (per-
partition top-15 heaps, 15-row merge), then row_number over the 15 rows.
Identical total order => identical rows and rk.  Values asserted equal
before timing."""

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
from spatial_data_engineering_spark.operators.relational import (  # noqa: E402
    _Q180_MIN_SUPPORT, q180_basket_lift)
from spatial_data_engineering_spark.session import build_session  # noqa: E402


def q180_old(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    lp = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = lp.agg(F.countDistinct("l_orderkey").alias("n"))
    a = lp.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = lp.select("l_orderkey", F.col("l_partkey").alias("pb"))
    pairs = (a.join(b, "l_orderkey")
             .filter(F.col("pa") < F.col("pb"))
             .groupBy("pa", "pb").agg(F.count(F.lit(1)).alias("n_ab"))
             .filter(F.col("n_ab") >= _Q180_MIN_SUPPORT))
    marg = lp.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    ma = marg.select(F.col("l_partkey").alias("pa"), F.col("n").alias("na"))
    mb = marg.select(F.col("l_partkey").alias("pb"), F.col("n").alias("nb"))
    lift = F.round(F.col("n_ab").cast("double") * F.col("n")
                   / (F.col("na") * F.col("nb").cast("double")), 6)
    scored = (pairs.join(ma, "pa").join(mb, "pb")
              .crossJoin(F.broadcast(n_orders))
              .select("pa", "pb", "n_ab", lift.alias("lift")))
    rk = F.row_number().over(
        W.orderBy(F.desc("lift"), F.asc("pa"), F.asc("pb")))
    return (scored.withColumn("rk", rk).filter(F.col("rk") <= 15)
            .select("pa", "pb", F.col("n_ab").cast("bigint").alias("n_ab"),
                    "lift", F.col("rk").cast("int").alias("rk")))


def main():
    spark = build_session(app_name="ab_q180")
    spark.sparkContext.setLogLevel("ERROR")

    old_rows = sorted(map(tuple, q180_old(spark, SF).collect()))
    new_rows = sorted(map(tuple, q180_basket_lift(spark, SF).collect()))
    assert old_rows == new_rows, "A/B values differ — abort"
    print(f"values identical ({len(new_rows)} rows)")

    times = {"old": [], "new": []}
    for fn in (q180_old, q180_basket_lift):
        fn(spark, SF).write.mode("overwrite").format("noop").save()
    for _ in range(N):
        for tag, fn in (("old", q180_old), ("new", q180_basket_lift)):
            gc.collect()
            t0 = time.perf_counter()
            fn(spark, SF).write.mode("overwrite").format("noop").save()
            times[tag].append(round(time.perf_counter() - t0, 3))
    for tag, ts in times.items():
        print(f"{tag}: median {statistics.median(ts):.3f} "
              f"min {min(ts):.3f}  all {ts}")
    spark.stop()


if __name__ == "__main__":
    main()
