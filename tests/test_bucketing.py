"""Bucketed-table co-located join:
pre-bucketing both sides on the join key removes the shuffle entirely —
the 100 TB answer for repeated joins on the same key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from .conftest import SF_SMOKE


def test_bucketed_join_has_no_shuffle(spark, tmp_path_factory):
    from spatial_data_engineering_spark.catalog import load

    wh = str(tmp_path_factory.mktemp("warehouse"))
    spark.sql(f"CREATE DATABASE IF NOT EXISTS buckdemo LOCATION '{wh}'")
    try:
        (load(spark, SF_SMOKE, "orders")
         .write.mode("overwrite").bucketBy(8, "o_custkey")
         .sortBy("o_custkey").saveAsTable("buckdemo.orders_b"))
        (load(spark, SF_SMOKE, "customer")
         .write.mode("overwrite").bucketBy(8, "c_custkey")
         .sortBy("c_custkey").saveAsTable("buckdemo.customer_b"))

        o = spark.table("buckdemo.orders_b")
        c = spark.table("buckdemo.customer_b")
        # forbid broadcast so the join would otherwise shuffle both sides
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = o.join(c, o.o_custkey == c.c_custkey)
            mode = (spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted"))
            plan = joined._jdf.queryExecution().explainString(mode)
            assert "SortMergeJoin" in plan
            # both scans are bucketed and NOTHING shuffles: zero Exchange
            # nodes anywhere in the plan
            assert plan.count("Exchange") == 0
            assert plan.count("Bucketed: true") == 2
            n = joined.count()
            # result parity with the unbucketed join
            n_ref = (load(spark, SF_SMOKE, "orders")
                     .join(load(spark, SF_SMOKE, "customer"),
                           F.col("o_custkey") == F.col("c_custkey")).count())
            assert n == n_ref and n > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP DATABASE IF EXISTS buckdemo CASCADE")
