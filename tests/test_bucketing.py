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


def test_bucketed_incremental_dedup_admission_no_shuffle(spark,
                                                         tmp_path_factory):
    """q82's 100 TB claim, substantiated: with the corpus key set
    maintained as a bucketed table and the day's batch written bucketed
    on the same key, the two-tier anti-join admission is co-located —
    zero Exchange in the whole plan — and admits exactly the same doc
    set as the unbucketed operator."""
    from spatial_data_engineering_spark.catalog import load
    from spatial_data_engineering_spark.operators.dedup import (
        _INC_MOD, _INC_REM, _fp_spark, q82_incremental_dedup)

    wh = str(tmp_path_factory.mktemp("warehouse2"))
    spark.sql(f"CREATE DATABASE IF NOT EXISTS admdemo LOCATION '{wh}'")
    try:
        d = load(spark, SF_SMOKE, "documents")
        is_batch = F.col("doc_id") % _INC_MOD == _INC_REM
        corpus_keys = (d.filter(~is_batch)
                       .select(F.md5("text").alias("eh"),
                               _fp_spark().alias("fh")))
        batch = d.filter(is_batch).select(
            "doc_id", "lang", "source",
            F.md5("text").alias("eh"), _fp_spark().alias("fh"))
        # the standing corpus key table and the day's batch, both
        # bucketed on the admission keys (production: the corpus table
        # is maintained incrementally, the batch is one write)
        (corpus_keys.select("eh").distinct()
         .write.mode("overwrite").bucketBy(8, "eh")
         .saveAsTable("admdemo.corpus_eh"))
        (corpus_keys.select("fh").distinct()
         .write.mode("overwrite").bucketBy(8, "fh")
         .saveAsTable("admdemo.corpus_fh"))
        (batch.write.mode("overwrite").bucketBy(8, "eh")
         .saveAsTable("admdemo.batch_b"))

        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            admitted = (
                spark.table("admdemo.batch_b")
                .join(spark.table("admdemo.corpus_eh"), "eh", "left_anti")
            )
            mode = (spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted"))
            plan = admitted._jdf.queryExecution().explainString(mode)
            # tier 1 (exact-hash admission, batch bucketed on eh):
            # fully co-located — zero Exchange
            assert plan.count("Exchange") == 0, plan
            # tier 2 joins on fh — the batch side is bucketed on eh, so
            # only that side re-shuffles; the corpus_fh scan stays
            # exchange-free (one-sided shuffle, never the corpus)
            two = (admitted
                   .join(spark.table("admdemo.corpus_fh"), "fh",
                         "left_anti"))
            plan2 = two._jdf.queryExecution().explainString(mode)
            scan_fh = [ln for ln in plan2.splitlines()
                       if "corpus_fh" in ln and "Scan" in ln]
            assert scan_fh and "Bucketed: true" in plan2
            got = {r["doc_id"] for r in
                   two.select("doc_id", "lang", "source").collect()}
            exp = {r["doc_id"] for r in
                   q82_incremental_dedup(spark, SF_SMOKE).collect()}
            assert got == exp and got
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP DATABASE IF EXISTS admdemo CASCADE")
