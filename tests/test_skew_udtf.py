"""Salted-join parity + Python UDTF surface (SURVEY §2 H note: Spark
Python UDTFs 'available if the driver suite wants one')."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_SMOKE


def test_salted_join_parity(spark):
    from spatial_data_engineering_spark.catalog import load
    from spatial_data_engineering_spark.operators.skew import salted_join

    o = load(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment")

    plain = o.join(c, "o_custkey").groupBy("c_mktsegment").count()
    salted = salted_join(o, c, "o_custkey", n_salt=4).groupBy(
        "c_mktsegment").count()
    a = {r["c_mktsegment"]: r["count"] for r in plain.collect()}
    b = {r["c_mktsegment"]: r["count"] for r in salted.collect()}
    assert a == b and sum(a.values()) > 0


def test_python_udtf_shingles(spark):
    """Spark 4 Python UDTF: explode a doc into char shingles with offsets
    — the table-function shape of q43/q47's shingling."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, shingle string")
    class Shingle:
        def eval(self, text: str, k: int):
            if text is None:
                return
            n = max(len(text) - k + 1, 1)
            for i in range(n):
                yield i, text[i:i + k]

    spark.udtf.register("shingle", Shingle)
    rows = spark.sql(
        "SELECT s.pos, s.shingle FROM (SELECT 'abcdef' AS t), "
        "LATERAL shingle(t, 4) AS s"
    ).collect()
    assert [(r.pos, r.shingle) for r in rows] == [
        (0, "abcd"), (1, "bcde"), (2, "cdef")]
