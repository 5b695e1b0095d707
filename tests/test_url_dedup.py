"""registered-domain extraction (q214): public-suffix-list semantics on
the edge cases that define the operator, cross-checked Spark vs DuckDB
so the two expression builders can never drift.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

from spatial_data_engineering_spark.operators.dedup import (
    registered_domain_spark, registered_domain_sql)

CASES = [
    # host, expected registered domain (None = unparseable / bare suffix)
    ("www.example.com", "example.com"),
    ("example.com", "example.com"),
    ("a.b.example.co.uk", "example.co.uk"),   # two-label suffix
    ("example.co.uk", "example.co.uk"),
    ("blog.user.github.io", "user.github.io"),  # hosting suffix
    ("user.github.io", "user.github.io"),
    ("github.io", None),      # host IS a public suffix
    ("co.uk", None),          # host IS a public suffix
    ("com", None),            # single-label TLD
    ("localhost", None),      # matches no rule
    ("deep.a.b.c.example.com", "example.com"),  # many subdomains
    # wildcard rules (*.ck, *.bd): every direct label under the TLD is
    # itself a public suffix
    ("www.zone3.ck", "www.zone3.ck"),
    ("a.b.zone.ck", "b.zone.ck"),
    ("zone3.ck", None),       # bare wildcard suffix
    ("ck", None),
    ("foo.bd", None),
    ("x.foo.bd", "x.foo.bd"),
    # exception rule (!www.ck): carved back out of the wildcard — the
    # exception label IS the registrable domain
    ("www.ck", "www.ck"),
    ("a.www.ck", "www.ck"),
]


@pytest.mark.parametrize("host,want", CASES)
def test_registered_domain_spark(spark, host, want):
    got = (spark.range(1)
           .select(F.lit(host).alias("h"))
           .select(F.expr(registered_domain_spark("h")).alias("r"))
           .first()["r"])
    assert got == want, (host, got, want)


@pytest.mark.parametrize("host,want", CASES)
def test_registered_domain_duckdb_twin(host, want):
    expr = registered_domain_sql("'" + host + "'")
    got = duckdb.sql("SELECT " + expr).fetchone()[0]
    assert got == want, (host, got, want)
