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


def _reg_domain_py(host):
    # independent reference (mirrors test_numpy_crosscheck23._reg_domain)
    from .test_numpy_crosscheck23 import _reg_domain
    return _reg_domain(host)


def test_registered_domain_randomized_triple_check(spark):
    # 400 seeded random hosts over an adversarial label alphabet (rule
    # tokens as both suffix and non-suffix positions, 1-6 labels):
    # Spark expression == DuckDB expression == pure-Python reference.
    import random

    rng = random.Random(1137)
    alphabet = ["www", "blog", "a", "b", "example", "zone3", "foo",
                "site1", "co", "ac", "com", "org", "net", "github", "io",
                "uk", "au", "ck", "bd", "jp", "localhost", "er", "app",
                "web", "gov"]
    hosts = [".".join(rng.choices(alphabet, k=rng.randint(1, 6)))
             for _ in range(400)]
    expected = [_reg_domain_py(h) for h in hosts]

    sdf = spark.createDataFrame([(h,) for h in hosts], "h string")
    import pyspark.sql.functions as F
    got_spark = [r["r"] for r in sdf.select(
        F.expr(registered_domain_spark("h")).alias("r")).collect()]
    assert got_spark == expected

    con = duckdb.connect()
    con.register("hosts_t", __import__("pandas").DataFrame({"h": hosts}))
    got_duck = [r[0] for r in con.sql(
        "SELECT " + registered_domain_sql("h") + " FROM hosts_t"
    ).fetchall()]
    assert got_duck == expected
