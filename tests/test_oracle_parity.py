"""Every queries() entry with an oracle must hash-match it (driver t2)."""

from __future__ import annotations

import pytest

from .conftest import SF_ORACLE
from .parity import compare, duckdb_connection


def _pairs():
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    return qs, os_


def pytest_generate_tests(metafunc):
    if "query_name" in metafunc.fixturenames:
        qs, _ = _pairs()
        metafunc.parametrize("query_name", sorted(qs))


@pytest.fixture(scope="module")
def duck():
    con = duckdb_connection(SF_ORACLE)
    yield con
    con.close()


def test_oracle_keys_subset_of_queries():
    qs, os_ = _pairs()
    extra = set(os_) - set(qs)
    assert not extra, f"oracle_sql keys without queries(): {extra}"


def test_parity(query_name, spark, duck):
    qs, os_ = _pairs()
    df = qs[query_name](spark, SF_ORACLE)
    if query_name not in os_:
        # rows-only check (driver's weaker path for non-SQL-expressible ops)
        assert df.count() >= 0
        return
    oracle_pdf = duck.sql(os_[query_name]).df()
    compare(df, oracle_pdf, name=query_name)
