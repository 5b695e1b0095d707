"""Pure-Python replay of the round-11 additions (q214/q215) — the
third-way check (no Spark expressions, no DuckDB SQL): URL derivation +
public-suffix matching with re/str, and the rate-limit admission with a
plain sorted groupby.
"""

from __future__ import annotations

import re
from collections import defaultdict

import pandas as pd
import pytest

from .conftest import SF_ORACLE


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(SF_ORACLE + "/documents.parquet")


@pytest.fixture(scope="module")
def events():
    return pd.read_parquet(SF_ORACLE + "/events.parquet")


_TWO = {"co.uk", "ac.uk", "org.uk", "com.au", "net.au", "co.jp",
        "com.br", "github.io", "web.app"}
_ONE = {"com", "org", "net", "io", "edu", "gov", "de", "fr", "jp",
        "uk", "au", "br", "us", "ca", "in"}


_WILD = {"ck", "bd"}
_EXC = {"www.ck"}


def _reg_domain(host: str) -> str | None:
    labels = host.split(".")
    if len(labels) >= 2 and ".".join(labels[-2:]) in _EXC:
        return ".".join(labels[-2:])
    if labels[-1] in _WILD:
        return ".".join(labels[-3:]) if len(labels) >= 3 else None
    if len(labels) >= 2 and ".".join(labels[-2:]) in _TWO:
        return ".".join(labels[-3:]) if len(labels) >= 3 else None
    if len(labels) >= 2 and labels[-1] in _ONE:
        return ".".join(labels[-2:])
    return None


def _url(doc_id: int) -> str:
    suffix = ["com", "co.uk", "github.io", "org"][doc_id % 4]
    sub = ["www.", "blog.", ""][doc_id % 3]
    if doc_id % 31 == 0:
        return f"https://{suffix}/p{doc_id % 7}"
    if doc_id % 37 == 0:
        return f"https://www.ck/p{doc_id % 7}"
    if doc_id % 29 == 0:
        return f"https://{sub}zone{doc_id % 5}.ck/p{doc_id % 7}"
    return f"https://{sub}site{doc_id % 13}.{suffix}/p{doc_id % 7}"


def test_q214_url_domain_dedup_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.dedup import (
        q214_url_domain_dedup)

    per = defaultdict(lambda: [0, set(), set()])  # n, hosts, paths
    for doc_id in docs["doc_id"]:
        url = _url(int(doc_id))
        m = re.match(r"^[a-z]+://(?:[^@/]*@)?([^/:]+)(/.*)$", url)
        host, path = m.group(1), m.group(2)
        dom = _reg_domain(host) or "(none)"
        row = per[dom]
        row[0] += 1
        row[1].add(host)
        row[2].add(path)
    expected = {d: (n, len(h), len(p), n - len(p))
                for d, (n, h, p) in per.items()}
    got = {r.registered_domain: (r.n_docs, r.n_hosts, r.n_kept, r.n_dropped)
           for r in q214_url_domain_dedup(spark, SF_ORACLE).collect()}
    assert got == expected


def test_q215_rate_limited_sample_vs_python(spark, events):
    from spatial_data_engineering_spark.plans.curation import (
        _RATE_R, q215_rate_limited_sample)

    df = events.copy()
    df["b"] = df["ts"].dt.floor("D")
    df = df.sort_values(["ts", "event_id"])
    df["rn"] = df.groupby(["user_id", "b"]).cumcount() + 1
    agg = df.groupby("b").apply(
        lambda g: pd.Series({
            "n_arrived": len(g),
            "n_admitted": int((g["rn"] <= _RATE_R).sum()),
            "n_capped_users": g.loc[g["rn"] > _RATE_R, "user_id"]
                               .nunique()}),
        include_groups=False)
    expected = {b.strftime("%Y-%m-%d %H:%M:%S"):
                (int(r["n_arrived"]), int(r["n_admitted"]),
                 int(r["n_capped_users"]))
                for b, r in agg.iterrows()}
    got = {r.window_start: (r.n_arrived, r.n_admitted, r.n_capped_users)
           for r in q215_rate_limited_sample(spark, SF_ORACLE).collect()}
    assert got == expected


def test_q215_admissions_match_python_row_level(spark, events):
    from spatial_data_engineering_spark.catalog import load
    from spatial_data_engineering_spark.plans.curation import (
        rate_limited_admissions)

    df = events.sort_values(["ts", "event_id"]).copy()
    df["b"] = df["ts"].dt.floor("D")
    df["rn"] = df.groupby(["user_id", "b"]).cumcount() + 1
    expected = set(df.loc[df["rn"] <= 2, "event_id"].astype(int))
    got = {r.event_id for r in rate_limited_admissions(
        load(spark, SF_ORACLE, "events"), r=2).collect()}
    assert got == expected
