"""Sixth batch of independent cross-checks — the last never-driver-
verified queries: q181 q183 q184 q187 q192 q195 q200 q201 q205 q206
q207 q209.  With this batch EVERY query in the round-6 driver window
and the round-7 leftover queue has a third, formula-independent
implementation (pandas/numpy from parquet; no Spark, no DuckDB, no
shared SQL) alongside its oracle."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pytest

from .conftest import SF_ORACLE
from .test_numpy_crosscheck import _quality, _toks
from .test_numpy_crosscheck3 import _sessionize

TOL = 1e-5


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF_ORACLE}/documents.parquet")


@pytest.fixture(scope="module")
def events():
    return pd.read_parquet(f"{SF_ORACLE}/events.parquet")


def _fp(text: str) -> str:
    return hashlib.md5(
        " ".join(sorted(set(text.split(" ")))).encode()).hexdigest()


# -------------------------------------------------------------- q181
def test_q181_interarrival_vs_pandas(spark):
    from spatial_data_engineering_spark.operators.relational import (
        q181_order_interarrival)

    o = pd.read_parquet(f"{SF_ORACLE}/orders.parquet",
                        columns=["o_custkey", "o_orderkey", "o_orderdate"])
    o = o.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    d = pd.to_datetime(o.o_orderdate)
    gaps = (d.groupby(o.o_custkey).diff().dt.days.dropna()).to_numpy()
    got = q181_order_interarrival(spark, SF_ORACLE).collect()[0]
    assert got.n_gaps == len(gaps)
    assert abs(got.p50_days - np.percentile(gaps, 50)) < TOL
    assert abs(got.p90_days - np.percentile(gaps, 90)) < TOL
    assert got.max_days == int(gaps.max())


# -------------------------------------------------------------- q183
def test_q183_fk_audit_vs_pandas(spark):
    from spatial_data_engineering_spark.operators.relational import (
        q183_fk_audit)

    t = {name: pd.read_parquet(f"{SF_ORACLE}/{name}.parquet")
         for name in ("lineitem", "orders", "part", "supplier",
                      "customer", "nation")}
    expected = {
        "lineitem->orders": (
            int((~t["lineitem"].l_orderkey.isin(
                t["orders"].o_orderkey)).sum()), len(t["lineitem"])),
        "lineitem->part": (
            int((~t["lineitem"].l_partkey.isin(
                t["part"].p_partkey)).sum()), len(t["lineitem"])),
        "lineitem->supplier": (
            int((~t["lineitem"].l_suppkey.isin(
                t["supplier"].s_suppkey)).sum()), len(t["lineitem"])),
        "orders->customer": (
            int((~t["orders"].o_custkey.isin(
                t["customer"].c_custkey)).sum()), len(t["orders"])),
        "customer->nation": (
            int((~t["customer"].c_nationkey.isin(
                t["nation"].n_nationkey)).sum()), len(t["customer"])),
    }
    got = {r.fk: (r.n_orphans, r.n_rows)
           for r in q183_fk_audit(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q184
def test_q184_bounce_rate_vs_pandas(spark, events):
    from spatial_data_engineering_spark.operators.analytics import (
        q184_bounce_rate)

    e = _sessionize(events)
    per = e.groupby(["user_id", "sid"]).agg(
        start=("ts", "min"), n=("ts", "size")).reset_index()
    per["day"] = pd.to_datetime(per.start).dt.floor("D")
    got = {r.day: r for r in q184_bounce_rate(spark, SF_ORACLE).collect()}
    for day, g in per.groupby("day"):
        r = got[day.strftime("%Y-%m-%d")]
        assert r.n_sessions == len(g)
        assert r.n_bounces == int((g.n == 1).sum())
        assert abs(r.bounce_rate - round((g.n == 1).mean(), 6)) < TOL


# --------------------------------------------------------- q187/q195
def test_q187_survivor_bias_vs_pandas(spark, docs):
    from spatial_data_engineering_spark.operators.dedup import (
        q187_dedup_survivor_bias)

    d = docs.copy()
    d["h"] = d.text.map(_fp)
    keeper = d.groupby("h")["doc_id"].min()
    d["kept"] = (d.doc_id == d.h.map(keeper)).astype(int)
    got = {r.lang: r
           for r in q187_dedup_survivor_bias(spark, SF_ORACLE).collect()}
    for lang, g in d.groupby("lang"):
        r = got[lang]
        removed = len(g) - int(g.kept.sum())
        assert r.n_docs == len(g)
        assert r.n_removed == removed
        assert abs(r.removal_rate - round(removed / len(g), 6)) < TOL
        assert abs(r.avg_len_kept
                   - g.n_chars[g.kept == 1].mean()) < TOL
        if removed:
            assert abs(r.avg_len_removed
                       - g.n_chars[g.kept == 0].mean()) < TOL
        else:
            assert r.avg_len_removed is None


def test_q195_effective_tokens_vs_pandas(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q195_effective_tokens)

    d = docs.copy()
    d["h"] = d.text.map(_fp)
    d["n_tok"] = d.text.map(lambda t: len(_toks(t)))
    keeper = d.groupby("h")["doc_id"].min()
    d["kept"] = (d.doc_id == d.h.map(keeper)).astype(int)
    got = {r.lang: r for r in q195_effective_tokens(spark, SF_ORACLE).collect()}
    for lang, g in d.groupby("lang"):
        raw = int(g.n_tok.sum())
        eff = int(g.n_tok[g.kept == 1].sum())
        r = got[lang]
        assert (r.raw_tokens, r.effective_tokens) == (raw, eff)
        assert abs(r.retention - round(eff / raw, 6)) < TOL


# -------------------------------------------------------------- q192
def test_q192_segment_migration_vs_pandas(spark):
    from spatial_data_engineering_spark.operators.relational import (
        q192_segment_migration)
    from .test_numpy_crosscheck4 import _ntile4

    o = pd.read_parquet(f"{SF_ORACLE}/orders.parquet",
                        columns=["o_custkey", "o_orderdate", "o_totalprice"])
    d = pd.to_datetime(o.o_orderdate)

    def year_q(mask):
        v = o[mask].groupby("o_custkey")["o_totalprice"].sum().reset_index()
        order = v.sort_values(["o_totalprice", "o_custkey"],
                              ascending=[False, True]).o_custkey.tolist()
        return _ntile4(order)

    q1 = year_q((d >= "1996-01-01") & (d < "1997-01-01"))
    q2 = year_q((d >= "1997-01-01") & (d < "1998-01-01"))
    migration = Counter()
    for cust in set(q1) | set(q2):
        migration[(q1.get(cust, 0), q2.get(cust, 0))] += 1
    got = {(r.from_q, r.to_q): r.n_customers
           for r in q192_segment_migration(spark, SF_ORACLE).collect()}
    assert got == dict(migration)


# -------------------------------------------------------------- q200
def test_q200_corpus_stats_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q200_corpus_stats)

    n_tok = docs.text.map(lambda t: len(_toks(t)))
    eh = docs.text.map(lambda t: hashlib.md5(t.encode()).hexdigest())
    vocab = set(t for txt in docs.text for t in _toks(txt))
    expected = {
        "n_documents": len(docs),
        "n_tokens": int(n_tok.sum()),
        "n_types": len(vocab),
        "n_languages": docs.lang.nunique(),
        "n_sources": docs.source.nunique(),
        "n_exact_dup_groups": int((eh.value_counts() > 1).sum()),
        "max_doc_tokens": int(n_tok.max()),
        "min_doc_tokens": int(n_tok.min()),
        "total_chars": int(docs.text.map(len).sum()),
    }
    got = {r.stat: r.value for r in q200_corpus_stats(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q201
def test_q201_cluster_purity_vs_numpy(spark):
    from spatial_data_engineering_spark.operators.similarity import (
        q201_cluster_label_purity)

    e = pd.read_parquet(f"{SF_ORACLE}/embeddings.parquet")
    e = e.sort_values("vec_id").reset_index(drop=True)
    X = np.array(e.embedding.tolist(), dtype=np.float64)
    nrm = np.linalg.norm(X, axis=1)
    keep = nrm > 0
    e, X, nrm = e[keep].reset_index(drop=True), X[keep], nrm[keep]
    import math
    K = max(16, math.isqrt(len(e)))  # the adaptive-K contract (q148)
    C, Cn = X[:K], nrm[:K]  # first K by vec_id = the fixed centroids
    cos = (X @ C.T) / np.outer(nrm, Cn)
    # argmax with ties to the smallest cid: argmax returns first maximum
    assign = cos.argmax(axis=1)
    cids = e.vec_id.to_numpy()[:K]
    labels = e.label.to_numpy()
    expected = {}
    for k in range(K):
        m = assign == k
        if not m.any():
            continue
        counts = Counter(labels[m])
        expected[int(cids[k])] = (int(m.sum()), max(counts.values()))
    got = {r.cid: (r.n_vectors, r.n_majority)
           for r in q201_cluster_label_purity(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q205
def test_q205_supplier_coverage_vs_pandas(spark):
    from spatial_data_engineering_spark.operators.relational import (
        q205_supplier_coverage)

    li = pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])
    per_part = li.drop_duplicates().groupby("l_partkey").size()
    expected = per_part.value_counts().to_dict()
    got = {r.n_suppliers: r.n_parts
           for r in q205_supplier_coverage(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q206
def test_q206_ship_latency_vs_pandas(spark):
    from spatial_data_engineering_spark.operators.relational import (
        q206_ship_latency)

    li = pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    o = pd.read_parquet(f"{SF_ORACLE}/orders.parquet",
                        columns=["o_orderkey", "o_orderdate",
                                 "o_orderpriority"])
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    days = (pd.to_datetime(j.l_shipdate)
            - pd.to_datetime(j.o_orderdate)).dt.days
    j = j[days >= 0].assign(days=days[days >= 0])
    got = {r.o_orderpriority: r
           for r in q206_ship_latency(spark, SF_ORACLE).collect()}
    for pri, g in j.groupby("o_orderpriority"):
        r = got[pri]
        assert r.n_items == len(g)
        assert abs(r.p50_days - np.percentile(g.days, 50)) < TOL
        assert abs(r.p95_days - np.percentile(g.days, 95)) < TOL
        assert r.max_days == int(g.days.max())


# -------------------------------------------------------------- q207
def test_q207_brand_returns_vs_pandas(spark):
    from spatial_data_engineering_spark.operators.relational import (
        q207_brand_return_rate)

    li = pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet",
                         columns=["l_partkey", "l_returnflag",
                                  "l_extendedprice", "l_discount"])
    p = pd.read_parquet(f"{SF_ORACLE}/part.parquet",
                        columns=["p_partkey", "p_brand"])
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    j["ret"] = (j.l_returnflag == "R")
    j["rrev"] = np.where(j.ret, j.l_extendedprice * (1 - j.l_discount), 0.0)
    got = {r.p_brand: r
           for r in q207_brand_return_rate(spark, SF_ORACLE).collect()}
    for brand, g in j.groupby("p_brand"):
        r = got[brand]
        assert r.n_items == len(g)
        assert r.n_returned == int(g.ret.sum())
        assert abs(r.return_rate - round(g.ret.mean(), 6)) < TOL
        rr = g.rrev.sum()
        assert abs(r.returned_revenue - rr) < max(1e-4 * max(rr, 1), 1e-3)


# -------------------------------------------------------------- q209
def test_q209_scorecard_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q209_source_scorecard)
    import math

    freq = Counter(t for txt in docs.text for t in _toks(txt))
    tot = sum(freq.values())
    per = defaultdict(lambda: [0, 0, 0.0, 0, 0.0, 0.0])
    # [n_tokens, n_hapax, nll_sum, n_docs, quality_sum, diversity_sum]
    for _, row in docs.iterrows():
        src = row["source"]
        for t in _toks(row["text"]):
            per[src][0] += 1
            if freq[t] == 1:
                per[src][1] += 1
            per[src][2] += -math.log(freq[t] / tot)
        per[src][3] += 1
        per[src][4] += _quality(row)
        txt = row["text"]
        upper = max(len(txt) - 3, 1)
        grams = [txt[i:i + 4] for i in range(upper)]
        per[src][5] += round(len(set(grams)) / len(grams), 9)
    alltok = sum(v[0] for v in per.values())
    got = {r.source: r for r in q209_source_scorecard(spark, SF_ORACLE).collect()}
    assert set(got) == set(per)
    for src, (n_tok, n_hapax, nll, n_docs, qsum, dsum) in per.items():
        r = got[src]
        assert (r.n_docs, r.n_tokens) == (n_docs, n_tok)
        assert abs(r.token_share - round(n_tok / alltok, 6)) < TOL
        assert abs(r.hapax_ratio - round(n_hapax / n_tok, 6)) < TOL
        assert abs(r.avg_diversity - round(dsum / n_docs, 6)) < TOL
        assert abs(r.avg_quality - round(qsum / n_docs, 6)) < TOL
        assert abs(r.avg_nll - round(nll / n_tok, 6)) < TOL
