"""Twentieth batch of independent cross-checks: q51 SRP-LSH buckets
(projection planes + fold replicated), q60 point-in-polygon (the grid
spatial join against the pure-arithmetic box containment it implements),
q85 two-phase top-K (hash-rate survivors + exact rank), q103/q104/q106/
q125 correlated-subquery shapes, q133 video near-dup over the frame
fingerprint index.  Same contract: pure Python/numpy from parquet, no
Spark, no DuckDB, no shared SQL.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pandas as pd
import pytest

from .conftest import SF_ORACLE

TOL = 1e-5
_P = 2_147_483_647


def _close(a, b):
    return abs(a - b) <= max(abs(b) * 1e-9, TOL)


def _t(name, cols=None):
    return pd.read_parquet(f"{SF_ORACLE}/{name}.parquet", columns=cols)


def _fold_str(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % _P


# -------------------------------------------------------------- q51
def test_q51_srp_buckets_vs_python(spark):
    from spatial_data_engineering_spark.operators.similarity import (
        q51_srp_lsh_buckets)

    emb = _t("embeddings")

    def plane_w(p, i):  # 1-based dim index i
        return ((p * 73856093 + i * 19349663) % 2003) - 1001

    def fold_dot(ws, v):
        acc = 0.0
        for w, x in zip(ws, v):
            acc = acc + float(w) * float(x)
        return acc

    sig = {}
    for _, r in emb.iterrows():
        v = list(r.embedding)
        nrm = math.sqrt(fold_dot(v, v))
        if nrm <= 0:
            continue
        bucket = sum(
            (1 << p)
            for p in range(12)
            if fold_dot([plane_w(p, i) for i in range(1, len(v) + 1)], v) > 0)
        sig[int(r.vec_id)] = (bucket, v, nrm)
    expected = {}
    ids = sorted(sig)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if sig[a][0] == sig[b][0]:
                cos = fold_dot(sig[a][1], sig[b][1]) / (sig[a][2] * sig[b][2])
                expected[(a, b)] = (sig[a][0], round(cos, 6))
    got = {(r.a_id, r.b_id): (r.bucket, r.cosine)
           for r in q51_srp_lsh_buckets(spark, SF_ORACLE).collect()}
    assert set(got) == set(expected)
    for k, (bkt, cos) in expected.items():
        assert got[k][0] == bkt and _close(got[k][1], cos)


# -------------------------------------------------------------- q60
def test_q60_point_in_polygon_vs_arithmetic(spark):
    from spatial_data_engineering_spark.operators.zonal import (
        q60_point_in_polygon)

    c = _t("customer", ["c_custkey", "c_acctbal"])
    grp = defaultdict(list)
    for k, bal in zip(c.c_custkey, c.c_acctbal):
        x = ((k * 37) % 1000) / 10.0 + 0.05
        y = ((k * 61) % 1000) / 10.0 + 0.05
        grp[int(y // 20) * 5 + int(x // 20)].append(bal)
    got = {r.n_nationkey: (r.n_points, r.avg_acctbal)
           for r in q60_point_in_polygon(spark, SF_ORACLE).collect()}
    assert set(got) == set(grp)
    for nk, bals in grp.items():
        assert got[nk][0] == len(bals)
        assert _close(got[nk][1], sum(bals) / len(bals))


# -------------------------------------------------------------- q85
def test_q85_twophase_topk_vs_python(spark):
    from spatial_data_engineering_spark.operators.textops import (
        q85_twophase_topk)

    docs = _t("documents", ["doc_id", "lang", "n_chars"])
    keys = {d: _fold_str(str(d)) for d in docs.doc_id}
    expected = {}
    for lang, grp in docs.groupby("lang"):
        rate = min(1.0, 2.0 * 40 / len(grp))
        thr = math.ceil(rate * _P)
        surv = sorted((r for r in grp.itertuples()
                       if keys[r.doc_id] < thr),
                      key=lambda r: (keys[r.doc_id], r.doc_id))
        for rk, r in enumerate(surv[:40], start=1):
            expected[(lang, rk)] = (r.doc_id, r.n_chars)
    got = {(r.lang, r.rk): (r.doc_id, r.n_chars)
           for r in q85_twophase_topk(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q103
def test_q103_order_count_distribution_vs_pandas(spark):
    from spatial_data_engineering_spark.operators.subqueries import (
        q103_order_count_distribution)

    c = _t("customer", ["c_custkey"])
    o = _t("orders", ["o_custkey", "o_orderpriority"])
    sel = o[~o.o_orderpriority.str.lower().str.contains("urgent")]
    per_cust = sel.groupby("o_custkey").size()
    counts = Counter(int(per_cust.get(k, 0)) for k in c.c_custkey)
    got = {r.c_count: r.n_customers
           for r in q103_order_count_distribution(spark, SF_ORACLE).collect()}
    assert got == dict(counts)


# -------------------------------------------------------------- q104
def test_q104_large_volume_orders_vs_pandas(spark):
    from spatial_data_engineering_spark.operators.subqueries import (
        q104_large_volume_orders)

    li = _t("lineitem", ["l_orderkey", "l_quantity"])
    o = _t("orders")
    c = _t("customer", ["c_custkey", "c_name"])
    qty = li.groupby("l_orderkey").l_quantity.sum()
    big = qty[qty > 150]
    j = (o[o.o_orderkey.isin(big.index)]
         .merge(c, left_on="o_custkey", right_on="c_custkey"))
    got = {r.o_orderkey: r for r in
           q104_large_volume_orders(spark, SF_ORACLE).collect()}
    assert set(got) == set(j.o_orderkey)
    for _, e in j.iterrows():
        r = got[e.o_orderkey]
        assert r.c_name == e.c_name
        assert r.o_orderdate == pd.to_datetime(e.o_orderdate).strftime(
            "%Y-%m-%d")
        assert _close(r.o_totalprice, e.o_totalprice)
        assert _close(r.sum_qty, big[e.o_orderkey])


# -------------------------------------------------------------- q106
def test_q106_bloom_semi_join_vs_pandas(spark):
    from spatial_data_engineering_spark.operators.subqueries import (
        q106_bloom_semi_join)

    # the bloom filter only PRE-prunes; the exact semi join decides —
    # so the pandas recompute is the plain EXISTS semantics
    o = _t("orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])
    li = _t("lineitem", ["l_orderkey", "l_returnflag", "l_extendedprice"])
    keep = set(o.o_orderkey[
        o.o_orderpriority.str.lower().str.contains("urgent")
        & (o.o_totalprice > 150000)])
    sel = li[li.l_orderkey.isin(keep)]
    got = {r.l_returnflag: (r.n_items, r.sum_price)
           for r in q106_bloom_semi_join(spark, SF_ORACLE).collect()}
    grp = sel.groupby("l_returnflag").l_extendedprice.agg(["size", "sum"])
    assert set(got) == set(grp.index)
    for fl, row in grp.iterrows():
        assert got[fl][0] == row["size"] and _close(got[fl][1], row["sum"])


# -------------------------------------------------------------- q125
def test_q125_small_quantity_revenue_vs_pandas(spark):
    from spatial_data_engineering_spark.operators.subqueries import (
        q125_small_quantity_revenue)

    li = _t("lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])
    avg = li.groupby("l_partkey").l_quantity.mean()
    sel = li[li.l_quantity < 0.5 * li.l_partkey.map(avg)]
    got = {r.l_partkey: (r.n_small, r.sum_price)
           for r in q125_small_quantity_revenue(spark, SF_ORACLE).collect()}
    grp = sel.groupby("l_partkey").l_extendedprice.agg(["size", "sum"])
    assert set(got) == set(grp.index)
    for pk, row in grp.iterrows():
        assert got[pk][0] == row["size"] and _close(got[pk][1], row["sum"])


# -------------------------------------------------------------- q133
def test_q133_video_neardup_vs_python(spark):
    from spatial_data_engineering_spark.operators.multimodal import (
        q133_video_neardup)

    docs = _t("documents", ["doc_id", "text"])
    frames = defaultdict(set)
    for d, txt in zip(docs.doc_id, docs.text):
        n = len(txt.encode())
        for fi in range(0, n % 30 + 1, 5):
            frames[(n * 131 + fi * 17) % 1000003].add(d)
    pair_count = Counter()
    for checksum, ds in frames.items():
        if len(ds) > 20:  # df cap
            continue
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                pair_count[(ds[i], ds[j])] += 1
    expected = {p: n for p, n in pair_count.items() if n >= 2}
    got = {(r.a_id, r.b_id): r.n_shared_frames
           for r in q133_video_neardup(spark, SF_ORACLE).collect()}
    assert got == expected
