"""Eleventh batch of independent cross-checks — r5-verified math
queries that rotate stale in round 8: q99 z-score outliers, q100
time-weighted average, q108 TF-IDF argmax, q109 triangle count (full
independent graph enumeration), q115 BFS hops, q116 PSI drift, q121
token entropy, q123 MAD outliers.  Same contract: pure Python/numpy
from parquet, no Spark, no DuckDB, no shared SQL."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from itertools import combinations

import numpy as np
import pandas as pd
import pytest

from .conftest import SF_ORACLE
from .test_numpy_crosscheck4 import _us

TOL = 1e-5


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF_ORACLE}/documents.parquet")


@pytest.fixture(scope="module")
def events():
    return pd.read_parquet(f"{SF_ORACLE}/events.parquet")


def _copurchase_edges():
    """The q109/q115 graph: co-purchased part pairs over the md5-sampled
    order subset (md5(orderkey) < '0d')."""
    li = pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    keep = {k for k in li.l_orderkey.unique()
            if hashlib.md5(str(k).encode()).hexdigest() < "0d"}
    lp = li[li.l_orderkey.isin(keep)].drop_duplicates()
    edges = set()
    for _, parts in lp.groupby("l_orderkey")["l_partkey"]:
        for a, b in combinations(sorted(set(parts)), 2):
            edges.add((a, b))
    return edges


# -------------------------------------------------------------- q99
def test_q99_zscore_vs_numpy(spark, events):
    from spatial_data_engineering_spark.operators.analytics import (
        q99_zscore_anomaly)

    got = {r.event_type: r for r in q99_zscore_anomaly(spark, SF_ORACLE).collect()}
    for et, g in events.groupby("event_type"):
        v = g.value.to_numpy(dtype=float)
        z = np.abs((v - v.mean()) / v.std(ddof=1))
        out = z > 2.0
        if not out.any():
            assert et not in got
            continue
        r = got[et]
        assert r.n_outliers == int(out.sum())
        assert abs(r.sum_abs_z - z[out].sum()) < 1e-3


# -------------------------------------------------------------- q100
def test_q100_twa_vs_pandas(spark, events):
    from spatial_data_engineering_spark.operators.analytics import (
        q100_time_weighted_avg)

    e = events.sort_values(["user_id", "ts", "event_id"]).copy()
    e["us"] = _us(e.ts)
    e["next_us"] = e.groupby("user_id")["us"].shift(-1)
    e = e[e.next_us.notna()]
    e["dur"] = e.next_us - e.us
    got = {r.user_id: r.twa_value
           for r in q100_time_weighted_avg(spark, SF_ORACLE).collect()}
    for user, g in e.groupby("user_id"):
        if g.dur.sum() <= 0:
            assert user not in got
            continue
        twa = round((g.value * g.dur).sum() / g.dur.sum(), 6)
        assert abs(got[user] - twa) < TOL


# -------------------------------------------------------------- q108
def test_q108_tfidf_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q108_tfidf_keywords)

    tf = defaultdict(Counter)
    for _, row in docs.iterrows():
        for t in row["text"].split(" "):
            if t != "":
                tf[row["doc_id"]][t] += 1
    df = Counter()
    for cnts in tf.values():
        df.update(cnts.keys())
    n_docs = len(docs)
    expected = {}
    for d, cnts in tf.items():
        scored = [(-round(c * math.log(n_docs / df[t]), 6), t, c)
                  for t, c in cnts.items()]
        negs, term, c = min(scored)
        expected[d] = (term, c, df[term], -negs)
    got = {r.doc_id: (r.top_term, r.tf, r.df, r.score)
           for r in q108_tfidf_keywords(spark, SF_ORACLE).collect()}
    assert set(got) == set(expected)
    for d, (term, c, dfv, score) in expected.items():
        assert got[d][:3] == (term, c, dfv)
        assert abs(got[d][3] - score) < TOL


# -------------------------------------------------------------- q109
def test_q109_triangles_vs_python(spark):
    from spatial_data_engineering_spark.operators.clustering import (
        q109_triangle_count)

    edges = _copurchase_edges()
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    tri = 0
    for u, v in edges:
        tri += len(adj[u] & adj[v] - {u, v})
    tri //= 3
    wedges = sum(len(nb) * (len(nb) - 1) // 2 for nb in adj.values())
    got = q109_triangle_count(spark, SF_ORACLE).collect()[0]
    assert got.n_edges == len(edges)
    assert got.n_wedges == wedges
    assert got.n_triangles == tri


# -------------------------------------------------------------- q115
def test_q115_bfs_vs_python(spark):
    from spatial_data_engineering_spark.operators.clustering import (
        q115_bfs_hops)

    edges = _copurchase_edges()
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    seeds = sorted({u for u, _ in edges})[:5]
    hops = {s: 0 for s in seeds}
    frontier = list(seeds)
    for h in range(1, 5):
        nxt = []
        for n in frontier:
            for m in adj[n]:
                if m not in hops:
                    hops[m] = h
                    nxt.append(m)
        frontier = nxt
    got = {r.node: r.hops for r in q115_bfs_hops(spark, SF_ORACLE).collect()}
    assert got == hops


# -------------------------------------------------------------- q116
def test_q116_psi_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q116_psi_drift)

    ref = Counter(docs[docs.doc_id % 2 == 0].lang)
    cur = Counter(docs[docs.doc_id % 2 == 1].lang)
    t_ref, t_cur = sum(ref.values()), sum(cur.values())
    got = {r.lang: r for r in q116_psi_drift(spark, SF_ORACLE).collect()}
    for lang in set(ref) | set(cur):
        pr, pc = ref[lang] / t_ref, cur[lang] / t_cur
        r = got[lang]
        assert abs(r.p_ref - round(pr, 6)) < TOL
        assert abs(r.p_cur - round(pc, 6)) < TOL
        assert abs(r.psi_contrib
                   - round((pc - pr) * math.log(pc / pr), 6)) < TOL


# -------------------------------------------------------------- q121
def test_q121_entropy_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q121_token_entropy)

    tf = defaultdict(Counter)
    for _, row in docs.iterrows():
        for t in row["text"].split(" "):
            if t != "":
                tf[row["lang"]][t] += 1
    got = {r.lang: r for r in q121_token_entropy(spark, SF_ORACLE).collect()}
    for lang, cnts in tf.items():
        t = sum(cnts.values())
        h = -sum((n / t) * math.log(n / t) for n in cnts.values())
        r = got[lang]
        assert r.n_distinct == len(cnts)
        assert abs(r.entropy - h) < TOL


# -------------------------------------------------------------- q123
def test_q123_mad_vs_numpy(spark, events):
    from spatial_data_engineering_spark.operators.analytics import (
        q123_mad_outliers)

    got = {r.event_type: r for r in q123_mad_outliers(spark, SF_ORACLE).collect()}
    for et, g in events.groupby("event_type"):
        v = g.value.to_numpy(dtype=float)
        med = np.percentile(v, 50)
        mad = np.percentile(np.abs(v - med), 50)
        out = 0.6745 * np.abs(v - med) / mad > 3.5
        r = got[et]
        assert abs(r.median_value - med) < TOL
        assert abs(r.mad - mad) < TOL
        assert r.n_outliers == int(out.sum())
