"""Tenth batch of independent cross-checks — the r3-stale statistics
rotating back into the round-7/8 windows: q26 medians, q33 exact
percentiles, q45/q46 dedup groupings, q53 per-label centroids, q82
incremental dedup admission, q83 per-dim moments, q84 hash-ordered
exact-k sample.  Same contract: pure Python/numpy from parquet, no
Spark, no DuckDB, no shared SQL."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import numpy as np
import pandas as pd
import pytest

from .conftest import SF_ORACLE

TOL = 1e-5


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF_ORACLE}/documents.parquet")


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _tokensort_fp(text: str) -> str:
    return _md5(" ".join(sorted(set(text.split(" ")))))


# -------------------------------------------------------------- q26
def test_q26_median_vs_numpy(spark):
    from spatial_data_engineering_spark.operators.relational import q26_median

    li = pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity",
                                  "l_extendedprice"])
    got = {r.l_returnflag: r for r in q26_median(spark, SF_ORACLE).collect()}
    for flag, g in li.groupby("l_returnflag"):
        r = got[flag]
        assert abs(r.med_qty - np.percentile(g.l_quantity, 50)) < TOL
        assert abs(r.med_price - np.percentile(g.l_extendedprice, 50)) < TOL


# -------------------------------------------------------------- q33
def test_q33_percentiles_vs_numpy(spark):
    from spatial_data_engineering_spark.operators.relational import (
        q33_percentiles)

    li = pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet",
                         columns=["l_returnflag", "l_extendedprice"])
    got = {r.l_returnflag: r for r in q33_percentiles(spark, SF_ORACLE).collect()}
    for flag, g in li.groupby("l_returnflag"):
        x = g.l_extendedprice.to_numpy()
        r = got[flag]
        for col, p in (("p25", 25), ("p50", 50), ("p75", 75), ("p95", 95)):
            assert abs(getattr(r, col) - np.percentile(x, p)) < TOL


# --------------------------------------------------------- q45/q46
def test_q45_q46_dedup_groups_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.dedup import (
        q45_dedup_exact, q46_dedup_tokensort)

    exact, fp = defaultdict(list), defaultdict(list)
    for _, row in docs.iterrows():
        exact[_md5(row["text"])].append(row["doc_id"])
        fp[_tokensort_fp(row["text"])].append(row["doc_id"])
    got45 = {r.h: (r.n_copies, r.keeper_doc_id)
             for r in q45_dedup_exact(spark, SF_ORACLE).collect()}
    assert got45 == {h: (len(g), min(g)) for h, g in exact.items()}
    got46 = {r.h: (r.n_copies, r.keeper_doc_id)
             for r in q46_dedup_tokensort(spark, SF_ORACLE).collect()}
    assert got46 == {h: (len(g), min(g)) for h, g in fp.items()}


# -------------------------------------------------------------- q53
def test_q53_centroids_vs_numpy(spark):
    from spatial_data_engineering_spark.operators.similarity import (
        q53_embedding_centroids)

    e = pd.read_parquet(f"{SF_ORACLE}/embeddings.parquet")
    X = np.array(e.embedding.tolist(), dtype=np.float64)
    labels = e.label.to_numpy()
    got = {(r.label, r.pos): r
           for r in q53_embedding_centroids(spark, SF_ORACLE).collect()}
    for lab in np.unique(labels):
        m = labels == lab
        mean = X[m].mean(axis=0)
        for pos in range(X.shape[1]):
            r = got[(int(lab), pos)]
            assert r.n_vectors == int(m.sum())
            assert abs(r.avg_val - mean[pos]) < 1e-4  # decimal(30,6) path


# -------------------------------------------------------------- q82
def test_q82_incremental_dedup_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.dedup import (
        q82_incremental_dedup)

    corpus_eh, corpus_fh = set(), set()
    for _, row in docs.iterrows():
        if row["doc_id"] % 10 != 9:
            corpus_eh.add(_md5(row["text"]))
            corpus_fh.add(_tokensort_fp(row["text"]))
    expected = {}
    for _, row in docs.iterrows():
        if row["doc_id"] % 10 == 9:
            if (_md5(row["text"]) not in corpus_eh
                    and _tokensort_fp(row["text"]) not in corpus_fh):
                expected[row["doc_id"]] = (row["lang"], row["source"])
    got = {r.doc_id: (r.lang, r.source)
           for r in q82_incremental_dedup(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q83
def test_q83_embedding_stats_vs_numpy(spark):
    from spatial_data_engineering_spark.operators.similarity import (
        q83_embedding_stats)

    e = pd.read_parquet(f"{SF_ORACLE}/embeddings.parquet")
    X = np.array(e.embedding.tolist(), dtype=np.float64)
    got = {r.dim: r for r in q83_embedding_stats(spark, SF_ORACLE).collect()}
    for dim in range(X.shape[1]):
        v = X[:, dim]
        r = got[dim]
        assert r.n == len(v)
        assert abs(r.mean - v.mean()) < 1e-4
        var = v.var(ddof=1)
        assert abs(r.variance - var) < 1e-4
        assert abs(r.vmin - v.min()) < TOL
        assert abs(r.vmax - v.max()) < TOL
        assert r.dead == (round(var, 6) < 0.0001)


# -------------------------------------------------------------- q84
def test_q84_sample_exact_k_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q84_sample_exact_k)

    expected = {}
    for lang, g in docs.groupby("lang"):
        order = sorted(g.doc_id, key=lambda d: (_md5(str(d)), d))
        for rk, d in enumerate(order[:40], start=1):
            expected[d] = (lang, rk)
    got = {r.doc_id: (r.lang, r.rk)
           for r in q84_sample_exact_k(spark, SF_ORACLE).collect()}
    assert got == expected
