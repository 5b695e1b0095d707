"""Third batch of independent cross-checks: the 23 never-driver-verified
leftovers that lead the round-7 window (q180 q182 q190 q191 q194 q197
q198 q203 q204 q208 q210 here — the math-bearing subset).  Their first
driver row is a round away, so a formula-independent reference NOW is
the cheapest risk reduction available.  Same contract as batches 1-2:
pure Python/numpy from parquet, no Spark, no DuckDB, no shared SQL."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from itertools import combinations

import numpy as np
import pandas as pd
import pytest

from .conftest import SF_ORACLE

TOL = 1e-5


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF_ORACLE}/documents.parquet")


@pytest.fixture(scope="module")
def events():
    return pd.read_parquet(f"{SF_ORACLE}/events.parquet")


def _toks(text: str) -> list[str]:
    return [t for t in text.split(" ") if t != ""]


def _sessionize(events: pd.DataFrame) -> pd.DataFrame:
    """30-min-gap sessions per user, ordered by (ts, event_id) — the
    engine's q18/q197/q198 contract, reimplemented on pandas."""
    e = events.sort_values(["user_id", "ts", "event_id"]).copy()
    # pin the unit before the int cast: pandas may hand back
    # datetime64[us] (pyarrow default) or [ns] depending on the writer
    us = pd.to_datetime(e.ts).astype("datetime64[us]").astype("int64")
    gap = us.groupby(e.user_id).diff()
    e["new_session"] = (gap.isna() | (gap > 1_800_000_000)).astype(int)
    e["sid"] = e.groupby("user_id")["new_session"].cumsum()
    return e


# -------------------------------------------------------------- q180
def test_q180_basket_lift_vs_python(spark):
    from spatial_data_engineering_spark.operators.relational import (
        q180_basket_lift)

    li = pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    lp = li.drop_duplicates()
    n_orders = lp.l_orderkey.nunique()
    marg = lp.l_partkey.value_counts().to_dict()
    pairs = Counter()
    for _, parts in lp.groupby("l_orderkey")["l_partkey"]:
        for pa, pb in combinations(sorted(parts), 2):
            pairs[(pa, pb)] += 1
    scored = [(pa, pb, n_ab,
               round(n_ab * n_orders / (marg[pa] * marg[pb]), 6))
              for (pa, pb), n_ab in pairs.items() if n_ab >= 3]
    top = sorted(scored, key=lambda r: (-r[3], r[0], r[1]))[:15]
    got = sorted(q180_basket_lift(spark, SF_ORACLE).collect(),
                 key=lambda r: r.rk)
    assert [(r.pa, r.pb, r.n_ab) for r in got] == [t[:3] for t in top]
    for r, t in zip(got, top):
        assert abs(r.lift - t[3]) < TOL


# -------------------------------------------------------------- q182
def test_q182_subword_diversity_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q182_subword_diversity)

    per_source = defaultdict(list)
    for _, row in docs.iterrows():
        txt = row["text"]
        upper = max(len(txt) - 3, 1)
        grams = [txt[i:i + 4] for i in range(upper)]
        per_source[row["source"]].append(
            round(len(set(grams)) / len(grams), 9))
    got = {r.source: r
           for r in q182_subword_diversity(spark, SF_ORACLE).collect()}
    assert set(got) == set(per_source)
    for src, ds in per_source.items():
        r = got[src]
        assert r.n_docs == len(ds)
        assert abs(r.avg_diversity - sum(ds) / len(ds)) < TOL
        assert abs(r.min_diversity - min(ds)) < TOL


# -------------------------------------------------------------- q190
def test_q190_prefix_dup_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.dedup import q190_prefix_dup

    groups = defaultdict(list)
    for _, row in docs.iterrows():
        if len(row["text"]) >= 80:
            ph = hashlib.md5(row["text"][:80].encode()).hexdigest()
            groups[ph].append((row["doc_id"], len(row["text"])))
    expected = {ph: (len(g), min(d for d, _ in g),
                     min(n for _, n in g), max(n for _, n in g))
                for ph, g in groups.items() if len(g) > 1}
    got = {r.ph: (r.n_docs, r.keeper_doc_id, r.min_len, r.max_len)
           for r in q190_prefix_dup(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q191
def test_q191_dim_redundancy_vs_numpy(spark):
    from spatial_data_engineering_spark.operators.similarity import (
        q191_dim_redundancy)

    e = pd.read_parquet(f"{SF_ORACLE}/embeddings.parquet")
    X = np.array(e.embedding.tolist(), dtype=np.float64)
    n = len(X)
    s = X.sum(axis=0)
    cov = np.round((X.T @ X - np.outer(s, s) / n) / (n - 1), 6)
    diag = np.abs(np.diag(cov)).sum()
    iu = np.triu_indices(X.shape[1], k=1)
    off = (2 * np.abs(cov[iu])).sum()
    got = q191_dim_redundancy(spark, SF_ORACLE).collect()[0]
    assert got.n_cells == X.shape[1] * (X.shape[1] + 1) // 2
    assert abs(got.diag_mass - diag) < 1e-3 * max(diag, 1.0)
    assert abs(got.offdiag_mass - off) < 1e-3 * max(off, 1.0)


# -------------------------------------------------------------- q194
def test_q194_truncation_loss_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q194_truncation_loss)

    d = docs.copy()
    d["n_tok"] = d.text.map(lambda t: len(_toks(t)))
    got = {(r.source, r.max_len): r
           for r in q194_truncation_loss(spark, SF_ORACLE).collect()}
    for src, g in d.groupby("source"):
        for t in (32, 64, 128):
            lost = (g.n_tok - t).clip(lower=0).sum()
            r = got[(src, t)]
            assert r.total_tokens == g.n_tok.sum()
            assert r.lost_tokens == lost
            assert r.n_truncated == int((g.n_tok > t).sum())
            assert abs(r.loss_frac - round(lost / g.n_tok.sum(), 6)) < TOL


# -------------------------------------------------------------- q197
def test_q197_session_survival_vs_python(spark, events):
    from spatial_data_engineering_spark.operators.analytics import (
        q197_session_survival)

    sizes = _sessionize(events).groupby(["user_id", "sid"]).size()
    n_sessions = len(sizes)
    got = {r.k: r for r in q197_session_survival(spark, SF_ORACLE).collect()}
    for k in (1, 2, 3, 4, 5):
        reach = int((sizes >= k).sum())
        prev = int((sizes >= k - 1).sum())
        r = got[k]
        assert r.n_reaching == reach
        assert abs(r.p_reach - round(reach / n_sessions, 6)) < TOL
        if prev == 0:
            assert r.p_continue is None  # NULLIF(prev, 0) in the contract
        else:
            assert abs(r.p_continue - round(reach / prev, 6)) < TOL


# -------------------------------------------------------------- q198
def test_q198_position_decay_vs_python(spark, events):
    from spatial_data_engineering_spark.operators.analytics import (
        q198_position_value_decay)

    e = _sessionize(events)
    e["pos"] = e.groupby(["user_id", "sid"]).cumcount() + 1
    got = {r.pos: r
           for r in q198_position_value_decay(spark, SF_ORACLE).collect()}
    for pos in range(1, 6):
        g = e[e.pos == pos]
        if len(g) == 0:
            assert pos not in got  # no session reaches this position
            continue
        r = got[pos]
        assert r.n_events == len(g)
        assert abs(r.avg_value - g.value.mean()) < TOL
    assert 1 in got  # at least the opening position must exist


# -------------------------------------------------------------- q203
def test_q203_quantization_error_vs_numpy(spark):
    from spatial_data_engineering_spark.operators.similarity import (
        q203_quantization_error)

    e = pd.read_parquet(f"{SF_ORACLE}/embeddings.parquet")
    X = np.array(e.embedding.tolist(), dtype=np.float64)
    scale = np.abs(X).max(axis=1)
    keep = scale > 0
    X, scale = X[keep], scale[keep]
    q = X * 127.0 / scale[:, None]
    # half-away-from-zero rounding (DuckDB/Spark round), not banker's
    qr = np.sign(q) * np.floor(np.abs(q) + 0.5)
    err = np.abs(X - qr * scale[:, None] / 127.0)
    mae = np.round(err.mean(axis=1), 9)
    rel = np.round(err.mean(axis=1) / (scale / 127.0), 9)
    got = q203_quantization_error(spark, SF_ORACLE).collect()[0]
    assert got.n_vectors == len(X)
    assert abs(got.avg_mae - mae.mean()) < TOL
    assert abs(got.p95_mae - np.percentile(mae, 95)) < TOL
    assert abs(got.max_rel_mae - round(rel.max(), 6)) < TOL


# -------------------------------------------------------------- q204
def test_q204_forecast_revenue_vs_python(spark):
    from spatial_data_engineering_spark.operators.relational import (
        q204_forecast_revenue)

    li = pd.read_parquet(
        f"{SF_ORACLE}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])
    sd = pd.to_datetime(li.l_shipdate)
    m = ((sd >= "1996-01-01") & (sd < "1997-01-01")
         & (li.l_discount >= 0.02) & (li.l_discount <= 0.05)
         & (li.l_quantity < 24))
    rev = (li.l_extendedprice[m] * li.l_discount[m]).sum()
    got = q204_forecast_revenue(spark, SF_ORACLE).collect()[0]
    assert got.n_items == int(m.sum())
    assert abs(got.potential_revenue - rev) < max(1e-4 * rev, 1e-3)


# -------------------------------------------------------------- q208
def test_q208_embedding_norm_qa_vs_numpy(spark):
    from spatial_data_engineering_spark.operators.similarity import (
        q208_embedding_norm_qa)

    e = pd.read_parquet(f"{SF_ORACLE}/embeddings.parquet")
    X = np.array(e.embedding.tolist(), dtype=np.float64)
    nrm = np.sqrt((X * X).sum(axis=1))
    labels = e.label.to_numpy()
    got = {int(r.label): r
           for r in q208_embedding_norm_qa(spark, SF_ORACLE).collect()}
    for lab in np.unique(labels):
        m = labels == lab
        r = got[int(lab)]
        assert r.n_vectors == int(m.sum())
        assert r.n_zero_norm == int((nrm[m] == 0).sum())
        assert abs(r.avg_norm - nrm[m].mean()) < TOL
        assert abs(r.min_norm - nrm[m].min()) < TOL
        assert abs(r.max_norm - nrm[m].max()) < TOL


# -------------------------------------------------------------- q210
def test_q210_word_length_hist_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q210_word_length_hist)

    hist = Counter(len(t) for txt in docs.text for t in _toks(txt))
    got = {r.word_len: r.n_tokens
           for r in q210_word_length_hist(spark, SF_ORACLE).collect()}
    assert got == dict(hist)
