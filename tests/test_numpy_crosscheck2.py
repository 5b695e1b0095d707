"""Second batch of independent numpy / pure-Python cross-checks — the
rest of the round-6 driver window's math queries (q141 q143 q147 q159
q161 q170 q174 q176).  Same contract as test_numpy_crosscheck.py: a
third implementation straight from the parquet files, no Spark, no
DuckDB, no shared SQL; ints/strings exact, floats to 1e-5."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pytest

from .conftest import SF_ORACLE

TOL = 1e-5


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF_ORACLE}/documents.parquet")


def _toks(text: str) -> list[str]:
    return [t for t in text.split(" ") if t != ""]


# -------------------------------------------------------------- q141
def test_q141_unigram_nll_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q141_unigram_logprob)

    freq = Counter(t for txt in docs.text for t in _toks(txt))
    tot = sum(freq.values())
    per_source = defaultdict(list)
    for _, row in docs.iterrows():
        toks = _toks(row["text"])
        nll = sum(-math.log(freq[t] / tot) for t in toks) / len(toks)
        per_source[row["source"]].append(nll)
    got = {r.source: r for r in q141_unigram_logprob(spark, SF_ORACLE).collect()}
    assert set(got) == set(per_source)
    for src, nlls in per_source.items():
        r = got[src]
        assert r.n_docs == len(nlls)
        assert abs(r.avg_nll - sum(nlls) / len(nlls)) < TOL
        assert abs(r.min_nll - min(nlls)) < TOL
        assert abs(r.max_nll - max(nlls)) < TOL


# -------------------------------------------------------------- q143
def test_q143_bpe_pairs_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q143_bpe_pair_counts)

    pairs = Counter()
    for txt in docs.text:
        for w in txt.split(" "):
            if len(w) >= 2:
                for i in range(len(w) - 1):
                    pairs[w[i:i + 2]] += 1
    top = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = sorted(q143_bpe_pair_counts(spark, SF_ORACLE).collect(),
                 key=lambda r: r.rk)
    assert [(r.pair, r.n) for r in got] == top


# -------------------------------------------------------------- q147
def test_q147_chi2_keywords_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q147_chi2_keywords)

    lt = Counter()
    tmarg = Counter()
    lmarg = Counter()
    n = 0
    for _, row in docs.iterrows():
        for t in _toks(row["text"]):
            lt[(row["lang"], t)] += 1
            tmarg[t] += 1
            lmarg[row["lang"]] += 1
            n += 1
    scored = defaultdict(list)
    for (lang, t), a in lt.items():
        b = tmarg[t] - a
        c = lmarg[lang] - a
        d = n - tmarg[t] - lmarg[lang] + a
        if a * d > b * c:
            chi2 = round(n * (a * d - b * c) ** 2
                         / ((a + b) * (c + d) * (a + c) * (b + d)), 6)
            scored[lang].append((t, chi2))
    expected = {}
    for lang, items in scored.items():
        top = sorted(items, key=lambda kv: (-kv[1], kv[0]))[:5]
        expected[lang] = top
    got = defaultdict(list)
    for r in sorted(q147_chi2_keywords(spark, SF_ORACLE).collect(),
                    key=lambda r: (r.lang, r.rk)):
        got[r.lang].append((r.token, r.chi2))
    assert set(got) == set(expected)
    for lang in expected:
        assert [t for t, _ in got[lang]] == [t for t, _ in expected[lang]]
        for (_, g), (_, e) in zip(got[lang], expected[lang]):
            assert abs(g - e) < TOL


# -------------------------------------------------------------- q159
def test_q159_bm25_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import q159_bm25_topk

    K1, B = 1.2, 1.0 - 0.25  # k1=1.2, b=0.75
    B = 0.75
    dlen = {row["doc_id"]: len(_toks(row["text"]))
            for _, row in docs.iterrows()}
    n_docs = len(dlen)
    avgdl = sum(dlen.values()) / n_docs
    tf = defaultdict(Counter)
    for _, row in docs.iterrows():
        for t in row["text"].split(" "):
            if t in ("hash", "join", "merge"):
                tf[row["doc_id"]][t] += 1
    df = Counter()
    for cnts in tf.values():
        for t in cnts:
            df[t] += 1
    scores = {}
    for doc_id, cnts in tf.items():
        s = 0.0
        for t, f in cnts.items():
            idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * (f * (K1 + 1.0)) / (
                f + K1 * (1.0 - B + B * dlen[doc_id] / avgdl))
        scores[doc_id] = s
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = sorted(q159_bm25_topk(spark, SF_ORACLE).collect(), key=lambda r: r.rk)
    assert [r.doc_id for r in got] == [d for d, _ in top]
    for r, (_, s) in zip(got, top):
        assert abs(r.bm25 - s) < TOL


# -------------------------------------------------------------- q161
def test_q161_wilson_vs_python(spark):
    from spatial_data_engineering_spark.operators.relational import (
        q161_wilson_proportion)

    o = pd.read_parquet(f"{SF_ORACLE}/orders.parquet",
                        columns=["o_orderpriority", "o_orderstatus"])
    z = 1.96
    got = {r.o_orderpriority: r
           for r in q161_wilson_proportion(spark, SF_ORACLE).collect()}
    for pri, g in o.groupby("o_orderpriority"):
        n = len(g)
        nf = int((g.o_orderstatus == "F").sum())
        p = nf / n
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
        centre = p + z * z / (2 * n)
        denom = 1 + z * z / n
        r = got[pri]
        assert (r.n, r.n_f) == (n, nf)
        assert abs(r.p - p) < TOL
        assert abs(r.wilson_lo - (centre - half) / denom) < TOL
        assert abs(r.wilson_hi - (centre + half) / denom) < TOL
        assert r.wilson_lo <= r.p <= r.wilson_hi


# -------------------------------------------------------------- q170
def test_q170_burst_vs_python(spark):
    from spatial_data_engineering_spark.operators.analytics import (
        q170_burst_detection)

    e = pd.read_parquet(f"{SF_ORACLE}/events.parquet",
                        columns=["event_type", "ts"])
    e["minute"] = pd.to_datetime(e.ts).dt.floor("min")
    got = {r.event_type: r
           for r in q170_burst_detection(spark, SF_ORACLE).collect()}
    for et, g in e.groupby("event_type"):
        counts = g.groupby("minute").size().to_numpy(dtype=float)
        mu = counts.mean()
        sigma = counts.std(ddof=1)
        burst = counts > mu + 3 * sigma
        r = got[et]
        assert r.n_minutes == len(counts)
        assert r.n_burst_minutes == int(burst.sum())
        if burst.any():
            assert r.peak_burst_count == int(counts[burst].max())
        else:
            assert r.peak_burst_count is None
        assert abs(r.mu - mu) < TOL
        assert abs(r.sigma - sigma) < TOL


# -------------------------------------------------------------- q174
def test_q174_gini_vs_numpy(spark):
    from spatial_data_engineering_spark.operators.analytics import (
        q174_value_gini)

    e = pd.read_parquet(f"{SF_ORACLE}/events.parquet",
                        columns=["user_id", "value"])
    uv = e.groupby("user_id")["value"].sum().reset_index()
    uv = uv.sort_values(["value", "user_id"]).reset_index(drop=True)
    v = uv.value.to_numpy(dtype=float)
    i = np.arange(1, len(v) + 1, dtype=float)
    gini = 2.0 * (i * v).sum() / (len(v) * v.sum()) - (len(v) + 1.0) / len(v)
    got = q174_value_gini(spark, SF_ORACLE).collect()[0]
    assert got.n_users == len(v)
    assert abs(got.gini - gini) < TOL
    assert 0.0 <= got.gini <= 1.0


# -------------------------------------------------------------- q176
def test_q176_normalization_vs_numpy(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q176_score_normalization)

    def quality(row):
        toks = row["text"].split(" ")
        nstop = sum(t in ("the", "a", "of", "and", "to", "in") for t in toks)
        return round(0.25 * min(len(row["text"]) / 400.0, 1.0)
                     + 0.25 * min(nstop * 4.0 / len(toks), 1.0)
                     + 0.50 * (len(set(toks)) / len(toks)), 6)

    d = docs.copy()
    d["quality"] = d.apply(quality, axis=1)
    got = {r.source: r
           for r in q176_score_normalization(spark, SF_ORACLE).collect()}
    for src, g in d.groupby("source"):
        q = g.quality.to_numpy()
        r = got[src]
        assert r.n_docs == len(q)
        assert abs(r.raw_p50 - np.percentile(q, 50)) < TOL
        assert abs(r.raw_p90 - np.percentile(q, 90)) < TOL
        assert abs(r.raw_min - q.min()) < TOL
        assert abs(r.raw_max - q.max()) < TOL
