"""Eighteenth batch of independent cross-checks — sketches, hash
sampling, sessionization, quality tiers, multimodal fakes and the BLAS
covariance, none third-way-checked before: q113 count-min heavy
hitters, q114/q119 KMV sketches, q73 hash split, q102 bottom-k sample,
q44 quality tiers, q80 quality filter, q18 sessionization, q97 funnel,
q129 Hamming top-k, q69 embedding quantization, q70/q71 multimodal
decode fakes, q93 embedding covariance.  Same contract: pure
Python/numpy from parquet, no Spark, no DuckDB, no shared SQL.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pytest

from .conftest import SF_ORACLE
from .test_numpy_crosscheck import _md5_bucket, _quality, _toks

TOL = 1e-5
_P = 2_147_483_647


def _close(a, b):
    return abs(a - b) <= max(abs(b) * 1e-9, TOL)


def _fold(s: str) -> int:
    """int(md5[:8], 16) % (2^31-1) — the shared token-hash fold."""
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % _P


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF_ORACLE}/documents.parquet")


@pytest.fixture(scope="module")
def emb():
    e = pd.read_parquet(f"{SF_ORACLE}/embeddings.parquet")
    return e.sort_values("vec_id").reset_index(drop=True)


@pytest.fixture(scope="module")
def events():
    e = pd.read_parquet(f"{SF_ORACLE}/events.parquet")
    e["ts"] = pd.to_datetime(e.ts)
    return e


# -------------------------------------------------------------- q113
def test_q113_cms_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.sketches import (
        q113_cms_heavy_hitters)

    A = (131071, 524287, 2147483647 - 19, 6700417)
    B = (12582917, 402653189, 786433, 98317)
    tf = Counter(t for txt in docs.text for t in _toks(txt))
    sketch = [Counter() for _ in range(4)]
    pos = {}
    for t, n in tf.items():
        h = _fold(t)
        pos[t] = [((A[i] * h + B[i]) % _P) % 1024 for i in range(4)]
        for i in range(4):
            sketch[i][pos[t][i]] += n
    est = {t: min(sketch[i][pos[t][i]] for i in range(4)) for t in tf}
    top = sorted(est, key=lambda t: (-est[t], t))[:20]
    expected = {t: (est[t], tf[t], est[t] - tf[t]) for t in top}
    got = {r.term: (r.est_count, r.exact_count, r.overestimate)
           for r in q113_cms_heavy_hitters(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q114
def test_q114_kmv_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.sketches import (
        q114_kmv_distinct)

    vocab = sorted({t for txt in docs.text for t in _toks(txt)})
    rows = q114_kmv_distinct(spark, SF_ORACLE).collect()
    if len(vocab) < 64:
        # fewer distinct tokens than the sketch size: the kth-min-hash
        # row does not exist, so the estimator is empty BY DESIGN (the
        # oracle is empty too) — pin that degenerate contract here
        assert rows == []
        return
    ranked = sorted(vocab, key=lambda t: (_fold(t), t))
    hk = _fold(ranked[63])  # k = 64, 1-indexed kth
    (row,) = rows
    assert row.kth_min_hash == hk
    assert _close(row.est_distinct, round(63 * (_P + 1) / hk, 6))
    assert row.exact_distinct == len(vocab)


# -------------------------------------------------------------- q119
def test_q119_kmv_setops_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.sketches import (
        q119_kmv_setops)

    side_vocab = {0: set(), 1: set()}
    for _, r in docs.iterrows():
        side_vocab[r.doc_id % 2].update(_toks(r.text))
    key = lambda t: (_fold(t), t)  # noqa: E731
    ska = set(sorted(side_vocab[0], key=key)[:64])
    skb = set(sorted(side_vocab[1], key=key)[:64])
    bot = sorted(ska | skb, key=key)[:64]
    hk = max(_fold(t) for t in bot)
    n_both = sum(t in ska and t in skb for t in bot)
    inter = side_vocab[0] & side_vocab[1]
    union = side_vocab[0] | side_vocab[1]
    row = q119_kmv_setops(spark, SF_ORACLE).collect()[0]
    assert row.k_in_both == n_both
    assert _close(row.est_jaccard, round(n_both / 64, 6))
    assert _close(row.est_intersection,
                  round((n_both / 64) * (63 * (_P + 1) / hk), 6))
    assert _close(row.true_jaccard, round(len(inter) / len(union), 6))
    assert row.true_intersection == len(inter)


# -------------------------------------------------------------- q73
def test_q73_hash_split_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import q73_hash_split

    def split(d):
        b = _md5_bucket(d)
        return "train" if b < 80 else ("val" if b < 90 else "test")

    grp = defaultdict(list)
    for _, r in docs.iterrows():
        grp[(split(r.doc_id), r.lang)].append(r.n_chars)
    got = {(r.split, r.lang): (r.n_docs, r.avg_chars)
           for r in q73_hash_split(spark, SF_ORACLE).collect()}
    assert set(got) == set(grp)
    for k, chars in grp.items():
        assert got[k][0] == len(chars)
        assert _close(got[k][1], sum(chars) / len(chars))


# -------------------------------------------------------------- q102
def test_q102_bottomk_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.analytics import (
        q102_bottomk_sample)

    expected = set()
    for src, grp in docs.groupby("source"):
        ids = sorted(grp.doc_id,
                     key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(),
                                    d))
        expected |= {(src, d) for d in ids[:4]}
    got = {(r.source, r.doc_id)
           for r in q102_bottomk_sample(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q44
def test_q44_quality_tiers_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q44_quality_score)

    tiers = defaultdict(list)
    for _, r in docs.iterrows():
        q = _quality(r)
        tiers["keep" if q > 0.6 else "review" if q > 0.4 else "drop"].append(q)
    got = {r.tier: r for r in q44_quality_score(spark, SF_ORACLE).collect()}
    assert set(got) == set(tiers)
    for t, qs in tiers.items():
        assert got[t].n_docs == len(qs)
        assert _close(got[t].min_q, round(min(qs), 6))
        assert _close(got[t].max_q, round(max(qs), 6))


# -------------------------------------------------------------- q80
def test_q80_quality_filter_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q80_quality_filter)

    by_lang = defaultdict(dict)
    for _, r in docs.iterrows():
        by_lang[r.lang][r.doc_id] = _quality(r)
    got = {r.doc_id: r for r in q80_quality_filter(spark, SF_ORACLE).collect()}
    n_expected = 0
    for lang, qs in by_lang.items():
        thr = np.percentile(list(qs.values()), 25, method="linear")
        for d, q in qs.items():
            if q >= thr:
                n_expected += 1
                assert d in got, (lang, d)
                assert _close(got[d].quality, q)
                assert _close(got[d].p25, round(thr, 6))
    assert len(got) == n_expected


# -------------------------------------------------------------- q18
def test_q18_sessionization_vs_python(spark, events):
    from spatial_data_engineering_spark.operators.relational import (
        q18_sessionization)

    expected = {}
    for uid, grp in events.groupby("user_id"):
        g = grp.sort_values(["ts", "event_id"])
        us = g.ts.astype("datetime64[us]").astype("int64").to_numpy()
        n = 1 + int((np.diff(us) > 1_800_000_000).sum())
        expected[uid] = n
    got = {r.user_id: r.n_sessions
           for r in q18_sessionization(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q97
def test_q97_funnel_vs_python(spark, events):
    from spatial_data_engineering_spark.operators.analytics import q97_funnel

    v, c, p = {}, {}, {}
    for uid, grp in events[events.event_type == "view"].groupby("user_id"):
        v[uid] = grp.ts.min()
    for uid, grp in events[events.event_type == "click"].groupby("user_id"):
        if uid in v:
            after = grp.ts[grp.ts >= v[uid]]
            if len(after):
                c[uid] = after.min()
    for uid, grp in events[events.event_type == "purchase"].groupby("user_id"):
        if uid in c:
            after = grp.ts[grp.ts >= c[uid]]
            if len(after):
                p[uid] = after.min()
    row = q97_funnel(spark, SF_ORACLE).collect()[0]
    assert (row.n_view, row.n_click, row.n_purchase) == (len(v), len(c), len(p))


# -------------------------------------------------------------- q129
def test_q129_hamming_topk_vs_python(spark, emb):
    from spatial_data_engineering_spark.operators.similarity import (
        q129_hamming_topk)

    codes = {}
    for _, r in emb.iterrows():
        code = 0
        for i in range(63):
            if r.embedding[i] > 0:
                code |= 1 << i
        codes[int(r.vec_id)] = code
    expected = {}
    for q in [d for d in codes if d < 10]:
        scored = sorted(
            ((bin(codes[q] ^ codes[d]).count("1"), d)
             for d in codes if d != q))
        for rk, (h, d) in enumerate(scored[:3], start=1):
            expected[(q, rk)] = (d, h)
    got = {(r.query_id, r.rk): (r.neighbor_id, r.hamming)
           for r in q129_hamming_topk(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q69
def test_q69_quantize_vs_python(spark, emb):
    from spatial_data_engineering_spark.operators.similarity import (
        q69_embedding_quantize)

    def spark_round(x):  # HALF_UP (away from zero), not banker's
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    expected = {}
    for _, r in emb.iterrows():
        v = [float(x) for x in r.embedding]
        scale = max(abs(x) for x in v)
        if scale <= 0:
            continue
        qv = [spark_round(x * 127.0 / scale) for x in v]
        expected[int(r.vec_id)] = (sum(qv), min(qv), max(qv), len(qv))
    got = {r.vec_id: (r.sum_q, r.min_q, r.max_q, r.n_dims)
           for r in q69_embedding_quantize(spark, SF_ORACLE).collect()}
    assert len(got) == len(expected)
    for d, e in expected.items():
        assert _close(got[d][0], e[0]) and got[d][1:] == e[1:], (d, got[d], e)


# -------------------------------------------------------------- q70
def test_q70_multimodal_meta_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.multimodal import (
        q70_multimodal_meta)

    grp = defaultdict(list)
    for _, r in docs.iterrows():
        n = len(r.text.encode())
        grp[r.source].append((n, n % 640 + 16, (n * 7) % 480 + 16,
                              n % 30 + 1))
    got = {r.source: r for r in q70_multimodal_meta(spark, SF_ORACLE).collect()}
    assert set(got) == set(grp)
    for src, rows in grp.items():
        r = got[src]
        assert r.n_assets == len(rows)
        assert r.total_bytes == sum(x[0] for x in rows)
        assert _close(r.avg_width, sum(x[1] for x in rows) / len(rows))
        assert _close(r.avg_height, sum(x[2] for x in rows) / len(rows))
        assert r.max_frames == max(x[3] for x in rows)


# -------------------------------------------------------------- q71
def test_q71_frame_sample_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.multimodal import (
        q71_frame_sample)

    expected = {}
    for _, r in docs.iterrows():
        n = len(r.text.encode())
        w, h = n % 640 + 16, (n * 7) % 480 + 16
        for fi in range(0, n % 30 + 1, 5):
            rw, rh = (224, h * 224 // w) if w >= h else (w * 224 // h, 224)
            expected[(r.doc_id, fi)] = ((n * 131 + fi * 17) % 1000003, rw, rh)
    got = {(r.doc_id, r.frame_idx): (r.frame_checksum, r.resized_w,
                                     r.resized_h)
           for r in q71_frame_sample(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q93
def test_q93_covariance_vs_numpy(spark, emb):
    from spatial_data_engineering_spark.operators.similarity import (
        q93_embedding_covariance)

    X = np.array(emb.embedding.tolist(), dtype=np.float64)
    n = len(X)
    C = np.cov(X, rowvar=False, ddof=1)
    got = {(r.i, r.j): r.cov
           for r in q93_embedding_covariance(spark, SF_ORACLE).collect()}
    assert len(got) == 64 * 65 // 2
    for (i, j), v in got.items():
        assert _close(v, round(C[i - 1, j - 1], 6)), (i, j, v, C[i - 1, j - 1])
