"""Pure-Python replay of q111's round-14 full PQ oracle — the third-way
check (no Spark expressions, no DuckDB SQL): per-subspace Lloyd training
with Decimal-exact means and explicit SEQUENTIAL left-fold distances
(independent of numpy's reduction internals, so this also validates the
"numpy sums <8 elements sequentially" assumption both engines ride),
then encode + ADC + rank, compared EXACTLY (float bits, not tolerance)
against the registered query's output rows.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
import pytest

from .conftest import SF_ORACLE


def _fr6(x):
    return np.floor(np.asarray(x, dtype=np.float64) * 1000000.0
                    + 0.5) / 1000000.0


def _seq_d2(xs, cent):
    """(n, k) squared distances as an explicit sequential fold over the
    sub-dimension axis: acc = t0; acc += t1; ... — a true left fold in
    float64, NOT np.sum (whose reduction order is numpy-private)."""
    acc = (xs[:, None, 0] - cent[None, :, 0]) ** 2
    for p in range(1, xs.shape[1]):
        acc = acc + (xs[:, None, p] - cent[None, :, p]) ** 2
    return acc


def test_q111_pq_adc_vs_python(spark):
    from spatial_data_engineering_spark.operators.similarity import (
        _PQ_KSTAR, _PQ_M, _PQ_TRAIN_N, q111_pq_adc_topk)

    M, KSTAR, N_TRAIN, ITERS, N_QUERY, K = (_PQ_M, _PQ_KSTAR, _PQ_TRAIN_N,
                                            10, 10, 3)
    emb = pd.read_parquet(SF_ORACLE + "/embeddings.parquet")
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    ids = emb["vec_id"].to_numpy()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    dim = mat.shape[1]
    sub = dim // M

    # ---- training: first N_TRAIN vectors by vec_id, Decimal-exact means
    x = mat[:N_TRAIN]
    # precompute the decimal(30,10) quantization of every training value
    # ONCE (raw values never change between iterations) as scaled ints
    q10 = Decimal("1e-10")
    xq = np.array([[int(Decimal(float(v)).quantize(q10, ROUND_HALF_UP)
                        .scaleb(10)) for v in row] for row in x],
                  dtype=object)

    def dec_mean_int(member_rows, col):
        s = int(sum(xq[i, col] for i in member_rows))
        return float(Decimal(s).scaleb(-10)) / len(member_rows)

    books = np.empty((M, KSTAR, sub))
    for s in range(M):
        lo = s * sub
        xs = x[:, lo:lo + sub]
        cent = xs[:KSTAR].copy()
        for _ in range(ITERS):
            assign = np.argmin(_fr6(_seq_d2(xs, cent)), axis=1)
            for c in range(KSTAR):
                members = np.where(assign == c)[0]
                if len(members):
                    cent[c] = [dec_mean_int(members, lo + p)
                               for p in range(sub)]
        books[s] = cent

    # ---- encode the whole corpus (fround6-argmin per subspace)
    codes = np.empty((len(mat), M), dtype=np.int64)
    for s in range(M):
        xs = mat[:, s * sub:(s + 1) * sub]
        codes[:, s] = np.argmin(_fr6(_seq_d2(xs, books[s])), axis=1)

    # ---- per-query ADC tables (RAW sequential-fold d2) + scan
    qpos = np.where(ids < N_QUERY)[0]
    expected = []
    for qp in qpos:
        qid = int(ids[qp])
        tab = np.empty((M, KSTAR))
        for s in range(M):
            tab[s] = _seq_d2(mat[qp:qp + 1, s * sub:(s + 1) * sub],
                             books[s])[0]
        # accumulate the M gathers in subspace order starting from 0.0 —
        # the operator's loop and the oracle's ordered list_reduce
        adc = np.zeros(len(mat))
        for s in range(M):
            adc = adc + tab[s, codes[:, s]]
        keep = ids != qid
        cand_ids, cand_d = ids[keep], adc[keep]
        order = np.lexsort((cand_ids, cand_d))[:K]
        for rk, j in enumerate(order, 1):
            expected.append((qid, int(cand_ids[j]), rk,
                             float(_fr6(cand_d[j]))))

    got = sorted((r.query_id, r.neighbor_id, r.rk, r.adc_dist)
                 for r in q111_pq_adc_topk(spark, SF_ORACLE).collect())
    assert got == sorted(expected)


def _close(a, b, tol=2e-6):
    if a is None or b is None:
        return a is None and b is None
    return abs(a - b) <= tol


# -------------------------------------------------------------- q222
def test_q222_bigram_lm_buckets_vs_python(spark):
    """q222's oracle shares sql_spark_pct/sql_fround6 and the tokenize/
    smoothing constants with the Spark side — replay the whole CCNet
    pipeline from scratch: Counter-based bigram LM, math.log scoring,
    Spark's exact-percentile formula (pos = p*(n-1), lo/hi
    short-circuit) for the per-lang tertile thresholds."""
    import math
    from collections import Counter, defaultdict

    from spatial_data_engineering_spark.operators.textops import (
        _BLM_REF_LANG, q222_bigram_lm_buckets)

    docs = pd.read_parquet(SF_ORACLE + "/documents.parquet")
    toks = {int(r["doc_id"]): (r["lang"],
                               [t for t in r["text"].split(" ") if t])
            for _, r in docs.iterrows()}
    c2, c1, vocab = Counter(), Counter(), set()
    for _, (lang, ts) in toks.items():
        if lang == _BLM_REF_LANG:
            vocab.update(ts)
            for i in range(len(ts) - 1):
                c2[(ts[i], ts[i + 1])] += 1
                c1[ts[i]] += 1
    v = len(vocab)
    nll = {}
    for d, (lang, ts) in toks.items():
        if len(ts) < 2:
            continue
        terms = [round(-math.log((c2.get((ts[i], ts[i + 1]), 0) + 1.0)
                                 / (c1.get(ts[i], 0) + v)), 9)
                 for i in range(len(ts) - 1)]
        # decimal-exact sum of 9dp-rounded terms == exact float math on
        # scaled ints
        s = sum(int(round(t * 1e9)) for t in terms)
        nll[d] = (lang, (s / 1e9) / len(terms))

    def spark_pct(vals, p):
        vs = sorted(vals)
        pos = p * (len(vs) - 1)
        lo, hi = vs[math.floor(pos)], vs[math.ceil(pos)]
        if lo == hi:
            return lo
        return (math.ceil(pos) - pos) * lo + (pos - math.floor(pos)) * hi

    per_lang = defaultdict(list)
    for d, (lang, w) in nll.items():
        per_lang[lang].append(w)
    expected = defaultdict(lambda: [0, [], float("-inf")])
    for d, (lang, w) in nll.items():
        t1 = spark_pct(per_lang[lang], 1 / 3)
        t2 = spark_pct(per_lang[lang], 2 / 3)
        b = "head" if w <= t1 else ("middle" if w <= t2 else "tail")
        e = expected[(lang, b)]
        e[0] += 1
        e[1].append(w)
        e[2] = max(e[2], w)

    got = {(r.lang, r.bucket): r for r in
           q222_bigram_lm_buckets(spark, SF_ORACLE).collect()}
    assert set(got) == set(expected)
    for key, (n, ws, mx) in expected.items():
        assert got[key].n_docs == n
        assert _close(got[key].avg_nll, sum(ws) / len(ws))
        assert _close(got[key].max_nll, mx)
    # the buckets must be real tertiles: per lang, no bucket may hold
    # more than half the lang's docs (head/middle/tail ~ n/3 each)
    for lang, ws in per_lang.items():
        for b in ("head", "middle", "tail"):
            assert expected[(lang, b)][0] <= len(ws) / 2 + 1


# -------------------------------------------------------------- q223
def test_q223_cluster_silhouette_vs_python(spark):
    """q223's oracle replays the q55 Lloyd chain (shared _lloyd_parts
    builder) plus shared fold/fround6 fragments — triangulate the whole
    thing: from-scratch numpy Lloyd (Decimal-exact means), sequential-
    fold distances, simplified silhouette."""
    from spatial_data_engineering_spark.operators.clustering import \
        q223_cluster_silhouette

    K, ITERS = 8, 5
    emb = pd.read_parquet(SF_ORACLE + "/embeddings.parquet")
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)

    q10 = Decimal("1e-10")

    def dec_mean(vals):
        s = sum((Decimal(float(x)).quantize(q10, ROUND_HALF_UP)
                 for x in vals), Decimal(0))
        return float(s) / len(vals)

    def d2_fold(m, cent):
        out = np.empty((len(m), len(cent)))
        for c in range(len(cent)):
            acc = (m[:, 0] - cent[c, 0]) ** 2
            for p in range(1, m.shape[1]):
                acc = acc + (m[:, p] - cent[c, p]) ** 2
            out[:, c] = acc
        return out

    cent = mat[:K].copy()
    for _ in range(ITERS):
        cl = np.argmin(_fr6(d2_fold(mat, cent)), axis=1)
        new = cent.copy()
        for c in range(K):
            members = np.where(cl == c)[0]
            if len(members):
                for p in range(mat.shape[1]):
                    new[c, p] = dec_mean(mat[members, p])
        cent = new
    d2 = d2_fold(mat, cent)
    cl = np.argmin(_fr6(d2), axis=1)
    dist = np.sqrt(d2)
    rows = np.arange(len(mat))
    a = dist[rows, cl]
    masked = dist.copy()
    masked[rows, cl] = np.inf
    b = masked.min(axis=1)
    hi = np.maximum(a, b)
    s = np.where(hi == 0.0, 0.0,
                 (b - a) / np.where(hi == 0.0, 1.0, hi))

    expected = {}
    for c in range(K):
        members = np.where(cl == c)[0]
        if len(members):
            sv = s[members]
            expected[c] = (len(members), float(sv.mean()),
                           float(sv.min()))
    got = {r.cluster: r for r in
           q223_cluster_silhouette(spark, SF_ORACLE).collect()}
    assert set(got) == set(expected)
    for c, (n, avg, mn) in expected.items():
        assert got[c].n_vectors == n
        assert _close(got[c].avg_silhouette, avg)
        assert _close(got[c].min_silhouette, mn)
