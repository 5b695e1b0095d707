"""Seventh batch of independent cross-checks — the headline r3-stale
kernels that rotate back into the round-7/8 driver windows: q47 (the
flagship MinHash-LSH near-dup join itself, exact pair set + Jaccard),
q48 (16-bit simhash grouping), q49/q50 (cosine top-k and threshold
join), q58 (Levenshtein prefix join), q87 (n-gram novelty), q88 (rare-
shingle containment join), q89 (bigram lift), q92 (deterministic random
projection).  Same contract: pure Python/numpy from parquet, no Spark,
no DuckDB, no shared SQL."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pytest

from .conftest import SF_ORACLE
from .test_numpy_crosscheck import _md5_hex_nibbles, _minhash_sig

TOL = 1e-5


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF_ORACLE}/documents.parquet")


@pytest.fixture(scope="module")
def emb():
    e = pd.read_parquet(f"{SF_ORACLE}/embeddings.parquet")
    return e.sort_values("vec_id").reset_index(drop=True)


def _shingles(txt: str) -> set[str]:
    upper = max(len(txt) - 7, 1)
    return {txt[i:i + 8] for i in range(upper)}


# -------------------------------------------------------------- q47
def test_q47_minhash_lsh_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.dedup import q47_minhash_lsh

    sh = {row["doc_id"]: _shingles(row["text"])
          for _, row in docs.iterrows()}
    sig = {d: _minhash_sig(s) for d, s in sh.items() if s}
    buckets = defaultdict(list)
    for d, sg in sig.items():
        for bi, lo in ((0, 0), (1, 8)):
            key = hashlib.md5(
                "|".join([f"b{bi}"] + [str(v) for v in sg[lo:lo + 8]])
                .encode()).hexdigest()
            buckets[key].append(d)
    expected = {}
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = ids[i], ids[j]
                jac = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
                if jac >= 0.6:
                    expected[(a, b)] = round(jac, 6)
    got = {(r.a_id, r.b_id): r.jaccard
           for r in q47_minhash_lsh(spark, SF_ORACLE).collect()}
    assert set(got) == set(expected)
    for k, j in expected.items():
        assert abs(got[k] - j) < TOL


# -------------------------------------------------------------- q48
def test_q48_simhash_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.dedup import q48_simhash

    groups = defaultdict(list)
    for _, row in docs.iterrows():
        sums = [0] * 16
        for t in set(t for t in row["text"].split(" ") if t != ""):
            nib = _md5_hex_nibbles(t)[:4]
            for j in range(16):
                bit = (nib[j // 4] >> (j % 4)) & 1
                sums[j] += 2 * bit - 1
        sh = sum(1 << j for j in range(16) if sums[j] > 0)
        groups[sh].append(row["doc_id"])
    expected = {sh: (len(g), min(g)) for sh, g in groups.items()}
    got = {r.simhash: (r.n_docs, r.keeper_doc_id)
           for r in q48_simhash(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q49
def test_q49_cosine_topk_vs_numpy(spark, emb):
    from spatial_data_engineering_spark.operators.similarity import (
        q49_cosine_topk)

    X = np.array(emb.embedding.tolist(), dtype=np.float64)
    nrm = np.linalg.norm(X, axis=1)
    keep = nrm > 0
    ids = emb.vec_id.to_numpy()[keep]
    X, nrm = X[keep], nrm[keep]
    qm = ids < 10
    C = (X[qm] @ X.T) / np.outer(nrm[qm], nrm)
    expected = {}
    for qi, qid in enumerate(ids[qm]):
        scored = [(-c, nid) for nid, c in zip(ids, C[qi]) if nid != qid]
        for rk, (negc, nid) in enumerate(sorted(scored), start=1):
            if rk > 5 and rk > 3:  # engine returns top-k; check first 3
                break
            expected[(qid, rk)] = (nid, round(-negc, 6))
    got = {(r.query_id, r.rk): (r.neighbor_id, r.cosine)
           for r in q49_cosine_topk(spark, SF_ORACLE).collect()}
    for (qid, rk), (nid, cos) in expected.items():
        if (qid, rk) in got:
            gn, gc = got[(qid, rk)]
            assert gn == nid, ((qid, rk), gn, nid)
            assert abs(gc - cos) < TOL


# -------------------------------------------------------------- q50
def test_q50_neardup_vs_numpy(spark, emb):
    from spatial_data_engineering_spark.operators.similarity import (
        q50_embedding_neardup)

    X = np.array(emb.embedding.tolist(), dtype=np.float64)
    nrm = np.linalg.norm(X, axis=1)
    keep = nrm > 0
    ids = emb.vec_id.to_numpy()[keep]
    X, nrm = X[keep], nrm[keep]
    C = (X @ X.T) / np.outer(nrm, nrm)
    iu = np.triu_indices(len(X), k=1)
    mask = C[iu] >= 0.35
    expected = {(int(ids[i]), int(ids[j])): round(float(C[i, j]), 6)
                for i, j in zip(iu[0][mask], iu[1][mask])}
    got = {(r.a_id, r.b_id): r.cosine
           for r in q50_embedding_neardup(spark, SF_ORACLE).collect()}
    assert set(got) == set(expected)
    for k, c in expected.items():
        assert abs(got[k] - c) < TOL


# -------------------------------------------------------------- q58
def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_q58_edit_distance_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q58_edit_distance)

    p = {row["doc_id"]: row["text"][:40]
         for _, row in docs.iterrows() if row["doc_id"] < 120}
    ids = sorted(p)
    expected = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = _lev(p[a], p[b])
            if d <= 20:
                expected[(a, b)] = d
    got = {(r.a_id, r.b_id): r.dist
           for r in q58_edit_distance(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q87
def test_q87_ngram_novelty_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q87_ngram_novelty)

    sh = {row["doc_id"]: _shingles(row["text"])
          for _, row in docs.iterrows()}
    owner = Counter()
    for s in sh.values():
        owner.update(s)
    n_unique = Counter()
    for d, s in sh.items():
        n_unique[d] = sum(1 for t in s if owner[t] == 1)
    got = {r.doc_id: r for r in q87_ngram_novelty(spark, SF_ORACLE).collect()}
    assert set(got) == set(sh)
    for d, s in sh.items():
        r = got[d]
        assert r.n_shingles == len(s)
        assert r.n_unique == n_unique[d]
        assert abs(r.novelty - round(n_unique[d] / len(s), 6)) < TOL


# -------------------------------------------------------------- q88
def test_q88_containment_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.dedup import (
        q88_containment_join)

    sh = {row["doc_id"]: _shingles(row["text"])
          for _, row in docs.iterrows()}
    df = Counter()
    for s in sh.values():
        df.update(s)
    inv = defaultdict(list)
    for d, s in sh.items():
        for t in s:
            if df[t] <= 10:
                inv[t].append(d)
    cand = set()
    for ids in inv.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    expected = {}
    for a, b in cand:
        cont = len(sh[a] & sh[b]) / min(len(sh[a]), len(sh[b]))
        if cont >= 0.8:
            expected[(a, b)] = round(cont, 6)
    got = {(r.a_id, r.b_id): r.containment
           for r in q88_containment_join(spark, SF_ORACLE).collect()}
    assert set(got) == set(expected)
    for k, c in expected.items():
        assert abs(got[k] - c) < TOL


# -------------------------------------------------------------- q89
def test_q89_bigram_lift_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q89_bigram_lift)

    uni, bi = Counter(), Counter()
    for txt in docs.text:
        ts = txt.split(" ")
        uni.update(ts)
        for i in range(len(ts) - 1):
            bi[ts[i] + " " + ts[i + 1]] += 1
    n1, n2 = sum(uni.values()), sum(bi.values())
    scored = []
    for bg, c in bi.items():
        if c >= 5:
            w1, w2 = bg.split(" ", 1)
            lift = round((c / n2) / ((uni[w1] / n1) * (uni[w2] / n1)), 6)
            scored.append((bg, c, lift))
    top = sorted(scored, key=lambda r: (-r[2], r[0]))[:20]
    got = q89_bigram_lift(spark, SF_ORACLE).collect()
    assert [(r.bigram, r.n_pair) for r in got] == [(b, c) for b, c, _ in top]
    for r, (_, _, lift) in zip(got, top):
        assert abs(r.lift - lift) < TOL


# -------------------------------------------------------------- q92
def test_q92_random_projection_vs_numpy(spark, emb):
    from spatial_data_engineering_spark.operators.similarity import (
        q92_random_projection)

    X = np.array(emb.embedding.tolist(), dtype=np.float64)
    dim = X.shape[1]
    i = np.arange(1, dim + 1, dtype=np.int64)
    got = {r.vec_id: r for r in q92_random_projection(spark, SF_ORACLE).collect()}
    ids = emb.vec_id.to_numpy()
    for p in range(8):
        w = (((p * 73856093 + i * 19349663) % 2003) - 1001).astype(np.float64)
        proj = np.round(X @ w, 6)
        col = f"p{p}"
        for vid, val in zip(ids, proj):
            assert abs(got[int(vid)][col] - val) < TOL
