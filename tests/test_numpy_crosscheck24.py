"""Pure-Python replay of the round-12 additions (q216/q217) — the
third-way check (no Spark expressions, no DuckDB SQL): the DSIR
log-likelihood-ratio selection with math.log + Counter, and the
per-domain quota with plain sorted groupbys over the same URL/PSL
replay helpers crosscheck23 uses for q214.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pandas as pd
import pytest

from .conftest import SF_ORACLE
from .test_numpy_crosscheck23 import _reg_domain, _url


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(SF_ORACLE + "/documents.parquet")


def _close(a, b, tol=2e-6):
    if a is None or b is None:
        return a is None and b is None  # one-sided None is a mismatch
    return abs(a - b) <= tol


def _tokens(text: str) -> list[str]:
    return [t for t in text.split(" ") if t != ""]


# -------------------------------------------------------------- q216
def test_q216_dsir_importance_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        _DSIR_N, _DSIR_TARGET_LANG, q216_dsir_importance)

    src, tgt = Counter(), Counter()
    doc_toks = {}
    for _, r in docs.iterrows():
        toks = _tokens(r["text"])
        doc_toks[int(r["doc_id"])] = (r["lang"], toks)
        src.update(toks)
        if r["lang"] == _DSIR_TARGET_LANG:
            tgt.update(toks)
    ts, tt, v = sum(src.values()), sum(tgt.values()), len(src)
    lr = {t: round(math.log(((tgt.get(t, 0) + 1.0) / (tt + v))
                            / ((n + 1.0) / (ts + v))), 9)
          for t, n in src.items()}
    weights = {d: (lang, sum(lr[t] for t in toks))
               for d, (lang, toks) in doc_toks.items()}
    ranked = sorted(weights.items(), key=lambda kv: (-kv[1][1], kv[0]))
    sel = ranked[:_DSIR_N]
    per = defaultdict(list)
    for _, (lang, w) in sel:
        per[lang].append(w)
    got = {r.lang: r for r in
           q216_dsir_importance(spark, SF_ORACLE).collect()}
    assert set(got) == set(per)
    assert sum(r.n_selected for r in got.values()) == _DSIR_N
    for lang, ws in per.items():
        assert got[lang].n_selected == len(ws)
        assert _close(got[lang].avg_weight, sum(ws) / len(ws))
        assert _close(got[lang].min_weight, min(ws))
    # the selection must actually favor the target domain: the target
    # language's share among selected docs exceeds its corpus share
    n_tgt_corpus = sum(1 for lang, _ in doc_toks.values()
                       if lang == _DSIR_TARGET_LANG)
    assert (len(per.get(_DSIR_TARGET_LANG, [])) / _DSIR_N
            > n_tgt_corpus / len(doc_toks))


# -------------------------------------------------------------- q217
def _quality(r) -> float:
    toks = r["text"].split(" ")
    n, nt = len(r["text"]), len(toks)
    ndt = len(set(toks))
    stop = {"the", "a", "of", "and", "to", "in"}
    nstop = sum(1 for t in toks if t in stop)
    raw = (0.25 * min(n / 400.0, 1.0) + 0.25 * min(nstop * 4.0 / nt, 1.0)
           + 0.50 * (ndt * 1.0 / nt))
    return math.floor(raw * 1000000.0 + 0.5) / 1000000.0


def test_q217_domain_quota_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        _DOMAIN_QUOTA, q217_domain_quota_sample)

    per = defaultdict(list)  # domain -> [(quality, doc_id)]
    for _, r in docs.iterrows():
        doc_id = int(r["doc_id"])
        host = re.match(r"^[a-z]+://(?:[^@/]*@)?([^/:]+)",
                        _url(doc_id)).group(1)
        dom = _reg_domain(host) or "(none)"
        per[dom].append((_quality(r), doc_id))
    got = {r.registered_domain: r for r in
           q217_domain_quota_sample(spark, SF_ORACLE).collect()}
    assert set(got) == set(per)
    for dom, rows in per.items():
        rows.sort(key=lambda qd: (-qd[0], qd[1]))
        kept = rows[:_DOMAIN_QUOTA]
        g = got[dom]
        assert g.n_docs == len(rows)
        assert g.n_kept == len(kept)
        assert g.n_dropped == len(rows) - len(kept)
        assert _close(g.avg_kept_quality,
                      sum(q for q, _ in kept) / len(kept))


# -------------------------------------------------------------- q52
def test_q52_ivf_output_vs_python(spark):
    """The q52 IVF oracle is NEW in r12 (full algorithm replay in SQL)
    — triangulate it: a third from-scratch IVF implementation (flat
    numpy, no mapInPandas pipeline, no SQL) must reproduce the
    registered query's exact output rows."""
    import numpy as np

    from spatial_data_engineering_spark.operators.similarity import (
        _IVF_N_CENTROIDS, _IVF_NPROBE, q52_ivf_ann)

    emb = pd.read_parquet(SF_ORACLE + "/embeddings.parquet")
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    ids = emb["vec_id"].to_numpy()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    nrm = np.linalg.norm(mat, axis=1)
    keep = nrm > 0
    ids, mat, nrm = ids[keep], mat[keep], nrm[keep]

    def fr6(x):  # the fround6 floor device — NOT np.round (ADVICE r12)
        return np.floor(np.asarray(x) * 1000000.0 + 0.5) / 1000000.0

    cent = mat[:_IVF_N_CENTROIDS] / nrm[:_IVF_N_CENTROIDS, None]
    # every vector's cluster: argmax over fround6 cosines (first max =
    # smallest idx) — the r12 tie contract shared by all three ways
    cl = np.argmax(fr6((mat / nrm[:, None]) @ cent.T), axis=1)
    expected = []
    for qpos in np.where(ids < 10)[0]:
        qcos = fr6((mat[qpos] / nrm[qpos]) @ cent.T)
        probe = set(np.argsort(-qcos, kind="stable")[:_IVF_NPROBE])
        cand = [i for i in range(len(ids))
                if cl[i] in probe and ids[i] != ids[qpos]]
        cos = fr6((mat[cand] @ mat[qpos]) / (nrm[cand] * nrm[qpos]))
        order = sorted(range(len(cand)), key=lambda j: (-cos[j],
                                                        ids[cand[j]]))
        for rk, j in enumerate(order[:3], 1):
            expected.append((int(ids[qpos]), int(ids[cand[j]]), rk,
                             float(cos[j])))
    got = sorted((r.query_id, r.neighbor_id, r.rk, r.cosine)
                 for r in q52_ivf_ann(spark, SF_ORACLE).collect())
    assert got == sorted(expected)


# -------------------------------------------------------------- q220
def test_q220_mmr_audit_vs_python(spark):
    """q220's sharpened oracle (first pick AND second-pick-given-first,
    round 13) shares _dot_sql/fround6 fragments with the Spark side —
    replay both argmaxes from scratch in flat numpy (third way)."""
    import numpy as np

    from spatial_data_engineering_spark.operators.similarity import (
        _MMR_CAND, _MMR_K, _MMR_LAMBDA, q220_mmr_audit)

    emb = pd.read_parquet(SF_ORACLE + "/embeddings.parquet")
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    ids = emb["vec_id"].to_numpy()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    nrm = np.linalg.norm(mat, axis=1)
    keep = nrm > 0
    ids, mat, nrm = ids[keep], mat[keep], nrm[keep]

    def fr6(x):
        return float(np.floor(np.asarray(x) * 1000000.0 + 0.5)
                     / 1000000.0)

    (qpos,) = np.where(ids == 0)[0]
    oth = [i for i in range(len(ids)) if ids[i] != 0]
    rel = {i: float((mat[qpos] @ mat[i]) / (nrm[qpos] * nrm[i]))
           for i in oth}
    cand = sorted(oth, key=lambda i: (-rel[i], ids[i]))[:_MMR_CAND]
    first = cand[0]
    coef = 1.0 - _MMR_LAMBDA
    mmr = {i: fr6(_MMR_LAMBDA * rel[i]
                  - coef * ((mat[i] @ mat[first])
                            / (nrm[i] * nrm[first])))
           for i in cand if i != first}
    second = min(mmr, key=lambda i: (-mmr[i], ids[i]))

    row = q220_mmr_audit(spark, SF_ORACLE).collect()[0]
    assert row.first_pick_id == int(ids[first])
    assert row.first_pick_rel == fr6(rel[first])
    assert row.second_pick_id == int(ids[second])
    assert row.second_pick_mmr == mmr[second]
    assert row.n_selected == _MMR_K
    assert row.picks_from_candidates == 1


# -------------------------------------------------------------- q221
def test_q221_gopher_rules_vs_python(spark, docs):
    """q221's oracle is generated from the same _gopher_flags builder
    as the Spark side — replay every rule from scratch (plain str ops,
    no SQL fragments) per the thirdway discipline."""
    from spatial_data_engineering_spark.operators.textops import (
        _GR_MIN_STOP, _GR_MIN_WORDS, _GR_MAX_WORDS, _GR_WLEN_HI10,
        _GR_WLEN_LO10, q221_gopher_rules)

    stop = {"the", "a", "of", "and", "to", "in"}
    per = defaultdict(lambda: {"n": 0, "wc": 0, "wl": 0, "rep": 0,
                               "sw": 0, "kept": 0})
    for _, r in docs.iterrows():
        toks = r["text"].split(" ")
        n = len(toks)
        sumlen = sum(len(t) for t in toks)
        f_wc = n < _GR_MIN_WORDS or n > _GR_MAX_WORDS
        f_wl = (sumlen * 10 < _GR_WLEN_LO10 * n
                or sumlen * 10 > _GR_WLEN_HI10 * n)
        f_rep = 2 * len(set(toks)) < n
        f_sw = sum(1 for t in toks if t in stop) < _GR_MIN_STOP
        g = per[r["lang"]]
        g["n"] += 1
        g["wc"] += f_wc
        g["wl"] += f_wl
        g["rep"] += f_rep
        g["sw"] += f_sw
        g["kept"] += not (f_wc or f_wl or f_rep or f_sw)
    got = {r.lang: r for r in q221_gopher_rules(spark, SF_ORACLE).collect()}
    assert set(got) == set(per)
    total_kept = 0
    for lang, g in per.items():
        r = got[lang]
        assert (r.n_docs, r.fail_wordcount, r.fail_wordlen,
                r.fail_repetition, r.fail_stopwords, r.n_kept) == (
            g["n"], g["wc"], g["wl"], g["rep"], g["sw"], g["kept"])
        assert r.kept_frac == math.floor(
            g["kept"] * 1.0 / g["n"] * 1000000.0 + 0.5) / 1000000.0
        total_kept += g["kept"]
    # the rule set must actually BITE on the fixture (non-trivial both
    # ways) — a threshold drift that lets everything through or kills
    # everything is a spec bug, not just a parity event
    n_total = sum(g["n"] for g in per.values())
    assert 0 < total_kept < n_total


# -------------------------------------------------------------- q55
def test_q55_kmeans_vs_python(spark):
    """q55's round-13 full-Lloyd SQL oracle, triangulated: a third
    from-scratch implementation (flat numpy + decimal.Decimal for the
    exact means; no Spark, no SQL) must reproduce the registered
    query's exact cluster sizes."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    from spatial_data_engineering_spark.operators.clustering import \
        q55_kmeans

    K, ITERS = 8, 5
    emb = pd.read_parquet(SF_ORACLE + "/embeddings.parquet")
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    ids = emb["vec_id"].to_numpy()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)

    def fr6(x):
        return np.floor(np.asarray(x) * 1000000.0 + 0.5) / 1000000.0

    def dec_mean(vals):  # the engines' decimal(30,10)-exact mean
        q = Decimal("1e-10")
        s = sum((Decimal(float(v)).quantize(q, ROUND_HALF_UP)
                 for v in vals), Decimal(0))
        return float(s) / len(vals)

    def assign(cent):
        d2 = ((mat * mat).sum(1)[:, None] - 2.0 * (mat @ cent.T)
              + (cent * cent).sum(1)[None, :])
        return np.argmin(fr6(d2), axis=1)

    cent = mat[:K].copy()
    for _ in range(ITERS):
        cl = assign(cent)
        new = cent.copy()
        for c in range(K):
            members = cl == c
            if members.any():
                for p in range(mat.shape[1]):
                    new[c, p] = dec_mean(mat[members, p])
        cent = new
    cl = assign(cent)

    expected = {}
    for c in range(K):
        members = np.where(cl == c)[0]
        if len(members):
            expected[c] = (len(members), int(ids[members].min()))
    got = {r.cluster: (r.n_vectors, r.min_vec_id)
           for r in q55_kmeans(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q110
def test_q110_mmr_sequence_vs_python(spark):
    """q110's round-13 full greedy-MMR replay oracle, triangulated: a
    from-scratch numpy MMR (BLAS sims, the fround6-argmax contract)
    must reproduce the registered query's exact (rank, id, relevance)
    rows."""
    import numpy as np

    from spatial_data_engineering_spark.operators.similarity import (
        _MMR_CAND, _MMR_K, _MMR_LAMBDA, q110_mmr_diversify)

    emb = pd.read_parquet(SF_ORACLE + "/embeddings.parquet")
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    ids = emb["vec_id"].to_numpy()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    nrm = np.linalg.norm(mat, axis=1)
    keep = nrm > 0
    ids, mat, nrm = ids[keep], mat[keep], nrm[keep]

    def fr6(x):
        return float(np.floor(np.asarray(x) * 1000000.0 + 0.5)
                     / 1000000.0)

    (qi,) = np.where(ids == 0)[0]
    rel = (mat @ mat[qi]) / (nrm * nrm[qi])
    mask = ids != 0
    cids, crel = ids[mask], rel[mask]
    order = np.lexsort((cids, -crel))[:_MMR_CAND]
    cids, crel = cids[order], crel[order]
    cmat = mat[np.searchsorted(ids, cids)]
    cmat = cmat / np.linalg.norm(cmat, axis=1)[:, None]
    sim = cmat @ cmat.T

    sel, rem = [], list(range(len(cids)))
    while rem and len(sel) < _MMR_K:
        if not sel:
            best = max(rem, key=lambda i: (crel[i], -cids[i]))
        else:
            best = max(rem, key=lambda i: (
                fr6(_MMR_LAMBDA * crel[i]
                    - (1 - _MMR_LAMBDA) * max(sim[i][j] for j in sel)),
                -cids[i]))
        sel.append(best)
        rem.remove(best)
    expected = [(r + 1, int(cids[i]), fr6(crel[i]))
                for r, i in enumerate(sel)]
    got = [(r.rank, r.vec_id, r.relevance)
           for r in q110_mmr_diversify(spark, SF_ORACLE)
           .orderBy("rank").collect()]
    assert got == expected
