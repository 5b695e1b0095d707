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
