"""Seventeenth batch of independent cross-checks — the near-dup GRAPH
family and its consumers, none of which had a third-way check before:
q56 connected components, q94 canonical selection, q86 PageRank (with
the decimal-quantized contribution sums replicated digit-for-digit),
q152 cluster-size histogram, q167 three-detector Venn, q128 detector
agreement (Cohen's kappa), q148 SemDeDup, q149 winsorized/trimmed
stats.  Same contract: pure Python/numpy from parquet, no Spark, no
DuckDB, no shared SQL.
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
import pytest

from .conftest import SF_ORACLE
from .test_numpy_crosscheck import _md5_hex_nibbles, _minhash_sig
from .test_numpy_crosscheck7 import _shingles

TOL = 1e-5


def _close(a, b):
    return abs(a - b) <= max(abs(b) * 1e-9, TOL)


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF_ORACLE}/documents.parquet")


@pytest.fixture(scope="module")
def emb():
    e = pd.read_parquet(f"{SF_ORACLE}/embeddings.parquet")
    return e.sort_values("vec_id").reset_index(drop=True)


@pytest.fixture(scope="module")
def pairs(docs):
    """q47's exact near-dup pair set, rebuilt from first principles
    (shingle -> minhash -> band buckets -> exact-Jaccard verify)."""
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
    out = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = ids[i], ids[j]
                if len(sh[a] & sh[b]) / len(sh[a] | sh[b]) >= 0.6:
                    out.add((a, b))
    return out


def _components(pairs):
    """Union-find over the pair set; component id = min member id."""
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = defaultdict(set)
    for n in parent:
        comps[find(n)].add(n)
    return {min(m): m for m in comps.values()}


# -------------------------------------------------------------- q56
def test_q56_components_vs_union_find(spark, pairs):
    from spatial_data_engineering_spark.operators.clustering import (
        q56_dedup_components)

    expected = {c: (len(m), min(m)) for c, m in _components(pairs).items()}
    got = {r.component: (r.n_docs, r.keeper_doc_id)
           for r in q56_dedup_components(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q94
def test_q94_canonical_vs_python(spark, pairs, docs):
    from spatial_data_engineering_spark.operators.clustering import (
        q94_dedup_canonical)

    chars = dict(zip(docs.doc_id, docs.n_chars))
    expected = {}
    for c, members in _components(pairs).items():
        best = max(members, key=lambda d: (chars[d], -d))
        expected[c] = (len(members), chars[best], best)
    got = {r.component: (r.n_members, r.canonical_chars, r.canonical_id)
           for r in q94_dedup_canonical(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q86
def test_q86_pagerank_vs_python(spark, pairs):
    from spatial_data_engineering_spark.operators.clustering import (
        q86_pagerank_centrality)

    # symmetric distinct edges; deg = distinct-neighbor count
    sym = set()
    for a, b in pairs:
        sym.add((a, b))
        sym.add((b, a))
    deg = Counter(s for s, _ in sym)
    rank = {n: 1.0 for n in deg}
    six = Decimal("0.000001")
    for _ in range(5):
        contrib = defaultdict(list)
        for s, d in sym:
            contrib[d].append(rank[s] / deg[s])
        # replicate cast(double AS DECIMAL(30,6)) + decimal SUM exactly:
        # each contribution quantized HALF_UP to 6 dp, summed exactly
        rank = {d: 0.15 + 0.85 * float(sum(
                    Decimal(c).quantize(six, ROUND_HALF_UP) for c in cs))
                for d, cs in contrib.items()}
    got = {r.doc_id: r.rank
           for r in q86_pagerank_centrality(spark, SF_ORACLE).collect()}
    assert set(got) == set(rank)
    for n, r in rank.items():
        assert _close(got[n], round(r, 6)), (n, got[n], r)


# -------------------------------------------------------------- q152
def test_q152_cluster_sizes_vs_python(spark, pairs):
    from spatial_data_engineering_spark.operators.clustering import (
        q152_dup_cluster_sizes)

    sizes = Counter(len(m) for m in _components(pairs).values())
    expected = {sz: (k, sz * k, (sz - 1) * k) for sz, k in sizes.items()}
    got = {r.cluster_size: (r.n_clusters, r.n_docs_total, r.n_dup_overhead)
           for r in q152_dup_cluster_sizes(spark, SF_ORACLE).collect()}
    assert got == expected


def _simhash16(tokens) -> int:
    sums = [0] * 16
    for t in tokens:
        nib = _md5_hex_nibbles(t)[:4]
        for j in range(16):
            bit = (nib[j // 4] >> (j % 4)) & 1
            sums[j] += 2 * bit - 1
    return sum(1 << j for j in range(16) if sums[j] > 0)


# -------------------------------------------------------------- q167
def test_q167_venn_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.dedup import (
        q167_dedup_strategy_venn)

    eh = docs.text.map(lambda t: hashlib.md5(t.encode()).hexdigest())
    fh = docs.text.map(lambda t: hashlib.md5(
        " ".join(sorted(set(t.split(" ")))).encode()).hexdigest())
    sh = docs.text.map(lambda t: _simhash16(set(t.split(" "))))
    en, fn, sn = Counter(eh), Counter(fh), Counter(sh)
    venn = Counter(
        (int(en[e] > 1), int(fn[f] > 1), int(sn[s] > 1))
        for e, f, s in zip(eh, fh, sh))
    got = {(r.f_exact, r.f_tokensort, r.f_simhash): r.n_docs
           for r in q167_dedup_strategy_venn(spark, SF_ORACLE).collect()}
    assert got == dict(venn)


# -------------------------------------------------------------- q128
def test_q128_kappa_vs_python(spark, docs, pairs):
    from spatial_data_engineering_spark.operators.textops import (
        q128_detector_agreement)

    mh_flagged = {d for p in pairs for d in p}
    sh = docs.text.map(lambda t: _simhash16(set(t.split(" "))))
    sn = Counter(sh)
    sh_flagged = set(docs.doc_id[[sn[s] > 1 for s in sh]])
    n11 = n10 = n01 = n00 = 0
    for d in docs.doc_id:
        a, b = d in mh_flagged, d in sh_flagged
        n11 += a and b
        n10 += a and not b
        n01 += b and not a
        n00 += not a and not b
    n = len(docs)
    po = (n11 + n00) / n
    pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / (n * n)
    kappa = (po - pe) / (1 - pe)
    row = q128_detector_agreement(spark, SF_ORACLE).collect()[0]
    assert (row.n11, row.n10, row.n01, row.n00) == (n11, n10, n01, n00)
    assert _close(row.kappa, round(kappa, 6))


def _fold_dot(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)  # strict left fold, like the SQL
    return acc


# -------------------------------------------------------------- q148
def test_q148_semdedup_vs_python(spark, emb):
    from spatial_data_engineering_spark.operators.similarity import (
        q148_semdedup)

    import math

    vecs = {int(r.vec_id): list(r.embedding) for _, r in emb.iterrows()}
    nrm = {d: _fold_dot(v, v) ** 0.5 for d, v in vecs.items()}
    nz = [d for d in sorted(vecs) if nrm[d] > 0]
    cents = nz[:max(16, math.isqrt(len(nz)))]  # the adaptive-K contract
    member = defaultdict(list)
    for d in nz:
        best = max(cents, key=lambda c: (
            _fold_dot(vecs[d], vecs[c]) / (nrm[d] * nrm[c]), -c))
        member[best].append(d)
    expected = {}
    for c, ms in member.items():
        dropped = set()
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                a, b = min(ms[i], ms[j]), max(ms[i], ms[j])
                cos = _fold_dot(vecs[a], vecs[b]) / (nrm[a] * nrm[b])
                if cos >= 0.8:
                    dropped.add(b)
        expected[c] = (len(ms), len(dropped), len(ms) - len(dropped))
    got = {r.cid: (r.n_vectors, r.n_dropped, r.n_kept)
           for r in q148_semdedup(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q149
def test_q149_winsorized_vs_numpy(spark):
    from spatial_data_engineering_spark.operators.relational import (
        q149_winsorized_stats)

    li = pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet",
                         columns=["l_returnflag", "l_extendedprice"])
    got = {r.l_returnflag: r
           for r in q149_winsorized_stats(spark, SF_ORACLE).collect()}
    for flag, grp in li.groupby("l_returnflag"):
        x = grp.l_extendedprice.to_numpy(dtype=np.float64)
        p05, p95 = np.percentile(x, [5, 95], method="linear")
        clamped = np.clip(x, p05, p95)
        inband = (x >= p05) & (x <= p95)
        r = got[flag]
        assert r.n == len(x)
        assert _close(r.winsorized_mean, clamped.mean())
        assert _close(r.trimmed_mean, x[inband].mean())
        assert r.n_clamped == int((~inband).sum())
