"""Independent numpy / pure-Python cross-checks for the round-6 driver
window's nontrivial-math queries.

The DuckDB oracles prove Spark and DuckDB agree — but both run SQL the
builder wrote from the same formula, so a shared formula error would
pass parity.  These tests recompute each statistic a THIRD way: pure
Python/numpy straight from the parquet files (pandas.read_parquet —
no Spark, no DuckDB, no shared SQL), following only the query's
documented definition.  The 14 queries covered are exactly the ones the
round-5 judge flagged as highest-risk math (q153 q154 q155 q156 q163
q172 q185 q186 q188 q189 q193 q196 q202 q211).

Tolerances: string/int columns compare exactly; floats to 1e-5 (the
engine rounds outputs to 6 dp and runs sums through round-9 decimals,
so an honest reimplementation in plain float64 lands well inside 1e-5).
"""

from __future__ import annotations

import hashlib
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


def _md5_bucket(key) -> int:
    """(int(md5(str(key))[:8], 16) % 2147483647) % 100 — the q73 splitter."""
    h = hashlib.md5(str(key).encode()).hexdigest()
    return (int(h[:8], 16) % 2147483647) % 100


def _toks(text: str) -> list[str]:
    return [t for t in text.split(" ") if t != ""]


def _pos_toks(text: str) -> list[tuple[int, str]]:
    """1-based split positions, empties dropped AFTER numbering (the
    list_transform-then-filter shape every positional oracle uses)."""
    return [(i, t) for i, t in enumerate(text.split(" "), start=1) if t != ""]


# -------------------------------------------------------------- q211
def test_q211_pearson_vs_numpy(spark):
    from spatial_data_engineering_spark.operators.relational import (
        q211_discount_quantity_corr)

    li = pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet",
                         columns=["l_discount", "l_quantity"])
    r_np = np.corrcoef(li.l_discount.to_numpy(), li.l_quantity.to_numpy())[0, 1]
    got = q211_discount_quantity_corr(spark, SF_ORACLE).collect()[0]
    assert got.n_rows == len(li)
    assert abs(got.pearson_r - r_np) < TOL


# -------------------------------------------------------------- q202
def test_q202_cramers_v_vs_numpy(spark):
    from spatial_data_engineering_spark.operators.relational import (
        q202_cramers_v)

    o = pd.read_parquet(f"{SF_ORACLE}/orders.parquet",
                        columns=["o_custkey", "o_orderpriority"])
    c = pd.read_parquet(f"{SF_ORACLE}/customer.parquet",
                        columns=["c_custkey", "c_mktsegment"])
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    ct = pd.crosstab(j.c_mktsegment, j.o_orderpriority).to_numpy(dtype=float)
    t = ct.sum()
    exp = np.outer(ct.sum(axis=1), ct.sum(axis=0)) / t
    chi2 = ((ct - exp) ** 2 / exp).sum()
    v = math.sqrt(chi2 / (t * (min(ct.shape) - 1)))
    got = q202_cramers_v(spark, SF_ORACLE).collect()[0]
    assert got.n_rows == int(t)
    assert abs(got.chi2 - chi2) < 1e-3      # chi2 is O(10^1..10^2)
    assert abs(got.cramers_v - v) < TOL


# ---------------------------------------------------- shared quality
def _quality(row) -> float:
    toks = row["text"].split(" ")
    nt = len(toks)
    ndt = len(set(toks))
    nstop = sum(t in ("the", "a", "of", "and", "to", "in") for t in toks)
    n = len(row["text"])
    x = (0.25 * min(n / 400.0, 1.0)
         + 0.25 * min(nstop * 4.0 / nt, 1.0)
         + 0.50 * (ndt / nt))
    # floor-device, mirroring _scored_quality/_SCORED_SQL halfway
    # semantics on the exact binary value (python round() is banker's)
    return math.floor(x * 1000000.0 + 0.5) / 1000000.0


# -------------------------------------------------------------- q163
def test_q163_auc_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import q163_score_auc

    d = docs.copy()
    d["quality"] = d.apply(_quality, axis=1)
    med = np.percentile(d.n_chars.to_numpy(), 50)  # linear interp = quantile_cont
    d["gold"] = (d.n_chars > med).astype(int)
    d = d.sort_values(["quality", "doc_id"]).reset_index(drop=True)
    d["rnk"] = np.arange(1, len(d) + 1)
    n_pos = int(d.gold.sum())
    n_neg = len(d) - n_pos
    auc = (d.loc[d.gold == 1, "rnk"].sum() - n_pos * (n_pos + 1) / 2.0) \
        / (n_pos * n_neg)
    got = q163_score_auc(spark, SF_ORACLE).collect()[0]
    assert (got.n_pos, got.n_neg) == (n_pos, n_neg)
    assert abs(got.auc - auc) < TOL


# -------------------------------------------------------------- q172
def test_q172_zipf_vs_numpy(spark, docs):
    from spatial_data_engineering_spark.operators.textops import q172_zipf_fit

    tf = Counter(t for txt in docs.text for t in _toks(txt))
    top = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    x = np.log(np.arange(1, len(top) + 1, dtype=float))
    y = np.log(np.array([n for _, n in top], dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0, 1]
    got = q172_zipf_fit(spark, SF_ORACLE).collect()[0]
    assert got.n_types == len(top)
    assert abs(got.slope - slope) < TOL
    assert abs(got.intercept - intercept) < TOL
    assert abs(got.r2 - r * r) < TOL


# -------------------------------------------------------------- q185
def test_q185_cond_entropy_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q185_bigram_cond_entropy)

    big = Counter()
    for txt in docs.text:
        pt = _pos_toks(txt)
        by_i = dict(pt)
        for i, tok in pt:
            nxt = by_i.get(i + 1)
            if nxt is not None:
                big[(tok, nxt)] += 1
    t = sum(big.values())
    marg = Counter()
    for (w1, _), n in big.items():
        marg[w1] += n
    h = -sum((n / t) * math.log(n / marg[w1]) for (w1, _), n in big.items())
    got = q185_bigram_cond_entropy(spark, SF_ORACLE).collect()[0]
    assert got.n_bigrams == len(big)
    assert abs(got.cond_entropy - h) < TOL


# -------------------------------------------------------------- q186
def test_q186_negative_sampling_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q186_negative_sampling)

    tf = Counter(t for txt in docs.text for t in _toks(txt))
    w = {t: round(n ** 0.75, 9) for t, n in tf.items()}
    z = sum(w.values())
    ranked = sorted(w.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = q186_negative_sampling(spark, SF_ORACLE).collect()
    assert len(got) == 20
    for row, (tok, wv) in zip(sorted(got, key=lambda r: r.rk), ranked):
        assert row.token == tok and row.n == tf[tok]
        assert abs(row.p_negative - wv / z) < TOL


# -------------------------------------------------------------- q188
def test_q188_welch_t_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import q188_aa_test

    d = docs.copy()
    d["quality"] = d.apply(_quality, axis=1)
    d["arm"] = d.doc_id.map(lambda k: _md5_bucket(k) % 2)
    a = d.loc[d.arm == 0, "quality"].to_numpy()
    b = d.loc[d.arm == 1, "quality"].to_numpy()
    t = (a.mean() - b.mean()) / math.sqrt(
        a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
    got = q188_aa_test(spark, SF_ORACLE).collect()[0]
    assert (got.n_a, got.n_b) == (len(a), len(b))
    assert abs(got.mean_a - a.mean()) < TOL
    assert abs(got.mean_b - b.mean()) < TOL
    assert abs(got.t_stat - t) < TOL


# -------------------------------------------------------------- q189
def test_q189_runs_test_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import q189_runs_test

    maj = sorted(Counter(docs.lang).items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    seq = (docs.sort_values("doc_id").lang == maj).astype(int).tolist()
    r = 1 + sum(seq[i] != seq[i - 1] for i in range(1, len(seq)))
    n1, n2 = float(sum(seq)), float(len(seq) - sum(seq))
    er = 1.0 + 2.0 * n1 * n2 / (n1 + n2)
    sd = math.sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                   / ((n1 + n2) ** 2 * (n1 + n2 - 1.0)))
    got = q189_runs_test(spark, SF_ORACLE).collect()[0]
    assert (got.n_runs, got.n_majority, got.n_other) == (r, int(n1), int(n2))
    assert abs(got.expected_runs - er) < TOL
    assert abs(got.z_stat - (r - er) / sd) < TOL


# -------------------------------------------------------------- q193
def test_q193_heaps_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import q193_heaps_law

    seen: dict[str, int] = {}
    rn = 0
    for _, row in docs.sort_values("doc_id").iterrows():
        for _, tok in _pos_toks(row["text"]):
            rn += 1
            seen.setdefault(tok, rn)
    expected = {k: sum(1 for f in seen.values() if f <= k)
                for k in (1000, 2000, 4000, 8000, 16000)}
    got = {r.n_tokens: r.n_types
           for r in q193_heaps_law(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q196
def test_q196_crosssplit_nll_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q196_crosssplit_perplexity)

    d = docs.copy()
    d["bucket"] = d.doc_id.map(_md5_bucket)
    train = d[d.bucket < 80]
    val = d[(d.bucket >= 80) & (d.bucket < 90)]
    freq = Counter(t for txt in train.text for t in _toks(txt))
    tot = sum(freq.values())
    val_toks = [t for txt in val.text for t in _toks(txt)]
    known = [t for t in val_toks if t in freq]
    nll = sum(-math.log(freq[t] / tot) for t in known) / len(known)
    got = q196_crosssplit_perplexity(spark, SF_ORACLE).collect()[0]
    assert got.n_val_tokens == len(val_toks)
    assert got.n_oov == len(val_toks) - len(known)
    assert abs(got.oov_rate - (len(val_toks) - len(known)) / len(val_toks)) < TOL
    assert abs(got.val_nll - nll) < TOL


# -------------------------------------------------------------- q155
def test_q155_pmi_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q155_pmi_collocations)

    pairs = Counter()
    marg = Counter()
    for txt in docs.text:
        pt = _pos_toks(txt)
        by_i = dict(pt)
        for i, tok in pt:
            marg[tok] += 1
            for di in (1, 2, 3):
                other = by_i.get(i + di)
                if other is not None:
                    pairs[(tok, other)] += 1
    t_pairs = sum(pairs.values())
    t_tok = sum(marg.values())
    scored = []
    for (w1, w2), n_ab in pairs.items():
        if n_ab >= 5:
            pmi = round(math.log((n_ab / t_pairs)
                                 / ((marg[w1] / t_tok) * (marg[w2] / t_tok))), 6)
            scored.append((w1, w2, n_ab, pmi))
    top = sorted(scored, key=lambda r: (-r[3], r[0], r[1]))[:20]
    got = sorted(q155_pmi_collocations(spark, SF_ORACLE).collect(),
                 key=lambda r: r.rk)
    assert len(got) == len(top)
    for row, (w1, w2, n_ab, pmi) in zip(got, top):
        assert (row.w1, row.w2, row.n_ab) == (w1, w2, n_ab)
        assert abs(row.pmi - pmi) < TOL


# -------------------------------------------------------------- q154
def test_q154_knn_vs_numpy_bruteforce(spark):
    from spatial_data_engineering_spark.operators.similarity import (
        q154_knn_label_accuracy)

    e = pd.read_parquet(f"{SF_ORACLE}/embeddings.parquet")
    e = e.sort_values("vec_id").reset_index(drop=True)
    X = np.array(e.embedding.tolist(), dtype=np.float64)
    nrm = np.linalg.norm(X, axis=1)
    keep = nrm > 0
    e, X, nrm = e[keep].reset_index(drop=True), X[keep], nrm[keep]
    C = np.round((X @ X.T) / np.outer(nrm, nrm), 6)
    np.fill_diagonal(C, -np.inf)
    # argmax with tie-break by smallest neighbor vec_id: vec_id order is
    # row order here, and np.argmax returns the first maximal index
    nn = C.argmax(axis=1)
    labels = e.label.to_numpy()
    correct = labels[nn] == labels
    expected = {}
    for lab in np.unique(labels):
        m = labels == lab
        expected[int(lab)] = (int(m.sum()), int(correct[m].sum()))
    got = q154_knn_label_accuracy(spark, SF_ORACLE).collect()
    assert {int(r.label): (r.n_vectors, r.n_correct) for r in got} == expected
    for r in got:
        n, c = expected[int(r.label)]
        assert abs(r.accuracy - round(c / n, 6)) < TOL


# --------------------------------------------------------- simhash/minhash
def _md5_hex_nibbles(s: str) -> list[int]:
    h = hashlib.md5(s.encode()).hexdigest()
    return [int(ch, 16) for ch in h]


def test_q153_simhash_hamming_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.dedup import (
        q153_simhash_hamming_join)

    words = {}
    for _, row in docs.iterrows():
        toks = set(_toks(row["text"]))
        sums = [0] * 64
        for t in toks:
            nib = _md5_hex_nibbles(t)
            for j in range(64):
                bit = (nib[j // 4] >> (j % 4)) & 1
                sums[j] += 2 * bit - 1
        ws = []
        for k in range(4):
            w = 0
            for j in range(16):
                if sums[16 * k + j] > 0:
                    w |= 1 << j
            ws.append(w)
        words[row["doc_id"]] = ws

    buckets = defaultdict(list)
    for doc_id, ws in words.items():
        for band, w in enumerate(ws):
            buckets[(band, w)].append(doc_id)
    cand = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    hist = Counter()
    for a, b in cand:
        d = sum(bin(wa ^ wb).count("1")
                for wa, wb in zip(words[a], words[b]))
        if d <= 3:
            hist[d] += 1
    got = {r.hamming: r.n_pairs
           for r in q153_simhash_hamming_join(spark, SF_ORACLE).collect()}
    assert got == dict(hist)


_MH_PARAMS = [(2 * i + 1, 17 + i * (i + 1) // 2 + i * 0) for i in range(16)]


def _minhash_sig(shingles: set[str]) -> list[int]:
    P = 2147483647
    hs = [int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % P
          for t in shingles]
    sig = []
    for i in range(16):
        a = 2 * i + 1
        b = {0: 17, 1: 18, 2: 21, 3: 26, 4: 33, 5: 42, 6: 53, 7: 66,
             8: 81, 9: 98, 10: 117, 11: 138, 12: 161, 13: 186,
             14: 213, 15: 242}[i]
        sig.append(min((a * h + b) % P for h in hs))
    return sig


def test_q156_minhash_audit_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.dedup import (
        q156_minhash_estimate_audit)

    sh = {}
    for _, row in docs.iterrows():
        txt = row["text"]
        upper = max(len(txt) - 7, 1)
        sh[row["doc_id"]] = {txt[i:i + 8] for i in range(upper)}
    sig = {d: _minhash_sig(s) for d, s in sh.items() if s}

    buckets = defaultdict(list)
    for d, sg in sig.items():
        for bi, lo in ((0, 0), (1, 8)):
            key = hashlib.md5(
                "|".join([f"b{bi}"] + [str(v) for v in sg[lo:lo + 8]])
                .encode()).hexdigest()
            buckets[key].append(d)
    cand = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))

    groups = defaultdict(list)
    for a, b in cand:
        n_match = sum(x == y for x, y in zip(sig[a], sig[b]))
        jac = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
        groups[n_match].append(jac)
    expected = {
        m: (len(js), sum(js) / len(js),
            sum(abs(m / 16.0 - j) for j in js) / len(js))
        for m, js in groups.items()
    }
    got = {r.n_match: r for r in
           q156_minhash_estimate_audit(spark, SF_ORACLE).collect()}
    assert set(got) == set(expected)
    for m, (n_pairs, avg_exact, mae) in expected.items():
        r = got[m]
        assert r.n_pairs == n_pairs
        assert abs(r.estimate - round(m / 16.0, 6)) < TOL
        assert abs(r.avg_exact - avg_exact) < TOL
        assert abs(r.mae - mae) < TOL
