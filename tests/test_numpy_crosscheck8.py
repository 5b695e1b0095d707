"""Eighth batch of independent cross-checks — remaining r4-tail custom
kernels: q43 (minhash-1 fingerprint), q66 (repetition/boilerplate), q76
(rare-shingle Jaccard join), q79 (benchmark decontamination), q81
(64-char substring seed dedup), q91 (temperature sampling).  Same
contract: pure Python from parquet, no Spark, no DuckDB, no shared
SQL."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pandas as pd
import pytest

from .conftest import SF_ORACLE

TOL = 1e-5


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF_ORACLE}/documents.parquet")


def _shingles(txt: str) -> set[str]:
    upper = max(len(txt) - 7, 1)
    return {txt[i:i + 8] for i in range(upper)}


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# -------------------------------------------------------------- q43
def test_q43_fingerprint_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q43_fingerprint)

    groups = defaultdict(list)
    for _, row in docs.iterrows():
        fp = min(_md5(s) for s in
                 (row["text"][i:i + 8]
                  for i in range(max(len(row["text"]) - 7, 1))))
        groups[fp].append(row["doc_id"])
    expected = {fp: (len(g), min(g)) for fp, g in groups.items()}
    got = {r.fp: (r.n_docs, r.keeper_doc_id)
           for r in q43_fingerprint(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q66
def test_q66_repetition_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q66_repetition)

    per_lang = defaultdict(lambda: [0, 0, 0])  # boilerplate, docs, worst
    for _, row in docs.iterrows():
        counts = Counter(row["text"].split(" "))
        max_rep = max(counts.values())
        n_tok = sum(counts.values())
        cell = per_lang[row["lang"]]
        cell[0] += int(max_rep / n_tok > 0.2)
        cell[1] += 1
        cell[2] = max(cell[2], max_rep)
    got = {r.lang: (r.n_boilerplate, r.n_docs, r.worst_repetition)
           for r in q66_repetition(spark, SF_ORACLE).collect()}
    assert got == {k: tuple(v) for k, v in per_lang.items()}


# -------------------------------------------------------------- q76
def test_q76_jaccard_join_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.dedup import (
        q76_ngram_jaccard_join)

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
        jac = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
        if jac >= 0.5:
            expected[(a, b)] = round(jac, 6)
    got = {(r.a_id, r.b_id): r.jaccard
           for r in q76_ngram_jaccard_join(spark, SF_ORACLE).collect()}
    assert set(got) == set(expected)
    for k, j in expected.items():
        assert abs(got[k] - j) < TOL


# -------------------------------------------------------------- q79
def test_q79_decontaminate_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q79_decontaminate)

    sh = {row["doc_id"]: _shingles(row["text"])
          for _, row in docs.iterrows()}
    bench = set()
    for d, s in sh.items():
        if d % 97 == 0:
            bench |= s
    expected = {}
    for d, s in sh.items():
        if d % 97 == 0:
            continue
        matched = len(s & bench)
        if matched and matched / len(s) >= 0.45:
            expected[d] = (len(s), matched, round(matched / len(s), 6))
    got = {r.doc_id: (r.n_shingles, r.n_matched, r.overlap)
           for r in q79_decontaminate(spark, SF_ORACLE).collect()}
    assert set(got) == set(expected)
    for d, (n, m, ov) in expected.items():
        assert got[d][:2] == (n, m)
        assert abs(got[d][2] - ov) < TOL


# -------------------------------------------------------------- q81
def test_q81_substring_dup_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.dedup import (
        q81_substring_dup)

    grams = defaultdict(set)   # hash -> docs containing it anywhere
    seeds = defaultdict(set)   # hash -> docs containing it at seed pos
    for _, row in docs.iterrows():
        txt = row["text"]
        upper = max(len(txt) - 63, 1)
        for i in range(upper):
            grams[_md5(txt[i:i + 64])].add(row["doc_id"])
        for i in range(0, upper, 16):
            sub = txt[i:i + 64]
            if len(sub) == 64:
                seeds[_md5(sub)].add(row["doc_id"])
    shared = defaultdict(set)
    for h, docs_a in grams.items():
        for a in docs_a:
            for b in seeds.get(h, ()):
                if a < b:
                    shared[(a, b)].add(h)
    expected = {k: len(v) for k, v in shared.items()}
    got = {(r.a_id, r.b_id): r.n_shared_seeds
           for r in q81_substring_dup(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q91
def test_q91_temperature_sample_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q91_temperature_sample)

    counts = Counter(docs.lang)
    z = sum(math.sqrt(c) for c in counts.values())
    rates = {lang: min(1.0, 300 * (math.sqrt(c) / z) / c)
             for lang, c in counts.items()}
    expected = {}
    for _, row in docs.iterrows():
        u = int(_md5(str(row["doc_id"]))[:8], 16) % 2147483647
        if u < math.ceil(rates[row["lang"]] * 2147483647):
            expected[row["doc_id"]] = (row["lang"], row["n_chars"])
    got = {r.doc_id: (r.lang, r.n_chars)
           for r in q91_temperature_sample(spark, SF_ORACLE).collect()}
    assert got == expected
