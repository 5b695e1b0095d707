"""Twenty-seventh independent cross-check batch: q226 (MinHash-tier
incremental admission), the r16 arrival whose oracle is assembled from
the shared signature/band builders (_sig_aggs/_band_keys/_hex_fold).
Same contract as every crosscheck file: pure Python/hashlib from
parquet, no Spark expressions, no DuckDB, no shared SQL builders — the
three admission tiers (exact hash, token-sort fingerprint, LSH-banded
exact-Jaccard near-dup vs corpus and within-batch keep-first) are
recomputed from scratch."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pandas as pd
import pytest

from .conftest import SF_ORACLE
from .test_numpy_crosscheck import _minhash_sig

_MOD, _REM = 10, 9
_THETA = 0.6


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF_ORACLE}/documents.parquet")


def _shingles(txt: str) -> set[str]:
    upper = max(len(txt) - 7, 1)
    return {txt[i:i + 8] for i in range(upper)}


def _band_keys_py(sig: list[int]) -> list[str]:
    return [hashlib.md5("|".join([f"b{bi}"] + [str(v) for v in
                                               sig[lo:lo + 8]])
                        .encode()).hexdigest()
            for bi, lo in ((0, 0), (1, 8))]


def test_q226_incremental_near_dedup_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.dedup import (
        q226_incremental_near_dedup)

    meta = {row["doc_id"]: (row["lang"], row["source"])
            for _, row in docs.iterrows()}
    text = {row["doc_id"]: row["text"] for _, row in docs.iterrows()}
    batch_ids = sorted(d for d in text if d % _MOD == _REM)
    corpus_ids = sorted(d for d in text if d % _MOD != _REM)

    # tier 1: exact md5 + token-sort fingerprint anti-joins vs corpus
    def fp(txt: str) -> str:
        toks = sorted(set(txt.split(" ")))
        return hashlib.md5(" ".join(toks).encode()).hexdigest()

    corpus_eh = {hashlib.md5(text[d].encode()).hexdigest()
                 for d in corpus_ids}
    corpus_fp = {fp(text[d]) for d in corpus_ids}
    t1 = [d for d in batch_ids
          if hashlib.md5(text[d].encode()).hexdigest() not in corpus_eh
          and fp(text[d]) not in corpus_fp]
    t1_set = set(t1)

    # standing signature/band tables over the WHOLE corpus+batch
    sh = {d: _shingles(t) for d, t in text.items()}
    sig = {d: _minhash_sig(s) for d, s in sh.items() if s}
    buckets = defaultdict(list)
    for d, sg in sig.items():
        for key in _band_keys_py(sg):
            buckets[key].append(d)

    def jac(a: int, b: int) -> float:
        return len(sh[a] & sh[b]) / len(sh[a] | sh[b])

    # tier 2: batch survivors vs corpus, banded + exact-Jaccard verify
    drop_base = set()
    # tier 3: within-batch keep-first (drop the higher id of each pair)
    drop_within = set()
    for ids in buckets.values():
        t1_here = [d for d in ids if d in t1_set]
        if not t1_here:
            continue
        corpus_here = [d for d in ids if d % _MOD != _REM]
        for a in t1_here:
            for b in corpus_here:
                if jac(a, b) >= _THETA:
                    drop_base.add(a)
        for a in t1_here:
            for b in t1_here:
                if a < b and jac(a, b) >= _THETA:
                    drop_within.add(b)

    expected = {d: meta[d] for d in t1
                if d not in drop_base and d not in drop_within}
    got = {r.doc_id: (r.lang, r.source)
           for r in q226_incremental_near_dedup(spark, SF_ORACLE).collect()}
    assert got == expected
