"""Pure-Python replay of the composed curation pipeline (q212/q213) —
the third-way check (no Spark expressions, no DuckDB) for the round-8
end-to-end queries, same standard as every other oracled query.

Every stage is recomputed from the parquet bytes with hashlib/sets:
exact keepers, the full MinHash-LSH pair set (reusing the q47 replay
helpers), shingle-overlap decontamination, the survivor-distribution
quantile cut, md5-rank balancing, bucket split and the greedy pack.
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import numpy as np
import pandas as pd
import pytest

from .conftest import SF_ORACLE
from .test_numpy_crosscheck import _md5_bucket, _minhash_sig, _quality
from .test_numpy_crosscheck7 import _shingles

TOL = 1e-9
_P = 2147483647


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF_ORACLE}/documents.parquet")


def _doc_key(doc_id: int) -> int:
    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    return int(h[:8], 16) % _P


def _near_dup_losers(texts: dict[int, str]) -> set[int]:
    """b_id side of the q47 pair set, replayed with the q47 helpers."""
    sh = {d: _shingles(t) for d, t in texts.items()}
    sig = {d: _minhash_sig(s) for d, s in sh.items() if s}
    buckets = defaultdict(list)
    for d, sg in sig.items():
        for bi, lo in ((0, 0), (1, 8)):
            key = hashlib.md5(
                "|".join([f"b{bi}"] + [str(v) for v in sg[lo:lo + 8]])
                .encode()).hexdigest()
            buckets[key].append(d)
    losers: set[int] = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = ids[i], ids[j]
                if len(sh[a] & sh[b]) / len(sh[a] | sh[b]) >= 0.6:
                    losers.add(b)
    return losers


def _replay_stages(docs: pd.DataFrame) -> list[tuple[str, list[int]]]:
    """[(stage_name, surviving doc_ids)] — plans/curation.py in sets."""
    rows = {int(r.doc_id): r for _, r in docs.iterrows()}
    all_ids = sorted(rows)
    stages = [("input", all_ids)]

    # 1. exact dedup: min doc_id per md5(text)
    by_hash: dict[str, int] = {}
    for d in all_ids:
        h = hashlib.md5(rows[d].text.encode()).hexdigest()
        by_hash.setdefault(h, d)
    c1 = sorted(by_hash.values())
    stages.append(("exact_dedup", c1))

    # 2. near-dup: drop the b_id of every confirmed pair (corpus-wide
    # pair set, exactly near_dup_pairs' contract)
    losers = _near_dup_losers({d: rows[d].text for d in all_ids})
    c2 = [d for d in c1 if d not in losers]
    stages.append(("near_dedup", c2))

    # 3. decontamination: flagged by shingle overlap with the benchmark
    # set, plus the benchmark members themselves
    bench_sh: set[str] = set()
    for d in all_ids:
        if d % 97 == 0:
            bench_sh |= _shingles(rows[d].text)
    c3 = []
    for d in c2:
        if d % 97 == 0:
            continue
        sh = _shingles(rows[d].text)
        if len(sh & bench_sh) / len(sh) >= 0.45:
            continue
        c3.append(d)
    stages.append(("decontaminated", c3))

    # 4. per-language p25 quality cut on the survivors
    by_lang: dict[str, list[int]] = defaultdict(list)
    for d in c3:
        by_lang[rows[d].lang].append(d)
    qual = {d: _quality(rows[d]) for d in c3}
    c4 = []
    for lang, ids in by_lang.items():
        thr = np.percentile([qual[d] for d in ids], 25, method="linear")
        c4.extend(d for d in ids if qual[d] >= thr)
    c4.sort()
    stages.append(("quality_cut", c4))

    # 5. balancing: keep iff md5-rank u < ceil(rate * P)
    counts = defaultdict(int)
    for d in c4:
        counts[rows[d].lang] += 1
    c5 = [d for d in c4
          if _doc_key(d) < math.ceil(
              min(1.0, 100.0 / counts[rows[d].lang]) * _P)]
    stages.append(("balanced", c5))
    return stages


def test_q213_curation_funnel_vs_python(spark, docs):
    from spatial_data_engineering_spark.plans.curation import (
        q213_curation_funnel)

    rows = {int(r.doc_id): r for _, r in docs.iterrows()}
    got = {r.stage: r
           for r in q213_curation_funnel(spark, SF_ORACLE).collect()}
    stages = _replay_stages(docs)
    assert [s for s, _ in stages] == list(got)
    prev = None
    for idx, (name, ids) in enumerate(stages):
        r = got[name]
        assert r.stage_idx == idx
        assert r.n_docs == len(ids), name
        assert r.n_tokens == sum(
            len(rows[d].text.split(" ")) for d in ids), name
        exp_q = sum(_quality(rows[d]) for d in ids) / len(ids)
        assert abs(r.avg_quality - exp_q) < 1e-6, name
        if prev is not None:  # the funnel only ever narrows
            assert r.n_docs <= prev
        prev = r.n_docs


def test_q212_curation_shards_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        _PACK_CAP, _PACK_SHARDS)
    from spatial_data_engineering_spark.plans.curation import (
        q212_curation_shards)

    rows = {int(r.doc_id): r for _, r in docs.iterrows()}
    c5 = _replay_stages(docs)[-1][1]

    groups: dict[tuple[str, int], list[int]] = defaultdict(list)
    for d in c5:
        b = _md5_bucket(d)
        split = "train" if b < 80 else "val" if b < 90 else "test"
        groups[(split, d % _PACK_SHARDS)].append(d)

    expected = {}
    for key, ids in groups.items():
        ids.sort()
        n_bins, cum, n_tokens = 1, 0, 0
        for i, d in enumerate(ids):
            n = len(rows[d].text.split(" "))
            n_tokens += n
            if i == 0:
                cum = n
            elif cum + n > _PACK_CAP:
                n_bins += 1
                cum = n
            else:
                cum += n
        expected[key] = (len(ids), n_bins, n_tokens)

    got = {(r.split, r.shard): (r.n_docs, r.n_bins, r.n_tokens)
           for r in q212_curation_shards(spark, SF_ORACLE).collect()}
    assert got == expected
