"""Ninth batch of independent cross-checks — remaining text-pipeline
operators: q40 text stats, q41 token counts, q42 stopword lang-ID, q57
normalization, q65 blocklist, q68 chunking (48-stride / 64-window), q74
vocab top-k, q77 greedy 512-token sequence packing.  Same contract:
pure Python from parquet, no Spark, no DuckDB, no shared SQL."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import pandas as pd
import pytest

from .conftest import SF_ORACLE

TOL = 1e-5


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF_ORACLE}/documents.parquet")


# -------------------------------------------------------------- q40
def test_q40_text_stats_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import q40_text_stats

    per = defaultdict(lambda: [0, 0, 0, 0, 0.0])
    for _, row in docs.iterrows():
        toks = row["text"].split(" ")
        punct = sum(row["text"].count(ch) for ch in ".,")
        cell = per[row["lang"]]
        cell[0] += 1
        cell[1] += row["n_chars"]
        cell[2] += len(toks)
        cell[3] += len(set(toks))
        cell[4] += punct / max(len(row["text"]), 1)
    got = {r.lang: r for r in q40_text_stats(spark, SF_ORACLE).collect()}
    assert set(got) == set(per)
    for lang, (n, ch, tk, dt, pr) in per.items():
        r = got[lang]
        assert r.n_docs == n
        assert abs(r.avg_chars - ch / n) < TOL
        assert abs(r.avg_tokens - tk / n) < TOL
        assert abs(r.avg_distinct_tokens - dt / n) < TOL
        assert abs(r.punct_ratio - pr / n) < TOL


# -------------------------------------------------------------- q41
def test_q41_token_count_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q41_token_count)

    per = defaultdict(lambda: [0, 0, set()])
    for _, row in docs.iterrows():
        cell = per[row["source"]]
        cell[0] += len(row["text"].split(" "))
        cell[1] += math.ceil(len(row["text"]) / 4.0)
        cell[2].update(row["text"].split(" "))
    got = {r.source: r for r in q41_token_count(spark, SF_ORACLE).collect()}
    assert set(got) == set(per)
    for src, (ws, bpe, vocab) in per.items():
        r = got[src]
        assert r.total_tokens == ws
        assert r.total_bpe_est == bpe
        assert r.n_distinct_tokens == len(vocab)


# -------------------------------------------------------------- q42
def test_q42_lang_id_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import q42_lang_id

    MARKERS = {"en": {"the", "a", "of", "and"},
               "de": {"der", "die", "das", "und"},
               "fr": {"le", "la", "les", "et"},
               "es": {"el", "los", "las", "y"}}
    conf = Counter()
    for _, row in docs.iterrows():
        toks = set(row["text"].split(" "))
        s = {k: len(toks & v) for k, v in MARKERS.items()}
        if max(s.values()) == 0:
            pred = "und"
        elif s["en"] >= max(s["de"], s["fr"], s["es"]):
            pred = "en"
        elif s["de"] >= max(s["fr"], s["es"]):
            pred = "de"
        elif s["fr"] >= s["es"]:
            pred = "fr"
        else:
            pred = "es"
        conf[(row["lang"], pred)] += 1
    got = {(r.lang, r.pred_lang): r.n_docs
           for r in q42_lang_id(spark, SF_ORACLE).collect()}
    assert got == dict(conf)


# -------------------------------------------------------------- q57
def test_q57_normalize_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q57_normalize_text)

    per = defaultdict(lambda: [0, set()])
    for txt in docs.text:
        n = re.sub(r"\s+", " ", re.sub(r"[.,!?;:]", "", txt.lower())).strip()
        cell = per[len(n) % 10]
        cell[0] += 1
        cell[1].add(hashlib.md5(n.encode()).hexdigest())
    got = {r.len_mod: (r.n_docs, r.n_distinct)
           for r in q57_normalize_text(spark, SF_ORACLE).collect()}
    assert got == {k: (v[0], len(v[1])) for k, v in per.items()}


# -------------------------------------------------------------- q65
def test_q65_blocklist_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q65_blocklist_filter)

    BLOCK = {"slow", "error", "drop"}
    per = defaultdict(lambda: [0, 0])
    for _, row in docs.iterrows():
        blocked = bool(set(row["text"].split(" ")) & BLOCK)
        per[row["lang"]][int(blocked)] += 1
    got = {r.lang: (r.n_kept, r.n_removed)
           for r in q65_blocklist_filter(spark, SF_ORACLE).collect()}
    assert got == {k: tuple(v) for k, v in per.items()}


# -------------------------------------------------------------- q68
def test_q68_chunking_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q68_chunk_documents)

    expected = {}
    for _, row in docs.iterrows():
        toks = [t for t in row["text"].split(" ") if t != ""]
        if not toks:
            continue
        for cid, start in enumerate(range(0, len(toks), 48)):
            chunk = toks[start:start + 64]
            expected[(row["doc_id"], cid)] = (" ".join(chunk), len(chunk))
    got = {(r.doc_id, r.chunk_id): (r.chunk_text, r.n_tokens)
           for r in q68_chunk_documents(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q74
def test_q74_vocab_topk_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import q74_vocab_topk

    occ, df = Counter(), Counter()
    for _, row in docs.iterrows():
        toks = [t for t in row["text"].split(" ") if t != ""]
        occ.update(toks)
        df.update(set(toks))
    top = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = q74_vocab_topk(spark, SF_ORACLE).collect()
    assert [(r.token, r.n_occurrences, r.n_docs) for r in got] == [
        (t, n, df[t]) for t, n in top]


# -------------------------------------------------------------- q77
def test_q77_packing_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q77_pack_sequences)

    expected = {}
    for shard in range(32):
        g = docs[docs.doc_id % 32 == shard].sort_values("doc_id")
        bin_idx, cum = 0, 0
        for pos, (_, row) in enumerate(g.iterrows()):
            n = len(row["text"].split(" "))
            if pos == 0:
                bin_idx, cum = 0, n
            elif cum + n > 512:
                bin_idx, cum = bin_idx + 1, n
            else:
                cum += n
            expected[row["doc_id"]] = (shard, bin_idx, n)
    got = {r.doc_id: (r.shard, r.bin_idx, r.n_tokens)
           for r in q77_pack_sequences(spark, SF_ORACLE).collect()}
    assert got == expected
