"""Pure-Python replay of q224's span-level exact substring dedup — the
third-way check (no Spark expressions, no DuckDB SQL): hashlib md5 over
every length-L character gram, a plain dict occurrence count, and an
explicit interval merge, compared EXACTLY against the registered query's
rows.  Also pins the anchoring guarantee on a planted corpus: a shared
substring of length s >= L is reported as exactly one span of s chars.
"""

from __future__ import annotations

import hashlib
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from .conftest import SF_SMOKE


def _round6_half_up(x: float) -> float:
    """Spark's round(double, 6): HALF_UP over the double's shortest
    decimal repr (BigDecimal.valueOf semantics; Python's repr is the
    same shortest-roundtrip string), NOT Python round()'s half-even."""
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"),
                                           ROUND_HALF_UP))


def _python_span_stats(texts: dict[int, str], L: int):
    """{doc_id: (n_spans, dup_chars, max_span, dup_ratio)} by direct
    definition: positions covered by a length-L gram occurring >= 2
    times corpus-wide, interval-merged per doc."""
    grams: list[tuple[int, int, str]] = []  # (doc_id, pos1, md5hex)
    for doc_id, t in texts.items():
        if len(t) < L:
            continue
        for i in range(len(t) - L + 1):
            h = hashlib.md5(t[i:i + L].encode()).hexdigest()
            grams.append((doc_id, i + 1, h))
    counts = Counter(h for _, _, h in grams)
    out = {}
    bydoc: dict[int, list[int]] = {}
    for doc_id, pos, h in grams:
        if counts[h] >= 2:
            bydoc.setdefault(doc_id, []).append(pos)
    for doc_id, poss in bydoc.items():
        poss.sort()
        spans = []
        s = e = poss[0]
        for p in poss[1:]:
            if p - e <= L:
                e = p
            else:
                spans.append((s, e + L - 1))
                s = e = p
        spans.append((s, e + L - 1))
        chars = [b - a + 1 for a, b in spans]
        n = len(texts[doc_id])
        # same arithmetic as both engines: double division then
        # HALF_UP at 6 decimals over the shortest repr
        ratio = _round6_half_up(sum(chars) * 1.0 / n)
        out[doc_id] = (len(spans), sum(chars), max(chars), ratio)
    return out


def _python_spans(texts: dict[int, str], L: int):
    """{doc_id: [(s, e), ...]} merged duplicated spans, 1-based
    inclusive — the raw-span twin of _python_span_stats."""
    grams: list[tuple[int, int, str]] = []
    for doc_id, t in texts.items():
        if len(t) < L:
            continue
        for i in range(len(t) - L + 1):
            grams.append((doc_id, i + 1,
                          hashlib.md5(t[i:i + L].encode()).hexdigest()))
    counts = Counter(h for _, _, h in grams)
    bydoc: dict[int, list[int]] = {}
    for doc_id, pos, h in grams:
        if counts[h] >= 2:
            bydoc.setdefault(doc_id, []).append(pos)
    out: dict[int, list[tuple[int, int]]] = {}
    for doc_id, poss in bydoc.items():
        poss.sort()
        spans, s, e = [], poss[0], poss[0]
        for p in poss[1:]:
            if p - e <= L:
                e = p
            else:
                spans.append((s, e + L - 1))
                s = e = p
        spans.append((s, e + L - 1))
        out[doc_id] = spans
    return out


def test_q224_vs_python_replay(spark):
    from spatial_data_engineering_spark.operators.dedup import (
        _SPAN_L, q224_exact_substring_dedup)

    docs = pd.read_parquet(SF_SMOKE + "/documents.parquet")
    expect = _python_span_stats(
        dict(zip(docs["doc_id"], docs["text"])), _SPAN_L)

    got = {
        r["doc_id"]: (r["n_dup_spans"], r["dup_chars"],
                      r["max_span_chars"], r["dup_ratio"])
        for r in q224_exact_substring_dedup(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(expect)
    for doc_id in expect:
        assert got[doc_id] == expect[doc_id], (doc_id, got[doc_id],
                                               expect[doc_id])


def test_q225_splice_vs_python_replay(spark):
    """q225_substring_dedup_materialize: the spliced text must equal a
    direct Python cut of the replay's own spans — string for string."""
    from spatial_data_engineering_spark.operators.dedup import (
        _SPAN_L, q225_substring_dedup_materialize)

    docs = pd.read_parquet(SF_SMOKE + "/documents.parquet")
    texts = dict(zip(docs["doc_id"], docs["text"]))
    spans = _python_spans(texts, _SPAN_L)

    def cut(t: str, sp: list[tuple[int, int]]) -> str:
        out, pos = [], 1
        for s, e in sp:
            out.append(t[pos - 1:s - 1])
            pos = e + 1
        out.append(t[pos - 1:])
        return "".join(out)

    expect = {d: cut(t, spans.get(d, [])) for d, t in texts.items()}
    got = {r["doc_id"]: (r["clean_text"], r["n_chars_removed"])
           for r in q225_substring_dedup_materialize(
               spark, SF_SMOKE).collect()}
    assert set(got) == set(expect)
    for d, t in texts.items():
        assert got[d][0] == expect[d], d
        assert got[d][1] == len(t) - len(expect[d]), d


def test_q224_anchoring_guarantee_on_planted_corpus(spark):
    """Every shared substring of length >= L merges to ONE reported span
    covering exactly its characters — the anchoring + extension
    contract (Lee et al.'s ExactSubstr semantics at char granularity)."""
    from spatial_data_engineering_spark.operators.dedup import (
        _SPAN_L, substring_span_stats)

    # unique filler (no repeated 50-gram within or across): distinct
    # integers sharded by position and doc
    def filler(tag: str, n_chars: int) -> str:
        s = []
        i = 0
        while sum(len(x) + 1 for x in s) < n_chars:
            s.append(f"{tag}-{i:07d}")
            i += 1
        return " ".join(s)[:n_chars]

    shared = ("COPIED" * 20)[:120]  # 120 shared chars >= L
    rows = [
        (0, filler("a", 200) + shared + filler("b", 200)),
        (1, filler("c", 150) + shared + filler("d", 250)),
        (2, filler("e", 400)),  # no duplicated span at all
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in substring_span_stats(d, L=_SPAN_L).collect()}

    assert set(got) == {0, 1}  # doc 2 reports nothing
    for doc_id in (0, 1):
        r = got[doc_id]
        assert r["n_dup_spans"] == 1
        assert r["dup_chars"] == len(shared) == r["max_span_chars"]


def test_q225_oracle_parity_with_empty_and_null_text(spark, tmp_path):
    """r15 advice: a corpus containing an empty-text ('' ) or NULL-text
    document must keep q225's Spark-vs-DuckDB hash parity.  The
    oracle's chars CTE yields zero rows for such docs (generate_series
    over an empty/NULL length), so they never reach the clean CTE; the
    final join is LEFT + COALESCE so they survive with clean_text =
    text, exactly like the Spark side's when(sp.isNull, text)."""
    import duckdb
    import pandas as pd

    from spatial_data_engineering_spark.operators import dedup
    from .parity import compare

    shared = ("COPIED" * 20)[:120]

    def filler(tag: str, n_chars: int) -> str:
        s, i = [], 0
        while sum(len(x) + 1 for x in s) < n_chars:
            s.append(f"{tag}-{i:07d}")
            i += 1
        return " ".join(s)[:n_chars]

    pdf = pd.DataFrame({
        "doc_id": pd.Series([0, 1, 2, 3, 4], dtype="int64"),
        "text": [filler("a", 200) + shared + filler("b", 200),
                 filler("c", 150) + shared + filler("d", 250),
                 "",            # empty: zero chars rows in the oracle
                 None,          # NULL: ditto, and NULL-propagating stats
                 "short"],      # < L, non-empty: never in spans
    })
    src = tmp_path / "documents.parquet"
    pdf.to_parquet(src)

    got = dedup.QUERIES["q225_substring_dedup_materialize"](
        spark, str(tmp_path))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS "
            f"SELECT * FROM read_parquet('{src}')")
    want = con.sql(
        dedup.ORACLES["q225_substring_dedup_materialize"]).df()
    assert len(want) == 5  # the empty/NULL docs are present at all
    compare(got, want, "q225-empty-null-text")
