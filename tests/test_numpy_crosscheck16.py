"""Sixteenth batch of independent cross-checks: q07 month spine, q19
hourly windows, q96 per-doc bigram lift, q105 lone-returner correlated
subqueries, q107 line dedup, q122 grouping sets, q126 revenue share,
q132 skew report.  Same contract: pure Python/pandas from parquet, no
Spark, no DuckDB, no shared SQL."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import pandas as pd
import pytest

from .conftest import SF_ORACLE

TOL = 1e-5


def _close(a, b):
    return abs(a - b) <= max(abs(b) * 1e-9, TOL)


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF_ORACLE}/documents.parquet")


# -------------------------------------------------------------- q07
def test_q07_month_spine_vs_pandas(spark):
    from spatial_data_engineering_spark.operators.relational import (
        q07_month_spine)

    o = pd.read_parquet(f"{SF_ORACLE}/orders.parquet",
                        columns=["o_orderdate"])
    monthly = pd.to_datetime(o.o_orderdate).dt.strftime("%Y-%m") \
        .value_counts().to_dict()
    spine = [d.strftime("%Y-%m")
             for d in pd.date_range("1994-01-01", "2002-12-01", freq="MS")]
    expected = {m: monthly.get(m) for m in spine}
    got = {r.month: r.n_orders for r in q07_month_spine(spark, SF_ORACLE).collect()}
    assert got == expected  # empty months present with NULL counts


# -------------------------------------------------------------- q19
def test_q19_hourly_window_vs_pandas(spark):
    from spatial_data_engineering_spark.operators.relational import (
        q19_hourly_window)

    e = pd.read_parquet(f"{SF_ORACLE}/events.parquet",
                        columns=["ts", "value"])
    e["h"] = pd.to_datetime(e.ts).dt.floor("h").dt.strftime(
        "%Y-%m-%d %H:%M:%S")
    agg = e.groupby("h").agg(n=("value", "size"), sv=("value", "sum"))
    got = {r.window_start: r for r in q19_hourly_window(spark, SF_ORACLE).collect()}
    assert set(got) == set(agg.index)
    for h, row in agg.iterrows():
        assert got[h].n_events == row.n
        assert _close(got[h].sum_value, row.sv)


# -------------------------------------------------------------- q96
def test_q96_doc_bigram_lift_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q96_doc_bigram_lift)

    uni, bi = Counter(), Counter()
    doc_bgs = {}
    for _, row in docs.iterrows():
        ts = row["text"].split(" ")
        uni.update(ts)
        bgs = [ts[i] + " " + ts[i + 1] for i in range(len(ts) - 1)]
        bi.update(bgs)
        doc_bgs[row["doc_id"]] = bgs
    n1, n2 = sum(uni.values()), sum(bi.values())
    lift = {bg: (c / n2) / ((uni[bg.split(" ", 1)[0]] / n1)
                            * (uni[bg.split(" ", 1)[1]] / n1))
            for bg, c in bi.items()}
    got = {r.doc_id: r for r in q96_doc_bigram_lift(spark, SF_ORACLE).collect()}
    for d, bgs in doc_bgs.items():
        if not bgs:
            assert d not in got
            continue
        r = got[d]
        assert r.n_bigrams == len(bgs)
        assert abs(r.avg_lift
                   - round(sum(lift[b] for b in bgs) / len(bgs), 6)) < 1e-4


# -------------------------------------------------------------- q105
def test_q105_lone_returner_vs_python(spark):
    from spatial_data_engineering_spark.operators.subqueries import (
        q105_lone_returner)

    li = pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey", "l_returnflag"])
    by_order = defaultdict(set)
    r_by_order = defaultdict(set)
    for _, row in li.iterrows():
        by_order[row.l_orderkey].add(row.l_suppkey)
        if row.l_returnflag == "R":
            r_by_order[row.l_orderkey].add(row.l_suppkey)
    counts = defaultdict(set)
    for ok, r_supps in r_by_order.items():
        for s in r_supps:
            if (by_order[ok] - {s}) and not (r_supps - {s}):
                counts[s].add(ok)
    expected = {s: len(oks) for s, oks in counts.items()}
    got = {r.l_suppkey: r.n_orders
           for r in q105_lone_returner(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q107
def test_q107_line_dedup_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q107_line_dedup)

    ex = defaultdict(list)  # doc -> line hashes (with multiplicity)
    owner = {}
    for _, row in docs.sort_values("doc_id").iterrows():
        words = row["text"].split(" ")
        n_lines = -(-len(words) // 10)
        for i in range(n_lines):
            h = hashlib.md5(
                " ".join(words[i * 10:i * 10 + 10]).encode()).hexdigest()
            ex[row["doc_id"]].append(h)
            if h not in owner or row["doc_id"] < owner[h]:
                owner[h] = row["doc_id"]
    got = {r.doc_id: (r.n_lines, r.n_kept)
           for r in q107_line_dedup(spark, SF_ORACLE).collect()}
    expected = {d: (len(hs), len({h for h in hs if owner[h] == d}))
                for d, hs in ex.items()}
    assert got == expected


# -------------------------------------------------------------- q122
def test_q122_grouping_sets_vs_pandas(spark):
    from spatial_data_engineering_spark.operators.relational import (
        q122_grouping_sets)

    li = pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet",
                         columns=["l_returnflag", "l_linestatus",
                                  "l_quantity"])
    got = {(r.l_returnflag, r.l_linestatus, r.g_rf, r.g_ls): r
           for r in q122_grouping_sets(spark, SF_ORACLE).collect()}
    for (rf, ls), g in li.groupby(["l_returnflag", "l_linestatus"]):
        r = got[(rf, ls, 0, 0)]
        assert r.n_items == len(g)
        assert _close(r.sum_qty, g.l_quantity.sum())
    for rf, g in li.groupby("l_returnflag"):
        r = got[(rf, None, 0, 1)]
        assert r.n_items == len(g)
        assert _close(r.sum_qty, g.l_quantity.sum())
    r = got[(None, None, 1, 1)]
    assert r.n_items == len(li)
    assert _close(r.sum_qty, li.l_quantity.sum())
    n_cells = li.groupby(["l_returnflag", "l_linestatus"]).ngroups
    assert len(got) == n_cells + li.l_returnflag.nunique() + 1


# -------------------------------------------------------------- q126
def test_q126_revenue_share_vs_pandas(spark):
    from spatial_data_engineering_spark.operators.subqueries import (
        q126_revenue_share)

    li = pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet",
                         columns=["l_suppkey", "l_extendedprice",
                                  "l_discount"])
    li["rev"] = li.l_extendedprice * (1 - li.l_discount)
    per = li.groupby("l_suppkey")["rev"].sum()
    total = per.sum()
    expected = {s: (r, round(r / total, 9))
                for s, r in per.items() if r > 0.001 * total}
    got = {r.l_suppkey: (r.revenue, r.share)
           for r in q126_revenue_share(spark, SF_ORACLE).collect()}
    assert set(got) == set(expected)
    for s, (rev, share) in expected.items():
        assert _close(got[s][0], rev)
        assert abs(got[s][1] - share) < TOL


# -------------------------------------------------------------- q132
def test_q132_skew_report_vs_pandas(spark):
    from spatial_data_engineering_spark.operators.relational import (
        q132_skew_report)

    li = pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet",
                         columns=["l_orderkey"])
    freq = li.l_orderkey.value_counts()
    total, n_keys = freq.sum(), len(freq)
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = {r.l_orderkey: r for r in q132_skew_report(spark, SF_ORACLE).collect()}
    assert set(got) == {k for k, _ in ranked}
    for k, n in ranked:
        r = got[k]
        assert r.n_rows == n
        assert abs(r.share - round(n / total, 9)) < TOL
        assert abs(r.x_uniform - round(n * n_keys / total, 6)) < TOL
