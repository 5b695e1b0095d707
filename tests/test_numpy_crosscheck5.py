"""Fifth batch of independent cross-checks — the remaining round-6
window queries: q142 q144 q145 q146 q151 q157 q160 q162 q165 q166 q169
q171 q173 q175 q177 q178.  With this batch every window query except
the composition-only rows has a third, formula-independent
implementation.  Same contract: pandas/numpy from parquet, no Spark,
no DuckDB, no shared SQL."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import pandas as pd
import pytest

from .conftest import SF_ORACLE
from .test_numpy_crosscheck import _quality, _toks
from .test_numpy_crosscheck4 import _ntile4, _us

TOL = 1e-5


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF_ORACLE}/documents.parquet")


@pytest.fixture(scope="module")
def events():
    return pd.read_parquet(f"{SF_ORACLE}/events.parquet")


def _md5_h(key) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % 2147483647


# -------------------------------------------------------------- q142
def test_q142_stopwords_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q142_stopword_discovery)

    df, cf = Counter(), Counter()
    for txt in docs.text:
        toks = _toks(txt)
        cf.update(toks)
        df.update(set(toks))
    n_docs = len(docs)
    expected = {t: (df[t], cf[t], round(df[t] / n_docs, 6))
                for t in df if df[t] * 2 > n_docs}
    got = {r.token: (r.df, r.cf, r.df_ratio)
           for r in q142_stopword_discovery(spark, SF_ORACLE).collect()}
    assert set(got) == set(expected)
    for t, (d, c, ratio) in expected.items():
        assert got[t][:2] == (d, c)
        assert abs(got[t][2] - ratio) < TOL


# -------------------------------------------------------------- q144
def test_q144_training_order_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q144_training_order)

    h = {d: _md5_h(d) for d in docs.doc_id}
    by_shard = defaultdict(list)
    for d, hv in h.items():
        by_shard[hv % 8].append((hv, d))
    expected = {}
    for shard, items in by_shard.items():
        for rk, (_, d) in enumerate(sorted(items), start=1):
            expected[d] = (shard, (rk - 1) * 8 + shard)
    got = {r.doc_id: (r.shard, r.step)
           for r in q144_training_order(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q145
def test_q145_curriculum_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q145_curriculum_stages)

    d = docs.copy()
    d["quality"] = d.apply(_quality, axis=1)
    order = d.sort_values(["quality", "doc_id"],
                          ascending=[False, True]).doc_id.tolist()
    stage = _ntile4(order)
    d["stage"] = d.doc_id.map(stage)
    got = {r.stage: r for r in q145_curriculum_stages(spark, SF_ORACLE).collect()}
    for st, g in d.groupby("stage"):
        r = got[st]
        assert r.n_docs == len(g)
        assert abs(r.min_q - g.quality.min()) < TOL
        assert abs(r.max_q - g.quality.max()) < TOL
        assert abs(r.avg_q - g.quality.mean()) < TOL


# -------------------------------------------------------------- q146
def test_q146_vocab_overlap_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q146_vocab_overlap)

    vocab = defaultdict(set)
    for _, row in docs.iterrows():
        vocab[row["source"]].update(_toks(row["text"]))
    sources = sorted(vocab)
    expected = {}
    for i, a in enumerate(sources):
        for b in sources[i + 1:]:
            inter = len(vocab[a] & vocab[b])
            if inter:
                expected[(a, b)] = (
                    inter,
                    round(inter / (len(vocab[a]) + len(vocab[b]) - inter), 6))
    got = {(r.src_a, r.src_b): (r.n_common, r.jaccard)
           for r in q146_vocab_overlap(spark, SF_ORACLE).collect()}
    assert set(got) == set(expected)
    for k, (n, j) in expected.items():
        assert got[k][0] == n
        assert abs(got[k][1] - j) < TOL


# -------------------------------------------------------------- q151
def test_q151_returned_revenue_vs_pandas(spark):
    from spatial_data_engineering_spark.operators.relational import (
        q151_returned_revenue)

    li = pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet",
                         columns=["l_orderkey", "l_returnflag",
                                  "l_extendedprice", "l_discount"])
    o = pd.read_parquet(f"{SF_ORACLE}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    c = pd.read_parquet(f"{SF_ORACLE}/customer.parquet",
                        columns=["c_custkey", "c_name", "c_nationkey"])
    n = pd.read_parquet(f"{SF_ORACLE}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    j = (li[li.l_returnflag == "R"]
         .merge(o, left_on="l_orderkey", right_on="o_orderkey")
         .merge(c, left_on="o_custkey", right_on="c_custkey")
         .merge(n, left_on="c_nationkey", right_on="n_nationkey"))
    j["rev"] = j.l_extendedprice * (1 - j.l_discount)
    agg = (j.groupby(["c_custkey", "c_name", "n_name"])
           .agg(revenue=("rev", "sum"), n_items=("rev", "size"))
           .reset_index()
           .sort_values(["revenue", "c_custkey"], ascending=[False, True])
           .head(20))
    got = q151_returned_revenue(spark, SF_ORACLE).collect()
    assert [r.c_custkey for r in got] == agg.c_custkey.tolist()
    for r, (_, e) in zip(got, agg.iterrows()):
        assert (r.c_name, r.n_name, r.n_items) == (e.c_name, e.n_name,
                                                   e.n_items)
        assert abs(r.revenue - e.revenue) < max(1e-4 * e.revenue, 1e-3)


# -------------------------------------------------------------- q157
def test_q157_mix_rebalance_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q157_mix_rebalance)

    st = {src: sum(len(_toks(t)) for t in g.text)
          for src, g in docs.groupby("source")}
    tot, k = sum(st.values()), len(st)
    got = {r.source: r for r in q157_mix_rebalance(spark, SF_ORACLE).collect()}
    assert set(got) == set(st)
    for src, n_tok in st.items():
        r = got[src]
        assert r.n_tokens == n_tok
        assert abs(r.share - round(n_tok / tot, 6)) < TOL
        assert abs(r.keep_rate - round(min(1.0, (tot / k) / n_tok), 6)) < TOL
        assert r.expected_tokens == int(min(float(n_tok), tot / k))


# -------------------------------------------------------------- q160
def test_q160_lang_mislabel_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q160_lang_mislabel)

    groups = defaultdict(list)
    for _, row in docs.iterrows():
        fp = hashlib.md5(
            " ".join(sorted(set(row["text"].split(" ")))).encode()
        ).hexdigest()
        groups[fp].append((row["doc_id"], row["lang"]))
    expected = {}
    for fp, g in groups.items():
        langs = sorted({lang for _, lang in g})
        if len(langs) > 1:
            expected[fp] = (len(g), len(langs), ",".join(langs),
                            min(d for d, _ in g))
    got = {r.fp: (r.n_docs, r.n_langs, r.langs, r.keeper_doc_id)
           for r in q160_lang_mislabel(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q162
def test_q162_churn_vs_python(spark, events):
    from spatial_data_engineering_spark.operators.analytics import (
        q162_churn_rate)

    e = events.copy()
    e["us"] = _us(e.ts)
    last = e.groupby("user_id")["us"].max()
    mx = last.max()
    week = 7 * 86_400_000_000
    churned = int((last < mx - week).sum())
    rec = ((mx - last) / 86_400_000_000.0)
    got = q162_churn_rate(spark, SF_ORACLE).collect()[0]
    assert got.n_users == len(last)
    assert got.n_churned == churned
    assert abs(got.churn_rate - round(churned / len(last), 6)) < TOL
    assert abs(got.avg_recency_days - rec.mean()) < TOL


# -------------------------------------------------------------- q165
def test_q165_trade_volume_vs_pandas(spark):
    from spatial_data_engineering_spark.operators.relational import (
        q165_nation_trade_volume)

    li = pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey", "l_shipdate",
                                  "l_extendedprice", "l_discount"])
    o = pd.read_parquet(f"{SF_ORACLE}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    c = pd.read_parquet(f"{SF_ORACLE}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    s = pd.read_parquet(f"{SF_ORACLE}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    n = pd.read_parquet(f"{SF_ORACLE}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    sd = pd.to_datetime(li.l_shipdate)
    li = li[(sd >= "1995-01-01") & (sd < "1997-01-01")]
    j = (li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
         .merge(c, left_on="o_custkey", right_on="c_custkey")
         .merge(s, left_on="l_suppkey", right_on="s_suppkey"))
    j = j[((j.s_nationkey == 1) & (j.c_nationkey == 2))
          | ((j.s_nationkey == 2) & (j.c_nationkey == 1))]
    names = n.set_index("n_nationkey").n_name
    j["supp_nation"] = j.s_nationkey.map(names)
    j["cust_nation"] = j.c_nationkey.map(names)
    j["l_year"] = pd.to_datetime(j.l_shipdate).dt.year
    j["rev"] = j.l_extendedprice * (1 - j.l_discount)
    agg = j.groupby(["supp_nation", "cust_nation", "l_year"]).agg(
        revenue=("rev", "sum"), n_items=("rev", "size"))
    got = {(r.supp_nation, r.cust_nation, r.l_year): r
           for r in q165_nation_trade_volume(spark, SF_ORACLE).collect()}
    assert set(got) == set(agg.index)
    for k, e in agg.iterrows():
        assert got[k].n_items == e.n_items
        assert abs(got[k].revenue - e.revenue) < max(1e-4 * e.revenue, 1e-3)


# -------------------------------------------------------------- q166
def test_q166_market_share_vs_pandas(spark):
    from spatial_data_engineering_spark.operators.relational import (
        q166_market_share)

    li = pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])
    o = pd.read_parquet(f"{SF_ORACLE}/orders.parquet",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    p = pd.read_parquet(f"{SF_ORACLE}/part.parquet",
                        columns=["p_partkey", "p_type"])
    c = pd.read_parquet(f"{SF_ORACLE}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"])
    s = pd.read_parquet(f"{SF_ORACLE}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    n = pd.read_parquet(f"{SF_ORACLE}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"])
    r = pd.read_parquet(f"{SF_ORACLE}/region.parquet",
                        columns=["r_regionkey", "r_name"])
    rk = r[r.r_name == r.r_name.min()].r_regionkey.iloc[0]
    pt = p.p_type.min()
    cn = n[n.n_regionkey == rk].n_nationkey
    j = (li.merge(p[p.p_type == pt], left_on="l_partkey",
                  right_on="p_partkey")
         .merge(o, left_on="l_orderkey", right_on="o_orderkey")
         .merge(c, left_on="o_custkey", right_on="c_custkey")
         .merge(s, left_on="l_suppkey", right_on="s_suppkey"))
    j = j[j.c_nationkey.isin(set(cn))]
    j["o_year"] = pd.to_datetime(j.o_orderdate).dt.year
    j["volume"] = j.l_extendedprice * (1 - j.l_discount)
    got = {r_.o_year: r_ for r_ in q166_market_share(spark, SF_ORACLE).collect()}
    agg = j.groupby("o_year").apply(
        lambda g: (g.volume[g.s_nationkey == 1].sum(), g.volume.sum()),
        include_groups=False)
    assert set(got) == set(agg.index)
    for year, (nv, tv) in agg.items():
        r_ = got[year]
        assert abs(r_.nation_volume - nv) < max(1e-4 * max(nv, 1), 1e-3)
        assert abs(r_.total_volume - tv) < max(1e-4 * tv, 1e-3)
        assert abs(r_.mkt_share - round(nv / tv, 6)) < TOL


# -------------------------------------------------------------- q169
def test_q169_vocab_coverage_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q169_vocab_coverage)

    tf = Counter(t for txt in docs.text for t in _toks(txt))
    ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(tf.values())
    got = {r.vocab_size: r for r in q169_vocab_coverage(spark, SF_ORACLE).collect()}
    for k in (10, 100, 1000, 10000):
        covered = sum(n for _, n in ranked[:k])
        r = got[k]
        assert r.tokens_covered == covered
        assert abs(r.coverage - round(covered / total, 6)) < TOL
        assert r.n_types == len(tf)


# -------------------------------------------------------------- q171
def test_q171_dup_degree_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.clustering import (
        q171_dup_degree_distribution)
    from .test_numpy_crosscheck import _minhash_sig

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
    deg = Counter()
    seen = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = ids[i], ids[j]
                if (a, b) in seen:
                    continue
                seen.add((a, b))
                jac = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
                if jac >= 0.6:
                    deg[a] += 1
                    deg[b] += 1
    expected = Counter(deg.values())
    got = {r.degree: r.n_docs
           for r in q171_dup_degree_distribution(spark, SF_ORACLE).collect()}
    assert got == dict(expected)


# -------------------------------------------------------------- q173
def test_q173_reconciliation_vs_pandas(spark):
    from spatial_data_engineering_spark.operators.relational import (
        q173_order_reconciliation)

    li = pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount", "l_tax"])
    o = pd.read_parquet(f"{SF_ORACLE}/orders.parquet",
                        columns=["o_orderkey", "o_orderstatus",
                                 "o_totalprice"])
    li["net"] = li.l_extendedprice * (1 - li.l_discount) * (1 + li.l_tax)
    net = li.groupby("l_orderkey")["net"].sum()
    o = o.copy()
    o["net"] = o.o_orderkey.map(net)
    o["orphan"] = o.net.isna().astype(int)
    o["rel_delta"] = (o.o_totalprice - o.net).abs() / o.o_totalprice
    got = {r.o_orderstatus: r
           for r in q173_order_reconciliation(spark, SF_ORACLE).collect()}
    for st, g in o.groupby("o_orderstatus"):
        r = got[st]
        assert r.n_orders == len(g)
        assert r.n_orphans == int(g.orphan.sum())
        assert r.n_reconciled == int((g.rel_delta < 0.01).sum())
        assert abs(r.avg_rel_delta - g.rel_delta.mean()) < TOL
        assert abs(r.max_rel_delta - g.rel_delta.max()) < TOL


# -------------------------------------------------------------- q175
def test_q175_error_timeline_vs_pandas(spark, events):
    from spatial_data_engineering_spark.operators.analytics import (
        q175_error_rate_timeline)

    e = events.copy()
    e["day"] = pd.to_datetime(e.ts).dt.floor("D")
    days = e.groupby("day").agg(
        n=("event_type", "size"),
        n_err=("event_type", lambda s: int((s == "error").sum())))
    days = days.sort_index()
    days["rate"] = (days.n_err / days.n).round(6)
    days["delta"] = (days.rate - days.rate.shift()).round(6)
    got = {r.day: r for r in q175_error_rate_timeline(spark, SF_ORACLE).collect()}
    for day, e_row in days.iterrows():
        key = day.strftime("%Y-%m-%d")
        r = got[key]
        assert r.n_events == e_row.n
        assert abs(r.error_rate - e_row.rate) < TOL
        if pd.isna(e_row.delta):
            assert r.dod_delta is None
        else:
            assert abs(r.dod_delta - e_row.delta) < TOL


# -------------------------------------------------------------- q177
def test_q177_weekday_vs_pandas(spark, events):
    from spatial_data_engineering_spark.operators.analytics import (
        q177_weekday_seasonality)

    e = events.copy()
    e["day"] = pd.to_datetime(e.ts).dt.floor("D")
    days = e.groupby("day").size()
    # DuckDB/Spark dayofweek: 0 = Sunday; pandas dayofweek: 0 = Monday
    wd = (days.index.dayofweek + 1) % 7
    grand = days.mean()
    got = {r.weekday: r
           for r in q177_weekday_seasonality(spark, SF_ORACLE).collect()}
    for w in sorted(set(wd)):
        sub = days[wd == w]
        r = got[w]
        assert r.n_days == len(sub)
        assert abs(r.avg_daily - round(sub.mean(), 6)) < TOL
        assert abs(r.seasonal_index - round(sub.mean() / grand, 6)) < 1e-4


# -------------------------------------------------------------- q178
def test_q178_new_returning_vs_pandas(spark, events):
    from spatial_data_engineering_spark.operators.analytics import (
        q178_new_vs_returning)

    e = events.copy()
    e["day"] = pd.to_datetime(e.ts).dt.floor("D")
    active = e[["day", "user_id"]].drop_duplicates()
    fd = active.groupby("user_id")["day"].min()
    active = active.copy()
    active["fd"] = active.user_id.map(fd)
    got = {r.day: r for r in q178_new_vs_returning(spark, SF_ORACLE).collect()}
    for day, g in active.groupby("day"):
        r = got[day.strftime("%Y-%m-%d")]
        assert r.n_active == len(g)
        assert r.n_new == int((g.day == g.fd).sum())
        assert r.n_returning == int((g.day > g.fd).sum())
