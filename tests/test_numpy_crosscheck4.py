"""Fourth batch of independent cross-checks: the window's top slots and
the shared-LSH consumers — q29 (as-of join), q112 (SCD2 intervals, the
round-5 red row), q150 (HHI), q158 (session paths), q164 (RFM ntiles),
q168 (dedup cost model), q179 (hapax), q199 (dup/quality linkage,
including a full pure-Python MinHash-LSH pair reconstruction).  Same
contract as batches 1-3: pandas/numpy from parquet, no Spark, no DuckDB,
no shared SQL."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import pandas as pd
import pytest

from .conftest import SF_ORACLE
from .test_numpy_crosscheck import _quality, _toks
from .test_numpy_crosscheck3 import _sessionize

TOL = 1e-5


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF_ORACLE}/documents.parquet")


@pytest.fixture(scope="module")
def events():
    return pd.read_parquet(f"{SF_ORACLE}/events.parquet")


def _us(series) -> pd.Series:
    return pd.to_datetime(series).astype("datetime64[us]").astype("int64")


# -------------------------------------------------------------- q29
def test_q29_asof_join_vs_pandas(spark, events):
    from spatial_data_engineering_spark.operators.relational import (
        q29_asof_join)

    e = events.copy()
    e["us"] = _us(e.ts)
    signups = e[e.event_type == "signup"][["user_id", "us"]]
    by_user = {u: sorted(g.us.tolist()) for u, g in signups.groupby("user_id")}
    import bisect

    expected = {}
    for _, row in e.iterrows():
        ts_list = by_user.get(row["user_id"], [])
        i = bisect.bisect_right(ts_list, row["us"])
        expected[row["event_id"]] = ts_list[i - 1] if i else None
    got = {r.event_id: r.last_signup_us
           for r in q29_asof_join(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q112
def test_q112_scd2_vs_pandas(spark, events):
    from spatial_data_engineering_spark.operators.analytics import (
        q112_scd2_intervals)

    e = events.sort_values(["user_id", "ts", "event_id"]).copy()
    e["us"] = _us(e.ts)
    rows = []
    for user, g in e.groupby("user_id", sort=False):
        run_id, prev = 0, object()
        runs: dict[int, list] = {}
        for _, r in g.iterrows():
            if r["event_type"] != prev:
                run_id += 1
                prev = r["event_type"]
            runs.setdefault(run_id, []).append(r)
        ordered = sorted(runs)
        for idx, rid in enumerate(ordered):
            rs = runs[rid]
            nxt = (min(r["us"] for r in runs[ordered[idx + 1]])
                   if idx + 1 < len(ordered) else None)
            rows.append((user, rid, rs[0]["event_type"],
                         min(r["us"] for r in rs), nxt, len(rs)))
    expected = sorted(rows)
    got = sorted((r.user_id, r.run_id, r.event_type, r.valid_from_us,
                  r.valid_to_us, r.n_events)
                 for r in q112_scd2_intervals(spark, SF_ORACLE).collect())
    assert got == expected


# -------------------------------------------------------------- q150
def test_q150_hhi_vs_pandas(spark):
    from spatial_data_engineering_spark.operators.relational import (
        q150_hhi_concentration)

    o = pd.read_parquet(f"{SF_ORACLE}/orders.parquet",
                        columns=["o_custkey", "o_totalprice"])
    c = pd.read_parquet(f"{SF_ORACLE}/customer.parquet",
                        columns=["c_custkey", "c_mktsegment"])
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    cr = j.groupby(["c_mktsegment", "o_custkey"])["o_totalprice"].sum()
    got = {r.c_mktsegment: r
           for r in q150_hhi_concentration(spark, SF_ORACLE).collect()}
    for seg, g in cr.groupby(level=0):
        shares = g / g.sum()
        r = got[seg]
        assert r.n_customers == len(g)
        assert abs(r.hhi - (shares ** 2).sum()) < TOL
        assert abs(r.top_share - shares.max()) < TOL


# -------------------------------------------------------------- q158
def test_q158_session_paths_vs_pandas(spark, events):
    from spatial_data_engineering_spark.operators.analytics import (
        q158_session_paths)

    e = _sessionize(events)
    e["rn"] = e.groupby(["user_id", "sid"]).cumcount() + 1
    paths = Counter(
        ">".join(g.sort_values("rn").event_type.tolist())
        for _, g in e[e.rn <= 3].groupby(["user_id", "sid"]))
    top = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = sorted(q158_session_paths(spark, SF_ORACLE).collect(),
                 key=lambda r: r.rk)
    assert [(r.path, r.n_sessions) for r in got] == top


# -------------------------------------------------------------- q164
def _ntile4(keys: list) -> dict:
    """NTILE(4) over rows pre-sorted by key: first (n mod 4) buckets get
    ceil(n/4) rows — the SQL-standard allocation."""
    n = len(keys)
    base, extra = divmod(n, 4)
    out, start = {}, 0
    for b in range(1, 5):
        size = base + (1 if b <= extra else 0)
        for k in keys[start:start + size]:
            out[k] = b
        start += size
    return out


def test_q164_rfm_vs_pandas(spark):
    from spatial_data_engineering_spark.operators.relational import (
        q164_rfm_segments)

    o = pd.read_parquet(f"{SF_ORACLE}/orders.parquet",
                        columns=["o_custkey", "o_orderdate", "o_totalprice"])
    o["d"] = pd.to_datetime(o.o_orderdate)
    mx = o.d.max()
    rfm = o.groupby("o_custkey").agg(
        recency=("d", lambda s: (mx - s.max()).days),
        frequency=("d", "size"),
        monetary=("o_totalprice", "sum")).reset_index()
    r_rank = _ntile4(
        rfm.sort_values(["recency", "o_custkey"]).o_custkey.tolist())
    f_rank = _ntile4(rfm.sort_values(
        ["frequency", "o_custkey"], ascending=[False, True])
        .o_custkey.tolist())
    m_rank = _ntile4(rfm.sort_values(
        ["monetary", "o_custkey"], ascending=[False, True])
        .o_custkey.tolist())
    agg = defaultdict(lambda: [0, 0.0, None, None])
    for _, row in rfm.iterrows():
        k = (r_rank[row.o_custkey], f_rank[row.o_custkey],
             m_rank[row.o_custkey])
        cell = agg[k]
        cell[0] += 1
        cell[1] += row.monetary
        cell[2] = row.recency if cell[2] is None else min(cell[2], row.recency)
        cell[3] = row.recency if cell[3] is None else max(cell[3], row.recency)
    got = {(r.r, r.f, r.m): r for r in q164_rfm_segments(spark, SF_ORACLE).collect()}
    assert set(got) == set(agg)
    for k, (n, spend, mn, mx_) in agg.items():
        r = got[k]
        assert r.n_customers == n
        assert abs(r.total_spend - spend) < max(1e-4 * spend, 1e-3)
        assert (r.min_recency, r.max_recency) == (mn, mx_)


# -------------------------------------------------------------- q168
def test_q168_cost_model_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.dedup import (
        q168_dedup_cost_model)

    df = Counter()
    for _, row in docs.iterrows():
        txt = row["text"]
        upper = max(len(txt) - 7, 1)
        for sh in {txt[i:i + 8] for i in range(upper)}:
            df[sh] += 1
    got = {r.cap: r for r in q168_dedup_cost_model(spark, SF_ORACLE).collect()}
    for cap in (5, 10, 20, 50):
        blocked = sum(1 for v in df.values() if v > cap)
        pairs = sum(min(v, cap) * (min(v, cap) - 1) // 2 for v in df.values())
        r = got[cap]
        assert r.n_shingles == len(df)
        assert r.n_blocked == blocked
        assert r.max_candidate_pairs == pairs


# -------------------------------------------------------------- q179
def test_q179_hapax_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q179_hapax_ratio)

    freq = Counter(t for txt in docs.text for t in _toks(txt))
    per_source = defaultdict(lambda: [0, 0])
    for _, row in docs.iterrows():
        for t in _toks(row["text"]):
            per_source[row["source"]][0] += 1
            if freq[t] == 1:
                per_source[row["source"]][1] += 1
    got = {r.source: r for r in q179_hapax_ratio(spark, SF_ORACLE).collect()}
    assert set(got) == set(per_source)
    for src, (n_tok, n_hapax) in per_source.items():
        r = got[src]
        assert (r.n_tokens, r.n_hapax) == (n_tok, n_hapax)
        assert abs(r.hapax_ratio - round(n_hapax / n_tok, 6)) < TOL


# -------------------------------------------------------------- q199
def test_q199_dup_quality_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q199_dup_quality_link)
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
    members = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = ids[i], ids[j]
                jac = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
                if jac >= 0.6:
                    members.add(a)
                    members.add(b)

    d = docs.copy()
    d["quality"] = d.apply(_quality, axis=1)
    d["status"] = d.doc_id.map(lambda k: "dup" if k in members else "unique")
    got = {r.status: r for r in q199_dup_quality_link(spark, SF_ORACLE).collect()}
    for status, g in d.groupby("status"):
        r = got[status]
        assert r.n_docs == len(g)
        assert abs(r.avg_quality - g.quality.mean()) < TOL
        assert abs(r.min_quality - g.quality.min()) < TOL
        assert abs(r.max_quality - g.quality.max()) < TOL
