"""Fifteenth batch of independent cross-checks: q30 range join, q32
session windows, q37 array agg, q64 bag set ops, q72 hierarchical
rollup, q118 Efraimidis-Spirakis weighted sample, q124 incremental agg,
q131 per-user OLS trend.  Same contract: pure Python/pandas from
parquet, no Spark, no DuckDB, no shared SQL."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pandas as pd
import pytest

from .conftest import SF_ORACLE
from .test_numpy_crosscheck4 import _us

TOL = 1e-5


def _close(a, b):
    return abs(a - b) <= max(abs(b) * 1e-9, TOL)


@pytest.fixture(scope="module")
def events():
    return pd.read_parquet(f"{SF_ORACLE}/events.parquet")


# -------------------------------------------------------------- q30
def test_q30_range_join_vs_python(spark, events):
    from spatial_data_engineering_spark.operators.relational import (
        q30_range_join)

    e = events.copy()
    e["us"] = _us(e.ts)
    expected = Counter()
    for user, g in e.groupby("user_id"):
        rows = sorted(zip(g.event_id, g.us))
        for i, (ida, ta) in enumerate(rows):
            for idb, tb in rows:
                if ida < idb and abs(ta - tb) <= 60_000_000:
                    expected[user] += 1
    got = {r.user_id: r.n_close_pairs
           for r in q30_range_join(spark, SF_ORACLE).collect()}
    assert got == {k: v for k, v in expected.items()}


# -------------------------------------------------------------- q32
def test_q32_session_window_vs_pandas(spark, events):
    from spatial_data_engineering_spark.operators.relational import (
        q32_session_window)

    e = events.sort_values(["user_id", "ts", "event_id"]).copy()
    e["us"] = _us(e.ts)
    gap = e.groupby("user_id")["us"].diff()
    # q32 (Spark session_window semantics): a gap of EXACTLY 30 min
    # starts a new session (>=, unlike the q18 family's >)
    e["new_session"] = (gap.isna() | (gap >= 1_800_000_000)).astype(int)
    e["sid"] = e.groupby("user_id")["new_session"].cumsum()
    agg = e.groupby(["user_id", "sid"]).agg(
        start=("us", "min"), end=("us", "max"),
        n=("us", "size"), sv=("value", "sum"))
    expected = {}
    for (user, _), row in agg.iterrows():
        expected[(user, int(row.start))] = (
            int(row.end) + 1_800_000_000, int(row.n), row.sv)
    got = {(r.user_id, r.session_start_us):
           (r.session_end_us, r.n_events, r.sum_value)
           for r in q32_session_window(spark, SF_ORACLE).collect()}
    assert set(got) == set(expected)
    for k, (end, n, sv) in expected.items():
        assert got[k][0] == end and got[k][1] == n
        assert _close(got[k][2], sv)


# -------------------------------------------------------------- q37
def test_q37_array_agg_vs_pandas(spark):
    from spatial_data_engineering_spark.operators.relational import (
        q37_array_agg)

    li = pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet",
                         columns=["l_returnflag", "l_linestatus",
                                  "l_linenumber"])
    got = {r.l_returnflag: (r.statuses, r.linenumbers)
           for r in q37_array_agg(spark, SF_ORACLE).collect()}
    for flag, g in li.groupby("l_returnflag"):
        statuses = ",".join(sorted(set(g.l_linestatus)))
        nums = ",".join(sorted({str(n) for n in g.l_linenumber}))
        assert got[flag] == (statuses, nums)


# -------------------------------------------------------------- q64
def test_q64_bag_ops_vs_python(spark):
    from spatial_data_engineering_spark.operators.relational import (
        q64_bag_set_ops)

    li = pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet",
                         columns=["l_partkey", "l_shipdate", "l_orderkey"])
    li = li[li.l_orderkey <= 3000]
    sd = pd.to_datetime(li.l_shipdate)
    early = Counter(li[sd < "1997-01-01"].l_partkey)
    late = Counter(li[sd >= "1997-01-01"].l_partkey)
    expected = {}
    for pk in set(early) | set(late):
        diff = early[pk] - late[pk]
        if diff > 0:
            expected[("except_all", pk)] = diff
        inter = min(early[pk], late[pk])
        if inter > 0:
            expected[("intersect_all", pk)] = inter
    got = {(r.op, r.l_partkey): r.n
           for r in q64_bag_set_ops(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q72
def test_q72_rollup_vs_pandas(spark, events):
    from spatial_data_engineering_spark.operators.relational import (
        q72_hierarchical_rollup)

    e = events.copy()
    e["hour"] = pd.to_datetime(e.ts).dt.strftime("%Y-%m-%d %H")
    got = {(r.grain, r.bucket): (r.n_events, r.sum_value)
           for r in q72_hierarchical_rollup(spark, SF_ORACLE).collect()}
    hourly = e.groupby("hour").agg(n=("value", "size"), sv=("value", "sum"))
    for bucket, row in hourly.iterrows():
        assert got[("hour", bucket)][0] == row.n
        assert _close(got[("hour", bucket)][1], row.sv)
    e["day"] = e.hour.str[:10]
    daily = e.groupby("day").agg(n=("value", "size"), sv=("value", "sum"))
    for bucket, row in daily.iterrows():
        assert got[("day", bucket)][0] == row.n
        assert _close(got[("day", bucket)][1], row.sv)
    e["month"] = e.hour.str[:7]
    monthly = e.groupby("month").agg(n=("value", "size"), sv=("value", "sum"))
    for bucket, row in monthly.iterrows():
        assert got[("month", bucket)][0] == row.n
        assert _close(got[("month", bucket)][1], row.sv)
    assert len(got) == len(hourly) + len(daily) + len(monthly)


# -------------------------------------------------------------- q118
def test_q118_weighted_sample_vs_python(spark):
    from spatial_data_engineering_spark.operators.textops import (
        q118_weighted_sample)

    docs = pd.read_parquet(f"{SF_ORACLE}/documents.parquet",
                           columns=["source", "doc_id", "n_chars"])
    docs = docs[docs.n_chars > 0]
    expected = {}
    for src, g in docs.groupby("source"):
        keys = []
        for _, row in g.iterrows():
            u = int(hashlib.md5(str(row["doc_id"]).encode())
                    .hexdigest()[:8], 16) % 2147483647
            key = round(math.log((u + 1.0) / 2147483648.0)
                        / row["n_chars"], 12)
            keys.append((-key, row["doc_id"], row["n_chars"]))
        for negk, d, n in sorted(keys)[:3]:
            expected[(src, d)] = n
    got = {(r.source, r.doc_id): r.n_chars
           for r in q118_weighted_sample(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q124
def test_q124_incremental_agg_vs_pandas(spark):
    from spatial_data_engineering_spark.operators.subqueries import (
        q124_incremental_agg_merge)

    o = pd.read_parquet(f"{SF_ORACLE}/orders.parquet",
                        columns=["o_custkey", "o_totalprice"])
    agg = o.groupby("o_custkey").agg(n=("o_totalprice", "size"),
                                     s=("o_totalprice", "sum"))
    got = {r.o_custkey: (r.n_orders, r.sum_price)
           for r in q124_incremental_agg_merge(spark, SF_ORACLE).collect()}
    assert set(got) == set(agg.index)
    for ck, row in agg.iterrows():
        assert got[ck][0] == row.n
        assert _close(got[ck][1], row.s)


# -------------------------------------------------------------- q131
def test_q131_user_trend_vs_numpy(spark, events):
    from spatial_data_engineering_spark.operators.analytics import (
        q131_user_trend)

    import numpy as np

    e = events.copy()
    e["us"] = _us(e.ts)
    got = {r.user_id: r for r in q131_user_trend(spark, SF_ORACLE).collect()}
    for user, g in e.groupby("user_id"):
        x = (g.us - g.us.min()).to_numpy(dtype=float) / 86_400_000_000.0
        y = g.value.to_numpy(dtype=float)
        n = len(x)
        denom = n * (x * x).sum() - x.sum() ** 2
        if denom <= 0:
            assert user not in got
            continue
        slope = (n * (x * y).sum() - x.sum() * y.sum()) / denom
        intercept = (y.sum() - slope * x.sum()) / n
        r = got[user]
        assert abs(r.slope - round(slope, 6)) < 1e-4
        assert abs(r.intercept - round(intercept, 6)) < 1e-4
