"""Fourteenth batch of independent cross-checks — TPC-H-style classics
rotating back into the round-7/8 windows: q01 pricing summary, q06
monthly revenue, q08 CV argmax, q09 histogram, q11 top-3 per nation,
q20 above-average counts, q25 window analytics, q31 sliding windows.
Same contract: pure Python/pandas from parquet, no Spark, no DuckDB,
no shared SQL."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from .conftest import SF_ORACLE
from .test_numpy_crosscheck4 import _us

TOL = 1e-5
RTOL = 1e-9  # for large revenue sums: relative


def _close(a, b):
    return abs(a - b) <= max(abs(b) * RTOL, TOL)


@pytest.fixture(scope="module")
def lineitem():
    return pd.read_parquet(f"{SF_ORACLE}/lineitem.parquet")


@pytest.fixture(scope="module")
def customer():
    return pd.read_parquet(f"{SF_ORACLE}/customer.parquet")


@pytest.fixture(scope="module")
def orders():
    return pd.read_parquet(f"{SF_ORACLE}/orders.parquet")


# -------------------------------------------------------------- q01
def test_q01_pricing_summary_vs_pandas(spark, lineitem):
    from spatial_data_engineering_spark.operators.relational import (
        q01_pricing_summary)

    li = lineitem[pd.to_datetime(lineitem.l_shipdate) <= "1998-09-02"]
    got = {(r.l_returnflag, r.l_linestatus): r
           for r in q01_pricing_summary(spark, SF_ORACLE).collect()}
    for k, g in li.groupby(["l_returnflag", "l_linestatus"]):
        r = got[k]
        assert r.count_order == len(g)
        assert _close(r.sum_qty, g.l_quantity.sum())
        assert _close(r.sum_base_price, g.l_extendedprice.sum())
        assert _close(r.sum_disc_price,
                      (g.l_extendedprice * (1 - g.l_discount)).sum())
        assert _close(r.avg_qty, g.l_quantity.mean())
        assert _close(r.avg_price, g.l_extendedprice.mean())


# -------------------------------------------------------------- q06
def test_q06_monthly_revenue_vs_pandas(spark, lineitem):
    from spatial_data_engineering_spark.operators.relational import (
        q06_monthly_revenue)

    li = lineitem.copy()
    li["month"] = pd.to_datetime(li.l_shipdate).dt.strftime("%Y-%m")
    li["rev"] = li.l_extendedprice * (1 - li.l_discount)
    got = {r.month: r for r in q06_monthly_revenue(spark, SF_ORACLE).collect()}
    for month, g in li.groupby("month"):
        r = got[month]
        assert r.n_items == len(g)
        assert _close(r.revenue, g.rev.sum())


# -------------------------------------------------------------- q08
def test_q08_cv_argmax_vs_pandas(spark, orders):
    from spatial_data_engineering_spark.operators.relational import (
        q08_var_argmax)

    o = orders.copy()
    o["month"] = pd.to_datetime(o.o_orderdate).dt.strftime("%Y-%m")
    monthly = o.groupby(["o_orderpriority", "month"])["o_totalprice"].sum()
    cvs = {}
    for pri, g in monthly.groupby(level=0):
        v = g.to_numpy(dtype=float)
        cvs[pri] = round(v.std(ddof=1) / v.mean(), 6)
    best = sorted(cvs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    got = q08_var_argmax(spark, SF_ORACLE).collect()[0]
    assert got.o_orderpriority == best[0]
    assert abs(got.cv - best[1]) < TOL


# -------------------------------------------------------------- q09
def test_q09_histogram_vs_pandas(spark, orders):
    from spatial_data_engineering_spark.operators.relational import (
        q09_histogram)

    bins = np.floor(orders.o_totalprice.to_numpy() / 20000).astype(int)
    expected = pd.Series(bins).value_counts().to_dict()
    got = {r.bin: r.frequency for r in q09_histogram(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q11
def test_q11_topk_per_group_vs_pandas(spark, customer):
    from spatial_data_engineering_spark.operators.relational import (
        q11_topk_per_group)

    expected = {}
    for nk, g in customer.groupby("c_nationkey"):
        order = g.sort_values(["c_acctbal", "c_custkey"],
                              ascending=[False, True]).head(3)
        for rk, (_, row) in enumerate(order.iterrows(), start=1):
            expected[(nk, rk)] = (row.c_custkey, row.c_acctbal)
    got = {(r.c_nationkey, r.rk): (r.c_custkey, r.c_acctbal)
           for r in q11_topk_per_group(spark, SF_ORACLE).collect()}
    assert set(got) == set(expected)
    for k, (ck, bal) in expected.items():
        assert got[k][0] == ck
        assert abs(got[k][1] - bal) < TOL


# -------------------------------------------------------------- q20
def test_q20_above_avg_vs_pandas(spark, customer):
    from spatial_data_engineering_spark.operators.relational import (
        q20_above_avg)

    avg = customer.c_acctbal.mean()
    rich = customer[customer.c_acctbal > avg]
    expected = rich.groupby("c_nationkey").size().to_dict()
    got = {r.c_nationkey: r.n_rich
           for r in q20_above_avg(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q25
def test_q25_window_analytics_vs_pandas(spark, customer):
    from spatial_data_engineering_spark.operators.relational import (
        q25_window_analytics)

    c = customer[customer.c_custkey <= 300].sort_values(
        ["c_nationkey", "c_custkey"])
    got = {r.c_custkey: r for r in q25_window_analytics(spark, SF_ORACLE).collect()}
    assert set(got) == set(c.c_custkey)
    for nk, g in c.groupby("c_nationkey"):
        bals = g.c_acctbal.tolist()
        keys = g.c_custkey.tolist()
        # rank by (acctbal desc, custkey)
        rank_order = sorted(range(len(g)),
                            key=lambda i: (-bals[i], keys[i]))
        ranks = {keys[i]: rk for rk, i in enumerate(rank_order, start=1)}
        run = 0.0
        for i, (k, b) in enumerate(zip(keys, bals)):
            r = got[k]
            run += b
            assert (r.prev_bal is None) == (i == 0)
            if i > 0:
                assert abs(r.prev_bal - bals[i - 1]) < TOL
            if i < len(bals) - 1:
                assert abs(r.next_bal - bals[i + 1]) < TOL
            else:
                assert r.next_bal is None
            assert r.bal_rank == ranks[k]
            assert _close(r.running_bal, run)


# -------------------------------------------------------------- q31
def test_q31_sliding_window_vs_pandas(spark, ):
    from spatial_data_engineering_spark.operators.relational import (
        q31_sliding_window)
    from collections import defaultdict

    e = pd.read_parquet(f"{SF_ORACLE}/events.parquet")
    us = _us(e.ts)
    HALF, HOUR = 1_800_000_000, 3_600_000_000
    agg = defaultdict(lambda: [0, 0.0])
    for t, et, v in zip(us, e.event_type, e.value):
        for j in (0, 1):
            start = (t // HALF - j) * HALF
            if start >= 0 and start <= t < start + HOUR:
                cell = agg[(start, et)]
                cell[0] += 1
                cell[1] += v
    got = {(r.window_start, r.event_type): r
           for r in q31_sliding_window(spark, SF_ORACLE).collect()}
    expected = {}
    for (start, et), (n, s) in agg.items():
        key = (pd.Timestamp(start, unit="us").strftime("%Y-%m-%d %H:%M:%S"),
               et)
        expected[key] = (n, s)
    assert set(got) == set(expected)
    for k, (n, s) in expected.items():
        assert got[k].n_events == n
        assert _close(got[k].sum_value, s)
