"""Nineteenth batch of independent cross-checks — the relational core
that predates the cross-check program and never got a third way: q02
ILIKE, q03 dim joins, q04/q05 semi/anti, q10 row ids, q12 pivot, q13
set ops, q14 rollup, q15 count-distinct, q16 extent, q17 thresholds,
q21 regexp props, q22 cube, q23 unpivot, q24 IN-subquery, q27 limit,
q35 rank functions, q36 full outer, q38 profile, q39 TPC-H Q5 shape,
q54 dedup materialization, q63 date functions, q75 golden variance.
Same contract: pure Python/pandas from parquet, no Spark, no DuckDB,
no shared SQL.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pytest

from .conftest import SF_ORACLE

TOL = 1e-5


def _close(a, b):
    return abs(a - b) <= max(abs(b) * 1e-9, TOL)


def _t(name, cols=None):
    return pd.read_parquet(f"{SF_ORACLE}/{name}.parquet", columns=cols)


@pytest.fixture(scope="module")
def orders():
    return _t("orders")


@pytest.fixture(scope="module")
def customer():
    return _t("customer")


@pytest.fixture(scope="module")
def lineitem():
    return _t("lineitem")


# -------------------------------------------------------------- q02
def test_q02_ilike_vs_pandas(spark, orders):
    from spatial_data_engineering_spark.operators.relational import (
        q02_ilike_filter)

    sel = orders[orders.o_orderpriority.str.lower().str.contains("urgent")]
    got = {r.o_orderstatus: (r.n_orders, r.sum_totalprice)
           for r in q02_ilike_filter(spark, SF_ORACLE).collect()}
    grp = sel.groupby("o_orderstatus").o_totalprice.agg(["size", "sum"])
    assert set(got) == set(grp.index)
    for st, row in grp.iterrows():
        assert got[st][0] == row["size"] and _close(got[st][1], row["sum"])


# -------------------------------------------------------------- q03
def test_q03_join_enrich_vs_pandas(spark, customer):
    from spatial_data_engineering_spark.operators.relational import (
        q03_join_enrich)

    n, r = _t("nation"), _t("region")
    j = (customer.merge(n, left_on="c_nationkey", right_on="n_nationkey")
         .merge(r, left_on="n_regionkey", right_on="r_regionkey"))
    got = {x.r_name: x for x in q03_join_enrich(spark, SF_ORACLE).collect()}
    for rn, grp in j.groupby("r_name"):
        assert got[rn].n_customers == len(grp)
        assert _close(got[rn].sum_acctbal, grp.c_acctbal.sum())
        assert _close(got[rn].avg_acctbal, grp.c_acctbal.mean())


# ---------------------------------------------------------- q04/q05
def test_q04_q05_semi_anti_vs_pandas(spark, customer, orders):
    from spatial_data_engineering_spark.operators.relational import (
        q04_semi_join, q05_anti_join)

    with_orders = set(orders.o_custkey.dropna())
    has = customer[customer.c_custkey.isin(with_orders)]
    hasnt = customer[~customer.c_custkey.isin(with_orders)]
    got4 = {r.c_mktsegment: r.n_customers
            for r in q04_semi_join(spark, SF_ORACLE).collect()}
    got5 = {r.c_mktsegment: r.n_customers
            for r in q05_anti_join(spark, SF_ORACLE).collect()}
    assert got4 == has.groupby("c_mktsegment").size().to_dict()
    assert got5 == hasnt.groupby("c_mktsegment").size().to_dict()


# -------------------------------------------------------------- q10
def test_q10_row_number_vs_python(spark, orders):
    from spatial_data_engineering_spark.operators.relational import (
        q10_row_number)

    keys = sorted(orders.o_orderkey[orders.o_orderkey <= 500])
    expected = {k: i for i, k in enumerate(keys, start=1)}
    got = {r.o_orderkey: r.id for r in q10_row_number(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q12
def test_q12_pivot_vs_pandas(spark):
    from spatial_data_engineering_spark.operators.relational import q12_pivot

    e = _t("events", ["ts", "event_type"])
    e["day"] = pd.to_datetime(e.ts).dt.strftime("%Y-%m-%d")
    ct = e.groupby(["day", "event_type"]).size()
    got = {r.day: r for r in q12_pivot(spark, SF_ORACLE).collect()}
    assert set(got) == set(e.day)
    for day in set(e.day):
        for t in ("click", "view", "purchase", "signup", "error"):
            assert got[day][t] == ct.get((day, t), 0)


# -------------------------------------------------------------- q13
def test_q13_setops_vs_python(spark, customer, orders):
    from spatial_data_engineering_spark.operators.relational import q13_setops

    a = set(customer.c_custkey[customer.c_acctbal > 7500])
    b = set(orders.o_custkey[orders.o_orderpriority == "1-URGENT"])
    expected = (a | b) - (a & b)
    got = {r.c_custkey for r in q13_setops(spark, SF_ORACLE).collect()}
    assert got == expected


# ---------------------------------------------------------- q14/q22
def test_q14_rollup_q22_cube_vs_pandas(spark, orders):
    from spatial_data_engineering_spark.operators.relational import (
        q14_rollup, q22_cube)

    full = orders.groupby(["o_orderstatus", "o_orderpriority"]) \
        .o_totalprice.agg(["size", "sum"])
    by_status = orders.groupby("o_orderstatus").o_totalprice.agg(
        ["size", "sum"])
    by_prio = orders.groupby("o_orderpriority").o_totalprice.agg(
        ["size", "sum"])

    rollup = {}
    for (st, pr), row in full.iterrows():
        rollup[(st, pr)] = row["size"]
    for st, row in by_status.iterrows():
        rollup[(st, None)] = row["size"]
    rollup[(None, None)] = len(orders)
    got14 = {(r.o_orderstatus, r.o_orderpriority): r.n_orders
             for r in q14_rollup(spark, SF_ORACLE).collect()}
    assert got14 == rollup

    cube = dict(rollup)
    for pr, row in by_prio.iterrows():
        cube[(None, pr)] = row["size"]
    got22 = {(r.o_orderstatus, r.o_orderpriority): r.n_orders
             for r in q22_cube(spark, SF_ORACLE).collect()}
    assert got22 == cube


# -------------------------------------------------------------- q15
def test_q15_count_distinct_vs_pandas(spark, lineitem):
    from spatial_data_engineering_spark.operators.relational import (
        q15_count_distinct)

    got = {r.l_returnflag: (r.n_parts, r.n_suppliers, r.n_items)
           for r in q15_count_distinct(spark, SF_ORACLE).collect()}
    for fl, grp in lineitem.groupby("l_returnflag"):
        assert got[fl] == (grp.l_partkey.nunique(), grp.l_suppkey.nunique(),
                           len(grp))


# -------------------------------------------------------------- q16
def test_q16_extent_vs_pandas(spark, lineitem):
    from spatial_data_engineering_spark.operators.relational import q16_extent

    r = q16_extent(spark, SF_ORACLE).collect()[0]
    sd = pd.to_datetime(lineitem.l_shipdate)
    assert r.min_shipdate == sd.min().strftime("%Y-%m-%d")
    assert r.max_shipdate == sd.max().strftime("%Y-%m-%d")
    assert _close(r.min_price, lineitem.l_extendedprice.min())
    assert _close(r.max_price, lineitem.l_extendedprice.max())
    assert _close(r.min_qty, lineitem.l_quantity.min())
    assert _close(r.max_qty, lineitem.l_quantity.max())


# -------------------------------------------------------------- q17
def test_q17_case_thresholds_vs_pandas(spark):
    from spatial_data_engineering_spark.operators.relational import (
        q17_case_thresholds)

    e = _t("events", ["event_type", "value"])
    got = {r.event_type: r for r in
           q17_case_thresholds(spark, SF_ORACLE).collect()}
    for t, grp in e.groupby("event_type"):
        avg = grp.value.mean()
        tier = "high" if avg > 100 else "moderate" if avg > 50 else "low"
        assert _close(got[t].avg_value, avg)
        assert got[t].tier == tier


# -------------------------------------------------------------- q21
def test_q21_props_extract_vs_python(spark):
    from spatial_data_engineering_spark.operators.relational import (
        q21_props_extract)

    e = _t("events", ["event_type", "props"])
    sums, ns = Counter(), Counter()
    for t, props in zip(e.event_type, e.props):
        m = re.search(r'"k": (\d+)', props or "")
        sums[t] += int(m.group(1)) if m else 0
        ns[t] += 1
    got = {r.event_type: (r.sum_k, r.n)
           for r in q21_props_extract(spark, SF_ORACLE).collect()}
    assert got == {t: (sums[t], ns[t]) for t in ns}


# -------------------------------------------------------------- q23
def test_q23_unpivot_vs_pandas(spark, lineitem):
    from spatial_data_engineering_spark.operators.relational import q23_unpivot

    grp = lineitem.groupby("l_returnflag").agg(
        qty=("l_quantity", "sum"), price=("l_extendedprice", "sum"))
    got = {(r.l_returnflag, r.metric): r.value
           for r in q23_unpivot(spark, SF_ORACLE).collect()}
    assert len(got) == 2 * len(grp)
    for fl, row in grp.iterrows():
        assert _close(got[(fl, "qty")], row.qty)
        assert _close(got[(fl, "price")], row.price)


# -------------------------------------------------------------- q24
def test_q24_in_subquery_vs_pandas(spark, orders, customer):
    from spatial_data_engineering_spark.operators.relational import (
        q24_in_subquery)

    rich = set(customer.c_custkey[customer.c_acctbal > 9000])
    sel = orders[orders.o_custkey.isin(rich)]
    got = {r.o_orderpriority: r.n_orders
           for r in q24_in_subquery(spark, SF_ORACLE).collect()}
    assert got == sel.groupby("o_orderpriority").size().to_dict()


# -------------------------------------------------------------- q27
def test_q27_first_limit_vs_pandas(spark, orders):
    from spatial_data_engineering_spark.operators.relational import (
        q27_first_limit)

    exp = orders.sort_values("o_orderkey").head(5)
    got = sorted(q27_first_limit(spark, SF_ORACLE).collect(),
                 key=lambda r: r.o_orderkey)
    assert [r.o_orderkey for r in got] == list(exp.o_orderkey)
    for r, (_, e) in zip(got, exp.iterrows()):
        assert r.o_orderstatus == e.o_orderstatus
        assert _close(r.o_totalprice, e.o_totalprice)


# -------------------------------------------------------------- q35
def test_q35_rank_functions_vs_python(spark, customer):
    from spatial_data_engineering_spark.operators.relational import (
        q35_rank_functions)

    sel = customer[customer.c_custkey <= 200]
    got = {r.c_custkey: r for r in q35_rank_functions(spark, SF_ORACLE).collect()}
    assert set(got) == set(sel.c_custkey)
    for _, grp in sel.groupby("c_nationkey"):
        rows = sorted(grp.itertuples(),
                      key=lambda r: (-r.c_acctbal, r.c_custkey))
        n = len(rows)
        q, rem = divmod(n, 4)
        # SQL NTILE rule
        tiles = []
        for b in range(4):
            tiles += [b + 1] * (q + (1 if b < rem else 0))
        dr, prev = 0, None
        for i, r in enumerate(rows):
            if r.c_acctbal != prev:
                dr += 1
                prev = r.c_acctbal
            rank_of_first_peer = next(
                k for k, x in enumerate(rows) if x.c_acctbal == r.c_acctbal)
            n_le = sum(x.c_acctbal >= r.c_acctbal for x in rows)
            g = got[r.c_custkey]
            assert g.quartile == tiles[i]
            assert g.drank == dr
            prank = 0.0 if n == 1 else rank_of_first_peer / (n - 1)
            assert _close(g.prank, round(prank, 6))
            assert _close(g.cdist, round(n_le / n, 6))


# -------------------------------------------------------------- q36
def test_q36_full_outer_vs_pandas(spark, customer):
    from spatial_data_engineering_spark.operators.relational import (
        q36_full_outer)

    s = _t("supplier")
    nc = customer[customer.c_acctbal > 9900].groupby("c_nationkey").size()
    ns = s[s.s_acctbal > 9900].groupby("s_nationkey").size()
    got = {r.nationkey: (r.n_customers, r.n_suppliers)
           for r in q36_full_outer(spark, SF_ORACLE).collect()}
    assert set(got) == set(nc.index) | set(ns.index)
    for k, (a, b) in got.items():
        assert a == nc.get(k) and b == ns.get(k)


# -------------------------------------------------------------- q38
def test_q38_profile_vs_pandas(spark, orders):
    from spatial_data_engineering_spark.operators.relational import q38_profile

    r = q38_profile(spark, SF_ORACLE).collect()[0]
    assert r.n_rows == len(orders)
    assert r.null_custkey == orders.o_custkey.isna().sum()
    assert r.d_custkey == orders.o_custkey.nunique()
    assert r.d_status == orders.o_orderstatus.nunique()
    assert r.d_priority == orders.o_orderpriority.nunique()
    assert r.d_years == pd.to_datetime(orders.o_orderdate).dt.year.nunique()


# -------------------------------------------------------------- q39
def test_q39_local_supplier_revenue_vs_pandas(spark, customer, orders,
                                              lineitem):
    from spatial_data_engineering_spark.operators.relational import (
        q39_local_supplier_revenue)

    s, n, reg = _t("supplier"), _t("nation"), _t("region")
    rname = reg.r_name.min()
    od = pd.to_datetime(orders.o_orderdate)
    o = orders[(od >= "1996-01-01") & (od < "1998-01-01")]
    j = (customer.merge(o, left_on="c_custkey", right_on="o_custkey")
         .merge(lineitem, left_on="o_orderkey", right_on="l_orderkey")
         .merge(s, left_on="l_suppkey", right_on="s_suppkey"))
    j = j[j.c_nationkey == j.s_nationkey]
    j = (j.merge(n, left_on="c_nationkey", right_on="n_nationkey")
         .merge(reg, left_on="n_regionkey", right_on="r_regionkey"))
    j = j[j.r_name == rname]
    j["rev"] = j.l_extendedprice * (1 - j.l_discount)
    got = {r.n_name: (r.revenue, r.n_items)
           for r in q39_local_supplier_revenue(spark, SF_ORACLE).collect()}
    grp = j.groupby("n_name").rev.agg(["sum", "size"])
    assert set(got) == set(grp.index)
    for nn, row in grp.iterrows():
        assert _close(got[nn][0], row["sum"]) and got[nn][1] == row["size"]


# -------------------------------------------------------------- q54
def test_q54_dedup_materialize_vs_python(spark):
    from spatial_data_engineering_spark.operators.dedup import (
        q54_dedup_materialize)

    docs = _t("documents")
    fp = docs.text.map(lambda t: hashlib.md5(
        " ".join(sorted(set(t.split(" ")))).encode()).hexdigest())
    keeper = {}
    for d, h in zip(docs.doc_id, fp):
        keeper[h] = min(keeper.get(h, d), d)
    keepers = set(keeper.values())
    got = {r.doc_id for r in q54_dedup_materialize(spark, SF_ORACLE).collect()}
    assert got == keepers


# -------------------------------------------------------------- q63
def test_q63_date_functions_vs_python(spark, orders):
    from spatial_data_engineering_spark.operators.relational import (
        q63_date_functions)

    sel = orders[orders.o_orderkey <= 2000]
    od = pd.to_datetime(sel.o_orderdate)
    rows = Counter()
    epoch95 = pd.Timestamp("1995-01-01")
    for d in od:
        month = d.strftime("%Y-%m")
        plus3 = (d.to_period("M") + 3).strftime("%Y-%m")
        month_end = (d.to_period("M").to_timestamp("M")).strftime("%Y-%m-%d")
        days = (d.normalize() - epoch95).days
        rows[(month, plus3, month_end, days, d.isoweekday(),
              (d.month - 1) // 3 + 1)] += 1
    got = {(r.month, r.month_plus3, r.month_end, r.days_since_epoch95,
            r.iso_dow, r.qtr): r.n
           for r in q63_date_functions(spark, SF_ORACLE).collect()}
    assert got == dict(rows)


# -------------------------------------------------------------- q75
def test_q75_golden_variance_vs_numpy(spark, orders):
    from spatial_data_engineering_spark.operators.relational import (
        q75_golden_variance)

    m = orders.copy()
    m["month"] = pd.to_datetime(m.o_orderdate).dt.strftime("%Y-%m")
    monthly = m.groupby(["o_orderpriority", "month"]).o_totalprice.sum()
    var = {pr: round(float(np.var(g.to_numpy(), ddof=1)), 6)
           for pr, g in monthly.groupby(level=0)}
    top = sorted(var, key=lambda p: (-var[p], p))[0]
    row = q75_golden_variance(spark, SF_ORACLE).collect()[0]
    assert row.o_orderpriority == top
    assert _close(row.variance, var[top])
