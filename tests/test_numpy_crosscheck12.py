"""Twelfth batch of independent cross-checks — more r5-verified math:
q117 rolling median, q130 weighted median, q134 EWMA, q135 Benford,
q136 transition matrix, q137 time-to-convert, q140 class separation.
Same contract: pure Python/numpy from parquet, no Spark, no DuckDB,
no shared SQL."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pytest

from .conftest import SF_ORACLE
from .test_numpy_crosscheck4 import _us

TOL = 1e-5


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF_ORACLE}/documents.parquet")


@pytest.fixture(scope="module")
def events():
    return pd.read_parquet(f"{SF_ORACLE}/events.parquet")


# -------------------------------------------------------------- q117
def test_q117_rolling_median_vs_numpy(spark, events):
    from spatial_data_engineering_spark.operators.analytics import (
        q117_rolling_median)

    e = events.sort_values(["user_id", "ts", "event_id"])
    expected = {}
    for _, g in e.groupby("user_id"):
        vals = g.value.tolist()
        for i, (_, row) in enumerate(g.iterrows()):
            win = vals[max(0, i - 4):i + 1]
            expected[row["event_id"]] = float(np.percentile(win, 50))
    got = {r.event_id: r.rolling_median
           for r in q117_rolling_median(spark, SF_ORACLE).collect()}
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert abs(got[k] - v) < TOL


# -------------------------------------------------------------- q130
def test_q130_weighted_median_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.analytics import (
        q130_weighted_median)

    got = {r.lang: r.weighted_median_chars
           for r in q130_weighted_median(spark, SF_ORACLE).collect()}
    for lang, g in docs.groupby("lang"):
        rows = g.sort_values(["n_chars", "doc_id"])
        tot = rows.n_chars.sum()
        cum = 0
        for _, row in rows.iterrows():
            cum += row["n_chars"]
            if 2 * cum >= tot:
                assert got[lang] == row["n_chars"], lang
                break


# -------------------------------------------------------------- q134
def test_q134_ewma_vs_python(spark, events):
    from spatial_data_engineering_spark.operators.analytics import q134_ewma

    e = events.sort_values(["user_id", "ts", "event_id"],
                           ascending=[True, False, False])
    got = {r.user_id: r.ewma for r in q134_ewma(spark, SF_ORACLE).collect()}
    for user, g in e.groupby("user_id"):
        vals = g.value.tolist()[:20]
        num = sum(v * 0.8 ** i for i, v in enumerate(vals))
        den = sum(0.8 ** i for i in range(len(vals)))
        assert abs(got[user] - round(num / den, 6)) < TOL


# -------------------------------------------------------------- q135
def test_q135_benford_vs_python(spark):
    from spatial_data_engineering_spark.operators.relational import (
        q135_benford_audit)

    o = pd.read_parquet(f"{SF_ORACLE}/orders.parquet",
                        columns=["o_totalprice"])
    digits = Counter(int(f"{p:.6f}"[0]) for p in o.o_totalprice if p >= 1)
    total = sum(digits.values())
    got = {r.d: r for r in q135_benford_audit(spark, SF_ORACLE).collect()}
    assert set(got) == set(digits)
    for d, n in digits.items():
        r = got[d]
        exp = math.log((d + 1.0) / d) / math.log(10.0)
        assert r.n == n
        assert abs(r.observed - round(n / total, 6)) < TOL
        assert abs(r.expected - round(exp, 6)) < TOL
        assert abs(r.chi2_contrib - (n / total - exp) ** 2 / exp) < 1e-6


# -------------------------------------------------------------- q136
def test_q136_transitions_vs_python(spark, events):
    from spatial_data_engineering_spark.operators.analytics import (
        q136_transition_matrix)

    e = events.sort_values(["user_id", "ts", "event_id"])
    cnt = Counter()
    for _, g in e.groupby("user_id"):
        types = g.event_type.tolist()
        for a, b in zip(types, types[1:]):
            cnt[(a, b)] += 1
    row_tot = Counter()
    for (a, _), n in cnt.items():
        row_tot[a] += n
    got = {(r.prev_type, r.event_type): r
           for r in q136_transition_matrix(spark, SF_ORACLE).collect()}
    assert set(got) == set(cnt)
    for k, n in cnt.items():
        assert got[k].n == n
        assert abs(got[k].p - round(n / row_tot[k[0]], 6)) < TOL


# -------------------------------------------------------------- q137
def test_q137_time_to_convert_vs_python(spark, events):
    from spatial_data_engineering_spark.operators.analytics import (
        q137_time_to_convert)

    e = events.copy()
    e["us"] = _us(e.ts)
    views = e[e.event_type == "view"].groupby("user_id")["us"].min()
    dts = []
    for user, v_us in views.items():
        p = e[(e.user_id == user) & (e.event_type == "purchase")
              & (e.us >= v_us)]
        if len(p):
            dts.append(p.us.min() - v_us)
    dts = np.array(dts, dtype=float)
    got = q137_time_to_convert(spark, SF_ORACLE).collect()[0]
    assert got.n_converted == len(dts)
    assert abs(got.mean_hours - round((dts / 3.6e9).mean(), 6)) < TOL
    assert abs(got.p50_hours
               - round(np.percentile(dts, 50) / 3.6e9, 6)) < TOL
    assert abs(got.p90_hours
               - round(np.percentile(dts, 90) / 3.6e9, 6)) < TOL


# -------------------------------------------------------------- q140
def test_q140_class_separation_vs_numpy(spark):
    from spatial_data_engineering_spark.operators.similarity import (
        q140_class_separation)

    e = pd.read_parquet(f"{SF_ORACLE}/embeddings.parquet")
    X = np.array(e.embedding.tolist(), dtype=np.float64)
    labels = e.label.to_numpy()
    cents = {int(l): X[labels == l].mean(axis=0) for l in np.unique(labels)}
    got = {r.label: r for r in q140_class_separation(spark, SF_ORACLE).collect()}
    for lab, c in cents.items():
        m = labels == lab
        intra = np.linalg.norm(X[m] - c, axis=1).mean()
        inter = min(np.linalg.norm(c - c2)
                    for l2, c2 in cents.items() if l2 != lab)
        r = got[lab]
        assert r.n_vectors == int(m.sum())
        assert abs(r.avg_intra - intra) < 1e-3
        assert abs(r.min_inter - inter) < 1e-3
