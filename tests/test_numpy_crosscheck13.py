"""Thirteenth batch of independent cross-checks — r5-verified pipeline
queries: q78 per-lang cap-100 balance sampling, q95 stratified split,
q98 cohort retention, q101 gap-fill linear interpolation, q120
forward as-of (next error within 1h), q127 decile calibration, q138
session stats, q139 split contamination.  Same contract: pure
Python/pandas from parquet, no Spark, no DuckDB, no shared SQL."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import numpy as np
import pandas as pd
import pytest

from .conftest import SF_ORACLE
from .test_numpy_crosscheck import _md5_bucket, _quality
from .test_numpy_crosscheck3 import _sessionize
from .test_numpy_crosscheck4 import _us

TOL = 1e-5


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF_ORACLE}/documents.parquet")


@pytest.fixture(scope="module")
def events():
    return pd.read_parquet(f"{SF_ORACLE}/events.parquet")


def _md5_u(key) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % 2147483647


def _ntile(keys: list, n: int) -> dict:
    base, extra = divmod(len(keys), n)
    out, start = {}, 0
    for b in range(1, n + 1):
        size = base + (1 if b <= extra else 0)
        for k in keys[start:start + size]:
            out[k] = b
        start += size
    return out


# -------------------------------------------------------------- q78
def test_q78_balance_corpus_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q78_balance_corpus)

    counts = docs.lang.value_counts().to_dict()
    rates = {lang: min(1.0, 100.0 / c) for lang, c in counts.items()}
    expected = {}
    for _, row in docs.iterrows():
        if _md5_u(row["doc_id"]) < math.ceil(
                rates[row["lang"]] * 2147483647):
            expected[row["doc_id"]] = (row["lang"], row["n_chars"])
    got = {r.doc_id: (r.lang, r.n_chars)
           for r in q78_balance_corpus(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q95
def test_q95_stratified_split_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q95_stratified_split)

    expected = {}
    for lang, g in docs.groupby("lang"):
        order = sorted(g.doc_id, key=lambda d: (
            hashlib.md5(str(d).encode()).hexdigest(), d))
        n = len(order)
        for rk, d in enumerate(order, start=1):
            split = ("train" if rk * 10 <= n * 8
                     else "val" if rk * 10 <= n * 9 else "test")
            expected[d] = (lang, rk, split)
    got = {r.doc_id: (r.lang, r.rk, r.split)
           for r in q95_stratified_split(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q98
def test_q98_cohort_retention_vs_pandas(spark, events):
    from spatial_data_engineering_spark.operators.analytics import (
        q98_cohort_retention)

    e = events.copy()
    d = pd.to_datetime(e.ts)
    week = (d - pd.to_timedelta(d.dt.dayofweek, unit="D")).dt.normalize()
    e["week"] = week
    cohort = e.groupby("user_id")["week"].min()
    e["cohort"] = e.user_id.map(cohort)
    e["offset"] = ((e.week - e.cohort).dt.days // 7)
    agg = (e.groupby(["cohort", "offset"])["user_id"].nunique())
    got = {(r.cohort_week, r.week_offset): r.n_active
           for r in q98_cohort_retention(spark, SF_ORACLE).collect()}
    expected = {(c.strftime("%Y-%m-%d"), int(o)): int(n)
                for (c, o), n in agg.items()}
    assert got == expected


# -------------------------------------------------------------- q101
def test_q101_gap_fill_vs_pandas(spark, events):
    from spatial_data_engineering_spark.operators.analytics import (
        q101_gap_fill_interpolate)

    e = events[events.event_type == "purchase"].copy()
    e["day"] = pd.to_datetime(e.ts).dt.floor("D")
    daily = e.groupby(["user_id", "day"])["value"].mean()
    expected = {}
    for user, g in daily.groupby(level=0):
        days = g.index.get_level_values(1)
        spine = pd.date_range(days.min(), days.max(), freq="D")
        known = {d: v for (_, d), v in g.items()}
        known_days = sorted(known)
        for day in spine:
            if day in known:
                expected[(user, day.strftime("%Y-%m-%d"))] = (
                    known[day], False)
            else:
                prev = max(d for d in known_days if d < day)
                nxt = min(d for d in known_days if d > day)
                frac = (day - prev).days / (nxt - prev).days
                v = known[prev] + (known[nxt] - known[prev]) * frac
                expected[(user, day.strftime("%Y-%m-%d"))] = (v, True)
    got = {(r.user_id, r.day): (r.value_filled, r.interpolated)
           for r in q101_gap_fill_interpolate(spark, SF_ORACLE).collect()}
    assert set(got) == set(expected)
    for k, (v, interp) in expected.items():
        assert got[k][1] == interp
        assert abs(got[k][0] - v) < TOL


# -------------------------------------------------------------- q120
def test_q120_asof_forward_vs_pandas(spark, events):
    from spatial_data_engineering_spark.operators.analytics import (
        q120_asof_forward)

    e = events[events.event_type.isin(["purchase", "error"])].copy()
    e["us"] = _us(e.ts)
    e = e.sort_values(["user_id", "ts", "event_id"])
    expected = {}
    for user, g in e.groupby("user_id"):
        rows = list(g.itertuples())
        for i, r in enumerate(rows):
            if r.event_type != "purchase":
                continue
            nxt = next((x.us for x in rows[i + 1:]
                        if x.event_type == "error"), None)
            if nxt is not None and nxt - r.us <= 3_600_000_000:
                expected[r.event_id] = (user, r.us, nxt, nxt - r.us)
            else:
                expected[r.event_id] = (user, r.us, None, None)
    got = {r.event_id: (r.user_id, r.purchase_us, r.error_us, r.gap_us)
           for r in q120_asof_forward(spark, SF_ORACLE).collect()}
    assert got == expected


# -------------------------------------------------------------- q127
def test_q127_calibration_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q127_score_calibration)

    d = docs.copy()
    d["quality"] = d.apply(_quality, axis=1)
    med = np.percentile(d.n_chars.to_numpy(), 50)
    d["gold"] = (d.n_chars > med).astype(int)
    order = d.sort_values(["quality", "doc_id"]).doc_id.tolist()
    decile = _ntile(order, 10)
    d["decile"] = d.doc_id.map(decile)
    got = {r.decile: r for r in q127_score_calibration(spark, SF_ORACLE).collect()}
    for dec, g in d.groupby("decile"):
        r = got[dec]
        assert r.n_docs == len(g)
        assert abs(r.avg_quality - round(g.quality.mean(), 6)) < TOL
        assert abs(r.gold_rate - round(g.gold.mean(), 6)) < TOL


# -------------------------------------------------------------- q138
def test_q138_session_stats_vs_pandas(spark, events):
    from spatial_data_engineering_spark.operators.analytics import (
        q138_session_stats)

    e = _sessionize(events)
    e["us"] = _us(e.ts)
    sess = e.groupby(["user_id", "sid"]).agg(
        dur=("us", lambda s: s.max() - s.min()), n=("us", "size"))
    got = q138_session_stats(spark, SF_ORACLE).collect()[0]
    assert got.n_sessions == len(sess)
    assert abs(got.avg_events - round(sess.n.mean(), 6)) < TOL
    assert abs(got.p50_minutes
               - round(np.percentile(sess.dur, 50) / 6e7, 6)) < TOL
    assert abs(got.p90_minutes
               - round(np.percentile(sess.dur, 90) / 6e7, 6)) < TOL
    assert got.n_single_event == int((sess.n == 1).sum())


# -------------------------------------------------------------- q139
def test_q139_contamination_vs_python(spark, docs):
    from spatial_data_engineering_spark.operators.textops import (
        q139_split_contamination)

    split_sh = defaultdict(set)
    for _, row in docs.iterrows():
        b = _md5_bucket(row["doc_id"])
        split = "train" if b < 80 else "val" if b < 90 else "test"
        txt = row["text"]
        upper = max(len(txt) - 7, 1)
        split_sh[split].update(txt[i:i + 8] for i in range(upper))
    train = split_sh["train"]
    got = {r.split: r for r in q139_split_contamination(spark, SF_ORACLE).collect()}
    for split in ("val", "test"):
        sh = split_sh[split]
        hit = len(sh & train)
        r = got[split]
        assert r.n_shingles == len(sh)
        assert r.n_in_train == hit
        assert abs(r.contamination - round(hit / len(sh), 6)) < TOL
