"""q222's fleet-scale percentile swap (VERDICT r14 task 4): the
approx_percentile threshold variant is a tested code path, not a
comment.  The exact mode stays the oracle-matched default; the approx
mode must (a) keep each language's total doc count identical (bucketing
never drops rows), (b) keep per-bucket counts within the operator's own
statistical tolerance of exact, and (c) reject unknown mode values.
"""

from __future__ import annotations

import pytest

from .conftest import SF_ORACLE


def _buckets(spark, sf_dir):
    from spatial_data_engineering_spark.operators.textops import (
        q222_bigram_lm_buckets)

    return {(r["lang"], r["bucket"]): r["n_docs"]
            for r in q222_bigram_lm_buckets(spark, sf_dir).collect()}


def test_q222_approx_mode_bucket_stability(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_Q222_PCT", raising=False)
    exact = _buckets(spark, SF_ORACLE)
    monkeypatch.setenv("SPARK_GRAFT_Q222_PCT", "approx")
    approx = _buckets(spark, SF_ORACLE)

    langs = {k[0] for k in exact}
    assert {k[0] for k in approx} == langs
    for lang in langs:
        n_exact = sum(v for (lg, _), v in exact.items() if lg == lang)
        n_approx = sum(v for (lg, _), v in approx.items() if lg == lang)
        assert n_exact == n_approx, f"{lang}: bucketing dropped rows"
        for bucket in ("head", "middle", "tail"):
            e = exact.get((lang, bucket), 0)
            a = approx.get((lang, bucket), 0)
            # approx_percentile's rank error is n/accuracy per group —
            # sub-1 at sf0.01 group sizes; allow the one-rank slack the
            # element-vs-interpolated threshold difference can cause,
            # plus 2% of the group for larger SFs
            tol = 1 + round(0.02 * n_exact)
            assert abs(e - a) <= tol, (lang, bucket, e, a)


def test_q222_rejects_unknown_mode(spark, monkeypatch):
    from spatial_data_engineering_spark.operators.textops import (
        q222_bigram_lm_buckets)

    monkeypatch.setenv("SPARK_GRAFT_Q222_PCT", "fast")
    with pytest.raises(ValueError, match="SPARK_GRAFT_Q222_PCT"):
        q222_bigram_lm_buckets(spark, SF_ORACLE)


@pytest.mark.sf1
def test_q222_approx_mode_bucket_stability_sf1(spark, monkeypatch):
    """Same tolerance contract at 10x data — per-language groups of
    thousands of docs, where approx_percentile's n/accuracy rank error
    is a handful of ranks and the 1 + 2% tolerance must still hold."""
    import os

    sf1 = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "testdata_sf1")
    if not os.path.isdir(sf1):
        pytest.skip("testdata_sf1 not generated (scripts/make_sf1.py)")
    monkeypatch.delenv("SPARK_GRAFT_Q222_PCT", raising=False)
    exact = _buckets(spark, sf1)
    monkeypatch.setenv("SPARK_GRAFT_Q222_PCT", "approx")
    approx = _buckets(spark, sf1)
    langs = {k[0] for k in exact}
    assert {k[0] for k in approx} == langs
    for lang in langs:
        n_exact = sum(v for (lg, _), v in exact.items() if lg == lang)
        assert n_exact == sum(v for (lg, _), v in approx.items()
                              if lg == lang)
        for bucket in ("head", "middle", "tail"):
            e = exact.get((lang, bucket), 0)
            a = approx.get((lang, bucket), 0)
            assert abs(e - a) <= 1 + round(0.02 * n_exact), (
                lang, bucket, e, a)
