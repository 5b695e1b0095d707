"""Accuracy contracts for sketch-based aggregates (no value oracle —
engine-specific sketches; the contract is bounded error vs exact)."""

from __future__ import annotations

from .conftest import SF_ORACLE


def test_approx_quantiles_within_bound(spark):
    from spatial_data_engineering_spark.operators.relational import (
        q33_percentiles, q34_approx_quantiles)

    exact = {r.l_returnflag: r for r in q33_percentiles(spark, SF_ORACLE).collect()}
    approx = {r.l_returnflag: r for r in q34_approx_quantiles(spark, SF_ORACLE).collect()}
    assert set(exact) == set(approx)
    # GK sketch at accuracy=10000: rank error <= 1e-4, well under 1% in
    # value space for this distribution — the grouped_percentiles default
    # path is a faithful stand-in for the exact toggle
    for k in exact:
        assert abs(approx[k].ap50 - exact[k].p50) / exact[k].p50 < 0.01
        assert abs(approx[k].ap95 - exact[k].p95) / exact[k].p95 < 0.01


def test_approx_count_distinct_within_bound(spark):
    from spatial_data_engineering_spark.operators.relational import (
        q15_count_distinct, q28_approx_distinct)

    exact = {r.l_returnflag: r for r in q15_count_distinct(spark, SF_ORACLE).collect()}
    approx = {r.l_returnflag: r for r in q28_approx_distinct(spark, SF_ORACLE).collect()}
    for k in exact:
        assert abs(approx[k].approx_parts - exact[k].n_parts) / exact[k].n_parts < 0.1
