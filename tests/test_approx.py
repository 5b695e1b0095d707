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
    for k in exact:
        assert abs(approx[k].ap50 - exact[k].p50) / exact[k].p50 < 0.02
        assert abs(approx[k].ap95 - exact[k].p95) / exact[k].p95 < 0.02


def test_approx_count_distinct_within_bound(spark):
    from spatial_data_engineering_spark.operators.relational import (
        q15_count_distinct, q28_approx_distinct)

    exact = {r.l_returnflag: r for r in q15_count_distinct(spark, SF_ORACLE).collect()}
    approx = {r.l_returnflag: r for r in q28_approx_distinct(spark, SF_ORACLE).collect()}
    for k in exact:
        assert abs(approx[k].approx_parts - exact[k].n_parts) / exact[k].n_parts < 0.1
