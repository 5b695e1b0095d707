"""Image-collection store (A5): month partition pruning + bbox pushdown
must be visible in the plan, and pruned scans must return exactly the
partition's rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spatial_data_engineering_spark.fixtures import make_landsat_pixels


@pytest.fixture(scope="module")
def pixel_store(spark, tmp_path_factory):
    from spatial_data_engineering_spark.sources.raster import write_pixel_store

    out = str(tmp_path_factory.mktemp("pixstore"))
    pdf = make_landsat_pixels(step_m=400.0)  # coarser grid: fast fixture
    write_pixel_store(spark.createDataFrame(pdf), out)
    return out


def test_month_scan_prunes_partitions(spark, pixel_store):
    from spatial_data_engineering_spark.sources.raster import scan_pixels

    df = scan_pixels(spark, pixel_store, month="2020-06")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    assert "PartitionFilters" in plan and "month" in plan
    # pruned result equals the full-scan filter
    full = (spark.read.parquet(pixel_store)
            .filter(F.col("month") == "2020-06").count())
    assert df.count() == full and full > 0


def test_bbox_predicate_pushed(spark, pixel_store):
    from spatial_data_engineering_spark.sources.raster import scan_pixels

    df = scan_pixels(spark, pixel_store, month="2020-06",
                     bbox=(116.80, -1.15, 116.85, -1.10))
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    assert "GreaterThanOrEqual(lon" in plan  # reaches PushedFilters
    rows = df.select(F.min("lon"), F.max("lon")).collect()[0]
    if rows[0] is not None:
        assert rows[0] >= 116.80 and rows[1] <= 116.85


def test_downsample_is_deterministic_subset(spark, pixel_store):
    from spatial_data_engineering_spark.sources.raster import scan_pixels

    full = scan_pixels(spark, pixel_store, month="2020-06")
    down = scan_pixels(spark, pixel_store, month="2020-06", downsample=2)
    n_full, n_down = full.count(), down.count()
    assert 0 < n_down < n_full
    # run twice -> identical subset (deterministic, unlike EE bestEffort)
    again = scan_pixels(spark, pixel_store, month="2020-06", downsample=2)
    assert (down.select("scene_id", "lon", "lat").subtract(
        again.select("scene_id", "lon", "lat")).count() == 0)


def test_capped_scan_auto_picks_scale(spark, pixel_store):
    """scan_pixels_capped is the automatic bestEffort trigger: it must
    (1) leave small requests untouched, (2) pick the smallest k whose
    expected sample fits the budget, (3) stay deterministic across
    runs, and (4) land near the budget in realized count."""
    from spatial_data_engineering_spark.sources.raster import (
        scan_pixels, scan_pixels_capped)

    full = scan_pixels(spark, pixel_store, month="2020-06")
    n = full.count()
    assert n > 16

    # (1) budget >= request: no downsampling
    df, k = scan_pixels_capped(spark, pixel_store, max_pixels=n,
                               month="2020-06")
    assert k == 1 and df.count() == n

    # (2) budget forces a cap: smallest k with n/k^2 <= budget
    budget = n // 10
    df, k = scan_pixels_capped(spark, pixel_store, max_pixels=budget,
                               month="2020-06")
    assert k >= 2
    assert n / (k * k) <= budget < n / ((k - 1) * (k - 1))

    # (3) deterministic subset across runs
    df2, k2 = scan_pixels_capped(spark, pixel_store, max_pixels=budget,
                                 month="2020-06")
    assert k2 == k
    assert df.select("scene_id", "lon", "lat").subtract(
        df2.select("scene_id", "lon", "lat")).count() == 0

    # (4) realized count within Binomial noise of the expectation
    got = df.count()
    expected = n / (k * k)
    assert got <= budget * 2 and abs(got - expected) <= 5 * (expected ** 0.5) + 5

    import pytest as _pytest
    with _pytest.raises(ValueError):
        scan_pixels_capped(spark, pixel_store, max_pixels=0)
