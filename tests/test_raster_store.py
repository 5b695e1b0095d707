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
