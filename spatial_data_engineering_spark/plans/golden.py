"""Golden pipeline — full replication of the reference's analytical report
on the `lu` fixture (SURVEY.md §5.2 "Golden-pipeline replication").

One Catalyst DAG reproduces what the reference does with PostGIS + 84
sequential Earth Engine REST calls + pandas (load_report.py:452-523):

  view (lu ⨝ lu_csv, lower-cased aliases)         view_linked_data.sql:1-13
  -> ILIKE '%mangrove%'                           load_report.py:474
  -> groupBy(keterangan) + geometric union        load_report.py:471-476 (E1)
  -> ST_Transform 32750->4326                     load_report.py:472 (G1)
  -> total area: ->3857, ST_Area/10^4 ha          load_report.py:376-380 (G3)
  -> pixels: NDVI=(B5-B4)/(B5+B4), null-masked    load_report.py:75,156 (C8)
  -> spatial join pixels->dissolved geoms         filterBounds/reduceRegion (D2/D3)
  -> per-pixel-month median across scenes (E3), then zonal mean (E2) —
     EE's median composite then reduceRegion order, :77->:80
  -> dense month spine keeps empty months null    load_report.py:140-143 (F3)
  -> var_samp per category (ddof=1)               load_report.py:396 (E5)
  -> argmax + threshold CASE                      load_report.py:414,420-426 (E7,C10)
  -> Metric/Value report                          results/summary_report.csv:1-6

Divergences (documented, SURVEY.md §7 "hard" list): true calendar months
(not the reference's day-28/30 truncation); dissolve is collection-union
(fixture quads are disjoint in practice; overlaps keep both shells).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.st_funcs import st_area, st_geomfromtext, st_point, st_transform
from ..operators.common import davg
from ..operators.spatial_join import grid_spatial_join, union_agg

EPSG_LU = 32750


def golden_report(spark: SparkSession, fixture_dir: str,
                  area_pattern: str = "%mangrove%") -> DataFrame:
    lu = spark.read.parquet(f"{fixture_dir}/lu.parquet")
    lu_csv = spark.read.parquet(f"{fixture_dir}/lu_csv.parquet")
    pixels = spark.read.parquet(f"{fixture_dir}/landsat_pixels.parquet")

    # --- the view: inner equi-join, lower-cased aliases (C1, D1) ---------
    view = (
        lu.join(F.broadcast(lu_csv), "TEMA")
        .select(
            F.col("fid").alias("id"), F.col("TEMA").alias("tema"),
            F.col("LUSE").alias("luse"), F.col("KETERANGAN").alias("keterangan"),
            F.col("JENIS").alias("jenis"), F.col("SUMBER").alias("sumber"),
            F.col("geom_wkt"),
        )
    )

    # --- filter + dissolve + reproject (C3, E1, G1) ----------------------
    filtered = view.filter(F.col("keterangan").ilike(area_pattern)).select(
        "keterangan",
        st_transform(
            st_geomfromtext("geom_wkt"), F.lit(EPSG_LU), F.lit(4326)
        ).alias("geom"),
    )
    dissolved = union_agg(filtered, ["keterangan"], geom_col="geom")

    # --- total area in EPSG:3857 semantics (G3 fidelity note) ------------
    area_ha = (
        dissolved.select(
            st_area(st_transform("geom", F.lit(4326), F.lit(3857))).alias("a")
        )
        .agg((F.sum(F.col("a").cast("decimal(30,4)")).cast("double") / 10000.0)
             .alias("total_ha"))
    )

    # --- NDVI pixels -> spatial join -> median -> zonal mean (C8,D2,E3,E2)
    ndvi = pixels.select(
        "scene_id", "ts", "lon", "lat",
        F.when(F.col("sr_b5") + F.col("sr_b4") == 0, None)
        .otherwise((F.col("sr_b5") - F.col("sr_b4"))
                   / (F.col("sr_b5") + F.col("sr_b4"))).alias("ndvi"),
        st_point("lon", "lat").alias("geom"),
    )
    joined = grid_spatial_join(
        ndvi, dissolved,
        left_keys=["scene_id", "lon", "lat"], right_keys=["keterangan"],
        predicate="contains",  # cell: adaptive p95-extent default
    )
    month = F.date_format(F.date_trunc("month", "ts"), "yyyy-MM")
    per_pixel_month = (
        joined.filter(F.col("ndvi").isNotNull())
        .groupBy("keterangan", month.alias("month"), "lon", "lat")
        .agg(F.median("ndvi").alias("ndvi_px"))
    )
    monthly = per_pixel_month.groupBy("keterangan", "month").agg(
        davg("ndvi_px", "ndvi")
    )

    # --- variance -> argmax -> CASE (E5, E7, C10) ------------------------
    # No dense month spine here: var_samp skips nulls exactly like the
    # reference's pandas .var over None-padded months (load_report.py:393
    # drops them), so a spine would be dead computation — the F3
    # empty-month semantics are exercised by relational.q07 and the
    # monthly frame consumers.
    stats = monthly.groupBy("keterangan").agg(F.var_samp("ndvi").alias("variance"))

    # collect the tiny top/area results ONCE (unionByName branches over
    # `top` would re-run the sort/limit and the spatial pipeline prefix
    # per report row — exchange reuse only covers shuffled subtrees)
    top_rows = (
        stats.filter(F.col("variance").isNotNull())
        .orderBy(F.desc("variance"), F.asc("keterangan"))
        .limit(1)
        .collect()
    )
    area_rows = area_ha.collect()

    # --- Metric/Value report (results/summary_report.csv shape) ----------
    total_ha = area_rows[0]["total_ha"] if area_rows else None
    rows = [
        ("Total Mangrove Area (Ha)",
         None if total_ha is None else f"{total_ha:,.2f}"),
        ("Report Generated By", "spatial_data_engineering_spark"),
    ]
    if top_rows:
        t = top_rows[0]
        # the reference's verbatim strings (load_report.py:422-426),
        # single-sourced with q75 so report and query cannot drift
        from ..operators.relational import INFER_HIGH, INFER_LOW, INFER_MID
        inference = (
            INFER_HIGH if t["variance"] > 0.5 else
            INFER_MID if t["variance"] > 0.2 else
            INFER_LOW
        )
        rows += [
            ("Area with Highest Variation", t["keterangan"]),
            ("Variance", str(t["variance"])),
            ("Inference", inference),
        ]
    return spark.createDataFrame(rows, ["Metric", "Value"])
