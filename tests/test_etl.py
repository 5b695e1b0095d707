"""End-to-end §3.1 ETL pipeline on a self-built GeoPackage + CSV."""

from __future__ import annotations

import pytest

from spatial_data_engineering_spark.functions import geometry as G

from .test_sources import _make_gpkg


def test_run_etl_end_to_end(spark, tmp_path):
    from spatial_data_engineering_spark.plans.etl import run_etl

    gpkg = str(tmp_path / "lu.gpkg")
    _make_gpkg(gpkg)
    csv = tmp_path / "lu.csv"
    csv.write_text("TEMA,JENIS,SUMBER\nHutan,Hutan Rimba,Interpretasi FU\n")

    view = run_etl(spark, gpkg, str(csv), table_prefix="t_etl")
    rows = view.orderBy("id").collect()

    # join fan-out: 2 features x 1 matching attribute row
    assert [r.id for r in rows] == [1, 2]
    assert {r.tema for r in rows} == {"Hutan"}
    assert rows[0].jenis == "Hutan Rimba"
    # lower-cased aliases as in view_linked_data.sql:3-10
    assert view.columns == ["id", "tema", "luse", "keterangan", "jenis",
                            "sumber", "geom"]
    # geometry survived the pipeline as WKB
    g = G.wkb_loads(bytes(rows[0].geom))
    assert g[0] == "MultiPolygon"

    # the ILIKE consumer works against the view (load_report.py:471-476)
    n = spark.sql(
        "SELECT count(*) AS n FROM t_etl_linked_data_view "
        "WHERE keterangan ILIKE '%mangrove%'"
    ).collect()[0].n
    assert n == 1


def test_run_etl_missing_input_fails_loudly(spark, tmp_path):
    from spatial_data_engineering_spark.plans.etl import run_etl

    with pytest.raises(FileNotFoundError):
        run_etl(spark, str(tmp_path / "nope.gpkg"), str(tmp_path / "nope.csv"))
    # a directory passes os.path.exists but must fail the isfile guard
    with pytest.raises(FileNotFoundError):
        run_etl(spark, str(tmp_path), str(tmp_path))


def test_add_id_column_replaces_existing_id(spark):
    from spatial_data_engineering_spark.plans.etl import add_id_column

    df = spark.createDataFrame([(10, "a"), (20, "b")], ["id", "name"])
    out = add_id_column(df, "name")
    assert out.columns == ["id", "name"]  # no duplicate 'id'
    assert [r.id for r in out.orderBy("name").collect()] == [1, 2]


def test_csv_table_gets_id_and_schema(spark, tmp_path):
    from spatial_data_engineering_spark.plans.etl import run_etl

    gpkg = str(tmp_path / "lu.gpkg")
    _make_gpkg(gpkg)
    # numeric-looking TEMA must stay a string (pinned schema, no inference)
    csv = tmp_path / "lu.csv"
    csv.write_text("TEMA,JENIS,SUMBER\nHutan,Hutan Rimba,X\n")
    run_etl(spark, gpkg, str(csv), table_prefix="t_etl2")
    csv_tbl = spark.table("t_etl2_tb_lu_csv_dataset")
    assert csv_tbl.columns == ["id", "TEMA", "JENIS", "SUMBER"]
    assert dict(csv_tbl.dtypes)["TEMA"] == "string"
