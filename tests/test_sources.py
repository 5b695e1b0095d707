"""Sources/sinks tests: CSV scan, gpkg ingest (self-built fixture), CSV
report sink, views/DDL."""

from __future__ import annotations

import sqlite3
import struct

import pandas as pd
import pytest

from spatial_data_engineering_spark.functions import geometry as G


def _make_gpkg(path: str):
    """Minimal spec-conformant GeoPackage: gpkg_contents +
    gpkg_geometry_columns + one feature table with GPB geometry blobs."""
    con = sqlite3.connect(path)
    con.execute("PRAGMA application_id = 0x47504B47")
    con.execute(
        "CREATE TABLE gpkg_contents (table_name TEXT PRIMARY KEY, "
        "data_type TEXT, identifier TEXT, srs_id INTEGER)")
    con.execute(
        "CREATE TABLE gpkg_geometry_columns (table_name TEXT, "
        "column_name TEXT, geometry_type_name TEXT, srs_id INTEGER, "
        "z TINYINT, m TINYINT)")
    con.execute(
        "CREATE TABLE lu (fid INTEGER PRIMARY KEY, geom BLOB, "
        "LUSE TEXT, KETERANGAN TEXT, TEMA TEXT)")
    con.execute(
        "INSERT INTO gpkg_contents VALUES ('lu', 'features', 'lu', 32750)")
    con.execute(
        "INSERT INTO gpkg_geometry_columns VALUES "
        "('lu', 'geom', 'MULTIPOLYGON', 32750, 0, 0)")

    def gpb(geom) -> bytes:
        wkb = G.wkb_dumps(geom)
        # header: magic 'GP', version 0, flags: LE byte order, no envelope
        return b"GP\x00\x01" + struct.pack("<i", 32750) + wkb

    rows = [
        (1, gpb(("MultiPolygon", [G.make_box(476300, 9873100, 476500, 9873300)[1]])),
         "Kawasan Hutan Bakau", "Mangrove Sungai Sanrumukti", "Hutan"),
        (2, gpb(("MultiPolygon", [G.make_box(477000, 9875000, 477200, 9875400)[1]])),
         "Sungai", "Sungai Tengah", "Hutan"),
    ]
    con.executemany("INSERT INTO lu VALUES (?,?,?,?,?)", rows)
    con.commit()
    con.close()


def test_gpkg_ingest(spark, tmp_path):
    from spatial_data_engineering_spark.sources.gpkg import (
        ingest_gpkg, list_feature_tables)

    path = str(tmp_path / "lu.gpkg")
    _make_gpkg(path)
    assert list_feature_tables(path) == ["lu"]

    df = ingest_gpkg(spark, path, "lu")
    rows = df.orderBy("fid").collect()
    assert len(rows) == 2
    g = G.wkb_loads(bytes(rows[0]["geom"]))
    assert g[0] == "MultiPolygon"
    assert abs(G.area(g) - 200 * 200) < 1e-6
    assert df.schema["geom"].metadata["crs"] == "EPSG:32750"


def test_gpkg_missing_crs_aborts(spark, tmp_path):
    from spatial_data_engineering_spark.sources.gpkg import ingest_gpkg

    path = str(tmp_path / "bad.gpkg")
    _make_gpkg(path)
    con = sqlite3.connect(path)
    con.execute("UPDATE gpkg_geometry_columns SET srs_id = 0")
    con.commit()
    con.close()
    with pytest.raises(ValueError, match="CRS is not defined"):
        ingest_gpkg(spark, path, "lu")


def test_csv_scan_and_report_sink(spark, tmp_path):
    from spatial_data_engineering_spark.sources import (
        create_or_replace_view, scan_csv, write_csv_report)

    src = tmp_path / "lu.csv"
    src.write_text("TEMA,JENIS,SUMBER\nHutan,Hutan Rimba,Interpretasi\n")
    df = scan_csv(spark, str(src))
    assert df.columns == ["TEMA", "JENIS", "SUMBER"] and df.count() == 1

    df.createOrReplaceTempView("csv_tbl")
    create_or_replace_view(spark, "v_lu_csv", "SELECT * FROM csv_tbl")
    assert spark.sql("SELECT * FROM v_lu_csv").count() == 1

    out = str(tmp_path / "report")
    write_csv_report(df, out)
    back = pd.concat(
        [pd.read_csv(p) for p in __import__("glob").glob(f"{out}/*.csv")]
    )
    assert list(back.TEMA) == ["Hutan"]


def test_jdbc_error_contract(spark):
    from spatial_data_engineering_spark.sources import scan_jdbc

    with pytest.raises(Exception):
        # no driver jar in the container: surface must fail loudly, not hang
        scan_jdbc(spark, "jdbc:postgresql://localhost:5434/none",
                  "SELECT 1").collect()


def test_jdbc_assembly_pushdown_sql():
    """A3 assembly: the pushed SQL and options dict are constructed
    exactly — testable with no driver jar (reference semantics:
    load_report.py:471-476 pushed through load_report.py:35-42)."""
    from spatial_data_engineering_spark.sources.jdbc import (
        assemble_scan, jdbc_url, partition_options, postgis_wkb_query)

    params = {"user": "u", "password": "s3c", "host": "db.example",
              "port": 5432, "dbname": "gis"}
    assert jdbc_url(params) == "jdbc:postgresql://db.example:5432/gis"

    inner = ("SELECT 1 id, keterangan, "
             "ST_Union(ST_Transform(geometry, 4326)) as geom "
             "FROM staging.linked_data_view "
             "WHERE keterangan ILIKE '%mangrove%' GROUP BY keterangan")
    wrapped = postgis_wkb_query(inner, "geom", columns=["id", "keterangan"])
    assert wrapped == (
        "SELECT src.id, src.keterangan, ST_AsBinary(src.geom) AS geom "
        f"FROM ({inner}) src")

    url, pushed, opts = assemble_scan(params, inner, geom_col="geom",
                                      columns=["id", "keterangan"])
    assert url == "jdbc:postgresql://db.example:5432/gis"
    assert pushed == wrapped
    assert opts == {"driver": "org.postgresql.Driver",
                    "fetchsize": "10000", "user": "u", "password": "s3c",
                    "query": wrapped}
    assert "s3c" not in url  # credentials never ride the URL

    # partitioned read switches to derived-table dbtable semantics
    part = partition_options("id", 0, 1000, 8)
    _, _, opts2 = assemble_scan(params, inner, geom_col="geom",
                                columns=["id", "keterangan"],
                                partitioning=part)
    assert opts2["dbtable"] == f"({wrapped}) pushed_q"
    assert "query" not in opts2
    assert opts2["numPartitions"] == "8"
    assert opts2["lowerBound"] == "0" and opts2["upperBound"] == "1000"

    import pytest as _pytest
    with _pytest.raises(ValueError):
        partition_options("id", 10, 10, 4)
    with _pytest.raises(ValueError):
        partition_options("id", 0, 10, 0)
    with _pytest.raises(ValueError):
        jdbc_url({"host": "h", "port": 1})


def test_jdbc_assembled_scan_error_contract(spark):
    from spatial_data_engineering_spark.sources import jdbc

    params = {"host": "localhost", "port": 5434, "dbname": "none"}
    with pytest.raises(Exception):
        # assembly succeeds; .load() must fail loudly without a driver jar
        jdbc.scan(spark, params, "SELECT 1 AS x").collect()


def test_create_table_passthrough(spark):
    """B4: the parametrized CREATE TABLE passthrough executes real DDL,
    is idempotent via IF NOT EXISTS, and rejects non-CREATE-TABLE SQL."""
    import pytest

    from spatial_data_engineering_spark import sources

    spark.sql("CREATE DATABASE IF NOT EXISTS b4demo")
    ddl = ("CREATE TABLE IF NOT EXISTS b4demo.sensor "
           "(id BIGINT, name STRING, reading DOUBLE) USING parquet")
    sources.create_table_if_not_exists(spark, ddl)
    sources.create_table_if_not_exists(spark, ddl)  # idempotent
    cols = [f.name for f in spark.table("b4demo.sensor").schema.fields]
    assert cols == ["id", "name", "reading"]
    with pytest.raises(ValueError, match="CREATE TABLE"):
        sources.create_table_if_not_exists(spark, "DROP TABLE b4demo.sensor")
    spark.sql("DROP TABLE IF EXISTS b4demo.sensor")
    spark.sql("DROP DATABASE IF EXISTS b4demo")


def test_gpkg_datasource_matches_ingest(spark, tmp_path):
    """The Spark-native gpkg DataSource must produce the same rows as the
    driver-side ingest_gpkg on the same file (schema convention: source
    columns minus the blob, plus 'geom' WKB)."""
    from spatial_data_engineering_spark.sources.gpkg import ingest_gpkg
    from spatial_data_engineering_spark.sources.gpkg_datasource import (
        register)

    path = str(tmp_path / "ds.gpkg")
    _make_gpkg(path)
    register(spark)
    df = (spark.read.format("gpkg")
          .options(path=path, table="lu").load())
    got = {(r.fid, bytes(r.geom), r.LUSE) for r in df.collect()}
    exp = {(r.fid, bytes(r.geom), r.LUSE)
           for r in ingest_gpkg(spark, path, "lu").collect()}
    assert got == exp and len(got) == 2


def test_gpkg_datasource_partitioned_read(spark, tmp_path):
    """1000-row table split across 8 rowid-range partitions: no row lost,
    none duplicated, and the scan genuinely runs in >1 task."""
    import sqlite3 as _sq

    from spatial_data_engineering_spark.sources.gpkg_datasource import (
        register)

    path = str(tmp_path / "big.gpkg")
    _make_gpkg(path)
    con = _sq.connect(path)

    def gpb(geom) -> bytes:
        wkb = G.wkb_dumps(geom)
        return b"GP\x00\x01" + struct.pack("<i", 32750) + wkb

    rows = [(100 + i,
             gpb(("Polygon", [[(i, 0), (i + 1, 0), (i + 1, 1), (i, 1),
                               (i, 0)]])),
             f"luse{i}", "k", "t") for i in range(1000)]
    con.executemany("INSERT INTO lu VALUES (?,?,?,?,?)", rows)
    con.commit()
    con.close()

    register(spark)
    df = (spark.read.format("gpkg")
          .options(path=path, table="lu", partitions="8").load())
    assert df.rdd.getNumPartitions() == 8
    from pyspark.sql import functions as F
    agg = df.agg(F.count("*").alias("n"),
                 F.countDistinct("fid").alias("d"),
                 F.sum("fid").alias("s")).collect()[0]
    assert agg["n"] == 1002 and agg["d"] == 1002
    # 2 fixture rows (fid 1,2) + sum(100..1099)
    assert agg["s"] == 3 + sum(range(100, 1100))


def test_gpkg_datasource_crs_validation(spark, tmp_path):
    import sqlite3 as _sq

    import pytest as _pt

    from spatial_data_engineering_spark.sources.gpkg_datasource import (
        register)

    path = str(tmp_path / "nocrs.gpkg")
    _make_gpkg(path)
    con = _sq.connect(path)
    con.execute("UPDATE gpkg_geometry_columns SET srs_id = 0")
    con.commit()
    con.close()
    register(spark)
    with _pt.raises(Exception, match="CRS is not defined"):
        spark.read.format("gpkg").options(path=path, table="lu").load() \
            .schema


def test_gpkg_datasource_on_reference_file(spark):
    """On the reference's real lu.gpkg (when present): the DataSource
    must agree with ingest_gpkg row-for-row on fid and geometry bytes."""
    import os

    import pytest as _pt

    real = "/root/reference/data/lu.gpkg"
    if not os.path.exists(real):
        _pt.skip("reference lu.gpkg not present")
    from spatial_data_engineering_spark.sources.gpkg import (
        ingest_gpkg, list_feature_tables)
    from spatial_data_engineering_spark.sources.gpkg_datasource import (
        register)

    (table,) = list_feature_tables(real)
    register(spark)
    df = (spark.read.format("gpkg")
          .options(path=real, table=table, partitions="4").load())
    exp = ingest_gpkg(spark, real, table)
    assert df.count() == exp.count() > 0
    key = exp.columns[0]
    got_g = {(r[key], bytes(r["geom"])) for r in df.select(key, "geom").collect()}
    exp_g = {(r[key], bytes(r["geom"])) for r in exp.select(key, "geom").collect()}
    assert got_g == exp_g


def test_write_sharded_corpus(spark, tmp_path):
    """Shard writer contract: no file exceeds the target, the shard-size
    distribution is near-uniform, and the data round-trips exactly."""
    import glob

    from pyspark.sql import functions as F

    from spatial_data_engineering_spark import sources
    from spatial_data_engineering_spark.catalog import load

    docs = load(spark, "/root/testdata/sf0.01", "documents")
    out = str(tmp_path / "shards")
    sources.write_sharded_corpus(docs, out, rows_per_shard=64,
                                 order_col="doc_id")
    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) >= 500 // 64
    sizes = [spark.read.parquet(f).count() for f in files]
    assert max(sizes) <= 64                      # hard cap holds
    assert sum(sizes) == docs.count()            # nothing lost/duplicated
    back = spark.read.parquet(out)
    assert back.select(F.sum("doc_id")).collect()[0][0] == \
        docs.select(F.sum("doc_id")).collect()[0][0]


def test_zorder_layout_balances_pruning(spark, tmp_path):
    """Z-order vs linear sort on 2-D point data.  The right metric is
    WORST-CASE single-dimension pruning: a linear x-sort prunes x-slab
    queries perfectly but y-slab queries not at all (every file spans the
    full y range), while Z-order bounds both dimensions.  Assert the max
    over {x-slab, y-slab} of candidate files (by footer min/max
    intersection) is at least 2x smaller under Z-order, and the data
    round-trips exactly."""
    import numpy as np
    from pyspark.sql import functions as F

    from spatial_data_engineering_spark import sources

    rng = np.random.RandomState(7)
    pts = [(int(i), float(x), float(y)) for i, (x, y) in enumerate(
        zip(rng.uniform(0, 1000, 20000), rng.uniform(0, 1000, 20000)))]
    df = spark.createDataFrame(pts, ["id", "x", "y"])

    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    sources.zorder_layout(df, ["x", "y"], zpath, n_files=16)
    (df.repartitionByRange(16, "x").sortWithinPartitions("x")
       .write.mode("overwrite").parquet(lpath))

    def candidates(path, col, lo, hi):
        per_file = (spark.read.parquet(path)
                    .groupBy(F.input_file_name().alias("f"))
                    .agg(F.min(col).alias("lo"), F.max(col).alias("hi")))
        return per_file.filter((F.col("hi") >= lo)
                               & (F.col("lo") <= hi)).count()

    z_worst = max(candidates(zpath, "x", 100, 150),
                  candidates(zpath, "y", 100, 150))
    l_worst = max(candidates(lpath, "x", 100, 150),
                  candidates(lpath, "y", 100, 150))
    assert z_worst * 2 <= l_worst, (z_worst, l_worst)
    # exactness: nothing lost or duplicated
    assert (spark.read.parquet(zpath).agg(F.sum("id")).collect()[0][0]
            == df.agg(F.sum("id")).collect()[0][0])
    assert spark.read.parquet(zpath).count() == 20000


def test_jsonl_round_trip_preserves_nulls(spark, tmp_path):
    """JSONL sink/scan: byte-level JSONL layout, explicit nulls survive,
    schema'd scan returns the exact input."""
    import gzip
    import json
    import os

    from pyspark.sql import Row

    from spatial_data_engineering_spark import sources

    df = spark.createDataFrame([
        Row(doc_id=1, text="hello world", lang="en"),
        Row(doc_id=2, text="bonjour", lang=None),  # explicit null
        Row(doc_id=3, text='quote " and \n newline', lang="de"),
    ])
    path = str(tmp_path / "corpus_jsonl")
    sources.write_jsonl_corpus(df, path)

    # raw layout: every non-empty line parses as one JSON object, and the
    # null field is PRESENT (ignoreNullFields=false)
    lines = []
    for fn in os.listdir(path):
        if fn.startswith("part-"):
            with gzip.open(os.path.join(path, fn), "rt") as fh:
                lines += [ln for ln in fh.read().splitlines() if ln]
    assert len(lines) == 3
    objs = {json.loads(ln)["doc_id"]: json.loads(ln) for ln in lines}
    assert "lang" in objs[2] and objs[2]["lang"] is None

    back = sources.scan_jsonl(spark, path, schema=df.schema)
    assert sorted(back.collect()) == sorted(df.collect())


def test_jsonl_scan_quarantines_corrupt_lines(spark, tmp_path):
    import os

    from spatial_data_engineering_spark import sources

    p = tmp_path / "bad"
    os.makedirs(p)
    (p / "part-0.json").write_text(
        '{"doc_id": 1, "text": "ok"}\nNOT JSON AT ALL\n'
        '{"doc_id": 2, "text": "also ok"}\n')
    df = sources.scan_jsonl(spark, str(p))
    rows = df.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and "NOT JSON" in bad[0]["_corrupt_record"]
    assert sorted(r["doc_id"] for r in rows if r["doc_id"] is not None) \
        == [1, 2]


def test_merge_upsert_replaces_and_inserts(spark, tmp_path):
    from pyspark.sql import Row

    from spatial_data_engineering_spark import sources

    path = str(tmp_path / "tbl")
    spark.createDataFrame([
        Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c"),
    ]).write.parquet(path)
    updates = spark.createDataFrame([
        Row(k=2, v="B2"),   # matched -> replaced
        Row(k=9, v="new"),  # unmatched -> inserted
    ])
    stats = sources.merge_upsert(spark, path, updates, "k")
    assert stats == {"matched": 1, "inserted": 1, "total": 4}
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B2", 3: "c", 9: "new"}
    # idempotent re-merge of the same updates changes nothing but stats
    stats2 = sources.merge_upsert(spark, path, updates, "k")
    assert stats2 == {"matched": 2, "inserted": 0, "total": 4}
    got2 = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got2 == got


def test_observed_write_metrics_match_separate_aggregation(spark, tmp_path):
    from pyspark.sql import functions as F

    from spatial_data_engineering_spark import sources

    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 7).alias("k"),
        F.concat(F.lit("w "), F.col("id").cast("string")).alias("text"))
    path = str(tmp_path / "observed")
    got = sources.observed_write(
        df, path,
        metrics={"n_rows": F.count(F.lit(1)),
                 "sum_id": F.sum("id"),
                 "n_keys": F.approx_count_distinct("k")})
    assert got["n_rows"] == 1000 and got["sum_id"] == 499500
    assert got["n_keys"] == 7  # 7 distinct values, far under sketch error
    # the write itself is intact
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert back.agg(F.sum("id")).collect()[0][0] == 499500


def test_relation_cache_identity_and_invalidation(spark, tmp_path):
    """catalog.load memoizes the analyzed relation per session.

    Resolving a parquet relation costs ~100 ms of driver time (listing +
    footer schema + analysis); the suite resolves the same ten tables
    hundreds of times, so load() hands back the SAME DataFrame object
    within a session — safe because DataFrames are immutable — and
    invalidates on the table file's stat fingerprint so an in-place
    rewrite (stress scripts, streaming fixtures) is picked up.
    """
    import time

    from spatial_data_engineering_spark.catalog import load

    sf = str(tmp_path)
    spark.range(5).write.mode("overwrite").parquet(f"{sf}/nation.parquet")
    a = load(spark, sf, "nation")
    assert load(spark, sf, "nation") is a  # cache hit: same object
    assert a.count() == 5
    time.sleep(0.02)  # ensure mtime_ns moves even on coarse filesystems
    spark.range(9).write.mode("overwrite").parquet(f"{sf}/nation.parquet")
    b = load(spark, sf, "nation")
    assert b is not a  # fingerprint change evicted the stale entry
    assert b.count() == 9
    # unknown tables still rejected, and a missing file is not cached
    with pytest.raises(KeyError):
        load(spark, sf, "not_a_table")
