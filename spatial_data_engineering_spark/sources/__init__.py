"""Sources & sinks (SURVEY.md §2 A/B).

Parquet is the engine's native format (A4/A5 raster-as-table scans are
plain parquet scans with partition pruning).  This package adds the
reference's remaining ingest/egress surfaces: CSV (A2), GeoPackage (A1),
JDBC (A3, stubbed — no driver jar in the container), replace-write tables
(B1/B2), schema DDL (B3), views (B5) and the CSV report sink (B6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def scan_csv(spark: SparkSession, path: str,
             schema: T.StructType | None = None, **options) -> DataFrame:
    """A2 (load_data.py:60-68): headered CSV scan; explicit schema
    preferred over inference for determinism (SURVEY.md §1.3)."""
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def scan_jdbc(spark: SparkSession, url: str, query: str, **options) -> DataFrame:
    """A3 (load_report.py:35-42): JDBC scan with query pushdown.

    Raw-URL form; ``sources.jdbc`` holds the full assembly (db_params →
    URL/options, PostGIS→WKB query wrapping, partitioned reads).  Requires
    the vendor driver jar on the Spark classpath; the test container has
    none, so the ``.load()`` step is exercised only for its error
    contract while the assembly itself is unit-tested.
    """
    reader = (spark.read.format("jdbc")
              .option("url", url).option("query", query))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def create_schema_if_not_exists(spark: SparkSession, name: str) -> None:
    """B3 (load_data.py:22-30)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def create_table_if_not_exists(spark: SparkSession,
                               create_table_query: str) -> None:
    """B4 (load_data.py:32-39): parametrized CREATE TABLE passthrough.

    The reference feeds an arbitrary caller-supplied DDL string to the
    connection (dead code there — main() never calls it); the Spark twin
    is the same passthrough with one guard: the statement must actually
    be a CREATE TABLE, because a passthrough named create_table that
    silently executes arbitrary SQL is an injection surface, not a
    convenience.  Idempotence comes from IF NOT EXISTS in the DDL itself,
    exactly as in the reference's usage."""
    stmt = create_table_query.strip()
    if not stmt.upper().startswith("CREATE TABLE"):
        raise ValueError(
            f"create_table_if_not_exists expects a CREATE TABLE statement, "
            f"got: {stmt[:60]!r}")
    spark.sql(stmt)


def create_or_replace_view(spark: SparkSession, name: str, sql: str) -> None:
    """B5 (query/view_linked_data.sql:1-2)."""
    spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {name} AS {sql}")


def write_table_replace(df: DataFrame, table: str) -> None:
    """B1/B2 (load_data.py:82-106 `if_exists='replace'`)."""
    df.write.mode("overwrite").saveAsTable(table)


def write_csv_report(df: DataFrame, path: str) -> None:
    """B6 (load_report.py:447-448): single-file metric/value report."""
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)


def write_sharded_corpus(df: DataFrame, path: str,
                         rows_per_shard: int,
                         order_col: str | None = None) -> None:
    """Training-corpus shard writer: parquet output with a TARGET shard
    size (rows_per_shard), the layout data loaders want — uniform shards,
    deterministic membership, optional global order.

    Mechanics: repartitionByRange on the order column (or a stable hash
    of the first column when unordered) into ceil(n/rows_per_shard)
    partitions gives near-uniform shard sizes from Spark's range sampler;
    maxRecordsPerFile caps any sampler miss at exactly rows_per_shard, so
    no shard ever exceeds the target.  At 100 TB this is the exact plan
    shape — one range shuffle, then parallel file writes; the row count
    here is a cheap distributed count.
    """
    import math

    from pyspark.sql import functions as F

    n = df.count()
    n_shards = max(1, math.ceil(n / rows_per_shard))
    key = F.col(order_col) if order_col else F.xxhash64(*df.columns[:1])
    (df.repartitionByRange(n_shards, key)
       .write.mode("overwrite")
       .option("maxRecordsPerFile", rows_per_shard)
       .parquet(path))


def zorder_layout(df: DataFrame, cols: list[str], path: str,
                  n_files: int = 16, bits: int = 16) -> None:
    """Multi-dimensional data layout: write parquet range-partitioned on
    the Z-order (Morton) interleave of two numeric columns, so files are
    tight in BOTH dimensions and min/max footer stats prune 2-D box
    predicates — the lakehouse OPTIMIZE ZORDER BY, as one range shuffle.

    A linear sort clusters only its leading column: every file spans the
    full range of the second, so a predicate on it prunes nothing.
    Z-ordering bounds each file's extent in both columns — the layout
    test measures WORST-CASE single-dimension pruning (max candidate
    files over x-slab and y-slab queries) at least halving vs linear
    sort.  Total bbox area is NOT the metric: for uniform data it is
    layout-invariant (strips and squares both tile the domain); the win
    is balance, not area.

    Mechanics: each column min-max-normalizes to a ``bits``-bit integer
    (one 1-row aggregate), the Morton code interleaves the bit planes —
    pure codegen shifts/masks — and repartitionByRange on the code plus a
    per-file sort gives monotone Z-runs per file.  Degenerate (constant)
    columns quantize to 0 and drop out of the interleave harmlessly.
    """
    from pyspark.sql import functions as F

    if len(cols) != 2:
        raise ValueError("zorder_layout interleaves exactly 2 columns")
    a, b = cols
    mm = df.agg(F.min(a).alias("a0"), F.max(a).alias("a1"),
                F.min(b).alias("b0"), F.max(b).alias("b1")).collect()[0]
    span_a = (mm["a1"] - mm["a0"]) or 1
    span_b = (mm["b1"] - mm["b0"]) or 1
    top = (1 << bits) - 1
    qa = F.least(
        F.lit(top),
        ((F.col(a) - F.lit(mm["a0"])) / F.lit(span_a) * top).cast("long"))
    qb = F.least(
        F.lit(top),
        ((F.col(b) - F.lit(mm["b0"])) / F.lit(span_b) * top).cast("long"))
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (z
             + F.shiftleft(F.shiftright(qa, i).bitwiseAND(F.lit(1)), 2 * i)
             + F.shiftleft(F.shiftright(qb, i).bitwiseAND(F.lit(1)),
                           2 * i + 1))
    (df.withColumn("__z", z)
       .repartitionByRange(n_files, "__z")
       .sortWithinPartitions("__z")
       .drop("__z")
       .write.mode("overwrite").parquet(path))


def write_jsonl_corpus(df: DataFrame, path: str,
                       compression: str | None = "gzip") -> None:
    """JSONL corpus sink — the interchange format training corpora ship
    in (one JSON object per line, optionally gzip member-per-file, which
    concatenates into a valid .jsonl.gz).

    Spark's json writer IS JSONL (one object per line per file part), so
    this is a thin, named wrapper that pins the two decisions that
    matter: explicit compression (splittable-at-file-granularity) and
    ignoreNullFields=false so absent vs null survive a round trip —
    loaders distinguish a missing key from an explicit null.
    """
    w = df.write.mode("overwrite").option("ignoreNullFields", "false")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def scan_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSONL corpus scan.  An explicit schema skips the whole-corpus
    inference pass (at 100 TB, schema inference IS a full extra read);
    corrupt lines land in _corrupt_record under the default PERMISSIVE
    mode instead of failing the scan, mirroring how curation pipelines
    quarantine bad lines rather than abort.
    """
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    else:
        r = r.option("columnNameOfCorruptRecord", "_corrupt_record")
    return r.json(path)


def merge_upsert(spark: SparkSession, target_path: str, updates: DataFrame,
                 key: str) -> dict:
    """MERGE INTO emulation over plain parquet: upsert `updates` into the
    table at target_path by key — matched rows are replaced, unmatched
    rows are inserted, and every other target row is carried unchanged.

    Mechanics: read target, left-anti join target->updates on the key
    (the carried set), union the updates, atomic swap via write-to-temp +
    rename.  This is the copy-on-write strategy every table format uses
    under MERGE; a real lakehouse write would rewrite only the touched
    files — here file granularity is the whole table, which is the
    correct local twin.  The anti-join hashes on the (uniform) key and
    the updates side broadcasts when small — at 100 TB with bucketed
    targets it is co-located and shuffle-free (test_bucketing's pattern).

    Returns {"matched": n_replaced, "inserted": n_new, "total": n_after}.
    """
    import os
    import shutil

    target = spark.read.parquet(target_path)
    n_before = target.count()
    carried = target.join(updates.select(key), key, "left_anti")
    merged = carried.unionByName(updates)
    n_after = merged.count()
    inserted = n_after - n_before
    matched = updates.count() - inserted

    tmp = target_path.rstrip("/") + ".__merge_tmp__"
    merged.write.mode("overwrite").parquet(tmp)
    # the swap is the commit point (a table format would swap a manifest)
    shutil.rmtree(target_path)
    os.rename(tmp, target_path)
    return {"matched": matched, "inserted": inserted, "total": n_after}


def observed_write(df: DataFrame, path: str, metrics: dict | None = None,
                   fmt: str = "parquet") -> dict:
    """Write a table while collecting pipeline metrics IN THE SAME JOB
    via Spark's Observation API — no second scan.

    `metrics` maps metric name -> aggregate Column (default: row count).
    The observation rides the write's single pass over the data, so at
    100 TB the "how many rows/tokens did we just ship" dashboard numbers
    are free, instead of a full re-read (the usual post-write COUNT(*)
    doubles the job's I/O).  Returns the observed metric dict.

    Caveats (documented Spark semantics): metrics must be single-pass
    aggregates — DISTINCT aggregates are rejected by the analyzer (use
    approx_count_distinct, a mergeable sketch); and observed metrics
    reflect the rows the write actually processed — if the write fails
    partway they are undefined, so read them only after a successful
    commit.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    if metrics is None:
        metrics = {"n_rows": F.count(F.lit(1))}
    obs = Observation("observed_write")
    named = [c.alias(n) for n, c in metrics.items()]
    observed = df.observe(obs, *named)
    observed.write.mode("overwrite").format(fmt).save(path)
    return dict(obs.get)
