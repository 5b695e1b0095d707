"""Table registry over the driver-provided parquet testdata.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file each under an sf directory.

Parquet scans are the engine's base relation: self-describing schema,
column pruning and predicate/row-group pushdown for free.  At 100 TB the
same call reads a partitioned directory tree; nothing here assumes a single
file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which the Spark reader
        # rejects ([PARQUET_TYPE_ILLEGAL]).  Read it as long nanos via the
        # legacy conf (session-settable, so this works under any harness
        # session too) and truncate to microseconds with exact integer
        # division — double division would lose sub-µs bits at 1.7e18 ns.
        # DELIBERATE SESSION-WIDE POLICY: the conf stays set for the
        # session's lifetime (restoring it would break this frame's own
        # lazy scan at execution time); any later nanos-parquet read in
        # the same session therefore yields LongType instead of failing —
        # normalize it the same way this function does.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Session TZ is part of the same policy: timestamp VALUES are
        # TZ-independent epoch micros, but every render/collect boundary
        # (toPandas, hash compare, date_trunc) reinterprets them in
        # spark.sql.session.timeZone — under a vanilla session on a
        # non-UTC host every events timestamp would diverge from DuckDB's
        # naive (UTC-wall-clock) reading.  Confs resolve lazily at
        # execution, so setting them here covers this frame's own scan.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, T.LongType):
            # floor division (pmod keeps the remainder non-negative): `div`
            # alone truncates toward zero, which would round pre-1970
            # nanos UP one microsecond, diverging from DuckDB's epoch floor.
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("(ts - pmod(ts, 1000)) div 1000")))
        elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
            # Some generators write TIMESTAMP(MICROS, isAdjustedToUTC=false)
            # which Spark reads as TIMESTAMP_NTZ — a type unix_micros/
            # window() reject.  The NTZ->timestamp cast reinterprets the
            # wall clock in spark.sql.session.timeZone — exactly why the
            # UTC pin above is unconditional: under a vanilla session on a
            # non-UTC host the bare cast would shift every value away from
            # DuckDB's naive reading.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register each table as a temp view so SQL-form operators can run.

    Mirrors the reference's CREATE OR REPLACE VIEW usage
    (query/view_linked_data.sql:1-2) — views are virtual, inlined by
    Catalyst exactly as Postgres inlines them (SURVEY.md §4).
    """
    for name in tables:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
