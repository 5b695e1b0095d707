"""Local replica of the driver's Spark-vs-DuckDB oracle compare.

Mirrors BASELINE.md t2: row count + column-name schema + order-insensitive
value comparison (columns sorted by name).  Stricter than the driver on
values (exact equality after canonicalization) so that passing here implies
passing any reasonable hash.

DRIVER-FAITHFUL TYPES (round 6): ints are NOT coerced to float.  The round-5
driver red row (q112) was exactly an int64-vs-float64 divergence — DuckDB
SUM over integers returns HUGEINT, which pandas renders as float64 — that
the old int->float canonicalization masked.  An int 1 and a float 1.0 now
compare UNEQUAL here, same as the driver's value hash.  Oracles must CAST
integer-typed aggregates (DuckDB HUGEINT/DECIMAL promotions) to BIGINT.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"  # distinct from None so NULL-vs-NaN divergences fail
        return float(v)
    if isinstance(v, (bool,)):
        return bool(v)
    if isinstance(v, int):
        return int(v)
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    try:
        import numpy as np

        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, np.floating):
            return "NaN" if math.isnan(float(v)) else float(v)
        if isinstance(v, np.ndarray):
            return tuple(_canon_value(x) for x in v.tolist())
        if isinstance(v, np.bool_):
            return bool(v)
    except ImportError:
        pass
    return v


def _canon_frame(df: pd.DataFrame):
    cols = sorted(df.columns)
    rows = []
    for row in df[cols].itertuples(index=False, name=None):
        rows.append(tuple(_canon_value(v) for v in row))
    key = repr
    return cols, sorted(rows, key=key)


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str = "?"):
    spark_pdf = spark_df.toPandas()
    scols, srows = _canon_frame(spark_pdf)
    ocols, orows = _canon_frame(oracle_pdf)
    assert scols == ocols, f"{name}: column mismatch spark={scols} oracle={ocols}"
    assert len(srows) == len(orows), (
        f"{name}: row count spark={len(srows)} oracle={len(orows)}"
    )
    mismatches = [
        (i, s, o) for i, (s, o) in enumerate(zip(srows, orows)) if s != o
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
    )
