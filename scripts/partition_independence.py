#!/usr/bin/env python
"""Partition-order independence check (the COVERAGE.md invariant).

Runs the given queries (default: all oracled) under two deliberately
different configs — local[16] with 16 shuffle partitions and local[5]
with 7 — and asserts the canonical outputs (columns sorted by name, rows
sorted) are bit-identical.  This is the property that makes the driver's
value hash stable under AQE re-plans and cluster re-sizing.

Usage: python scripts/partition_independence.py [q97_funnel q98_... | all]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


def canonical(df):
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(repr(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None))
    return cols, rows


def run_config(master: str, shuffle: int, names):
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master(master)
             .appName(f"pind-{shuffle}")
             .config("spark.sql.shuffle.partitions", str(shuffle))
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from spatial_data_engineering_spark.queries_registry import all_queries

    qs = all_queries()
    out = {}
    for n in names:
        out[n] = canonical(qs[n](spark, SF))
    spark.stop()
    return out


def main():
    from spatial_data_engineering_spark.queries_registry import all_queries
    import __spark_entry__ as entry

    args = sys.argv[1:]
    if not args or args == ["all"]:
        names = sorted(entry.oracle_sql())
    else:
        names = args
    unknown = set(names) - set(all_queries())
    if unknown:
        raise SystemExit(f"unknown queries: {sorted(unknown)}")

    a = run_config("local[16]", 16, names)
    b = run_config("local[5]", 7, names)
    bad = [n for n in names if a[n] != b[n]]
    for n in names:
        print(f"{n:36s} {'MISMATCH' if n in bad else 'identical'}")
    if bad:
        raise SystemExit(f"partition-order dependent: {bad}")
    print(f"\nall {len(names)} bit-identical under local[16]/16 vs local[5]/7")


if __name__ == "__main__":
    main()
