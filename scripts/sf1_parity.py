"""Oracle parity at sf1 (round 11): the driver's t2 check — row count +
column names + order-insensitive value hash vs DuckDB — normally runs at
sf0.01; this sweep re-proves it on the 10x corpus, turning "correct at
test scale" into "correct at both measured scales".

Quadratic-ORACLE queries are skipped by list (the Spark side is fine;
the DuckDB twin is a deliberate all-pairs baseline that costs O(n^2)
rows at 20k vectors / 50k docs — q50/q154/q49 and the exact-Jaccard
full verify of q47's audit twin q156).  Everything else runs with a
per-query stopwatch so one slow oracle can't hide in an aggregate time.

Usage: python scripts/sf1_parity.py [skip_extra,comma,separated]
Exit 0 iff every attempted query matches.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
os.environ["PYTHONPATH"] = (
    REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))

SF1 = os.path.join(REPO, "testdata_sf1")

# oracles that are deliberate O(n^2) SQL baselines — DuckDB-side cost,
# not a Spark-side concern (their Spark plans run in the sf1 frontier
# probe every round)
SKIP = {
    "q50_embedding_neardup", "q154_knn_label_accuracy", "q49_cosine_topk",
    "q156_minhash_estimate_audit",
}


def main() -> int:
    extra = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else set()
    skip = SKIP | {s for s in extra if s}

    from pyspark.sql import SparkSession

    from parity import TABLES, compare

    import duckdb

    def duckdb_connection_sf1(sf_dir: str):
        # sf1 tables are Spark-written DIRECTORIES (table.parquet/part-*)
        # where the driver testdata uses single files — glob accordingly
        con = duckdb.connect()
        for t in TABLES:
            p = os.path.join(sf_dir, f"{t}.parquet")
            pat = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.sql(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{pat}')")
        return con

    spark = (SparkSession.builder.master("local[8]")
             .appName("sf1-parity")
             .config("spark.driver.memory", "24g")  # sf1 broadcasts OOM the 1g default
             .config("spark.ui.enabled", "false")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    duck = duckdb_connection_sf1(SF1)
    n_ok = n_skip = 0
    failures: dict[str, str] = {}
    for i, name in enumerate(qs, 1):
        if name in skip or name not in os_:
            tag = "SKIP(quadratic-oracle)" if name in skip else \
                "SKIP(no-oracle)"
            print(f"[{i}/{len(qs)}] {name:40} {tag}", flush=True)
            n_skip += 1
            continue
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, SF1)
            oracle_pdf = duck.sql(os_[name]).df()
            compare(df, oracle_pdf, name=name)
            dt = time.perf_counter() - t0
            print(f"[{i}/{len(qs)}] {name:40} PASS  ({dt:.1f}s)",
                  flush=True)
            n_ok += 1
        except Exception as ex:  # noqa: BLE001
            dt = time.perf_counter() - t0
            failures[name] = f"{type(ex).__name__}: {ex}"[:300]
            print(f"[{i}/{len(qs)}] {name:40} FAIL  ({dt:.1f}s) "
                  f"{failures[name]}", flush=True)
    print(f"\nsf1-parity: {n_ok} matched, {n_skip} skipped, "
          f"{len(failures)} failed; failures={sorted(failures)}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
