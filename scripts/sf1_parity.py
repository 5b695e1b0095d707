"""Oracle parity at sf1 (round 11): the driver's t2 check — row count +
column names + order-insensitive value hash vs DuckDB — normally runs at
sf0.01; this sweep re-proves it on the 10x corpus, turning "correct at
test scale" into "correct at both measured scales".

Quadratic-ORACLE queries (the DuckDB twin is a deliberate all-pairs
baseline) used to be skipped outright; round 12 (VERDICT r11 task 2)
gives each a deterministic SUBSET strategy instead, so the 10x evidence
class covers the whole inventory:

- full        — the oracle turned out affordable at sf1 (q49 is 10
                queries x n, linear — 0.6 s measured); run it whole.
- output-slice— Spark runs the FULL sf1 corpus through the registered
                callable; the oracle runs on a stratified slice view
                and the Spark OUTPUT is filtered to rows fully inside
                the slice.  Valid when each output row depends only on
                its own ids (q50: a pair's cosine doesn't depend on the
                rest of the corpus), and the strongest form — the Spark
                plan sees all 10x data.
- corpus-slice— both engines run on the same stratified slice of the
                sf1 table (materialized once, schema-preserving, under
                testdata_sf1/_slices).  For aggregates over all-pairs
                structure (q154 1-NN, q156 candidate audit) where an
                output filter can't undo the aggregation; the slice is
                sized ABOVE sf0.1 so it still extends the evidence.

Everything else runs whole, with a per-query stopwatch so one slow
oracle can't hide in an aggregate time.

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

# Subset strategies for the four quadratic-oracle queries (module-level
# so tests/test_sf1_frontier.py drives the same definitions).  Slice
# moduli are sized so the DuckDB cost stays ~1 min and the slice stays
# at least sf0.1-sized: q50 4000 vectors -> 8e6 pairs (15 s measured),
# q154 4000 vectors -> 1.6e7 ranked rows (71 s), q156 12500 docs
# (2x sf0.1's corpus; 4 s).
SUBSET = {
    "q49_cosine_topk": {"mode": "full"},
    "q50_embedding_neardup": {
        "mode": "output-slice", "table": "embeddings",
        "pred": "vec_id % 5 = 0",
        "post": "a_id % 5 = 0 AND b_id % 5 = 0"},
    "q154_knn_label_accuracy": {
        "mode": "corpus-slice", "table": "embeddings",
        "pred": "vec_id % 5 = 0"},
    "q156_minhash_estimate_audit": {
        "mode": "corpus-slice", "table": "documents",
        "pred": "doc_id % 4 = 0"},
}


def materialize_slice(sf_dir: str, table: str, pred: str) -> str:
    """A schema-preserving stratified slice of one sf1 table, exposed as
    a full sf_dir (other tables symlinked) so registered callables run
    UNCHANGED.  PyArrow filter/write keeps parquet logical types exactly
    (a DuckDB rewrite could e.g. re-type timestamps)."""
    import re

    import pyarrow.dataset as ds
    import pyarrow.parquet as pq

    tag = re.sub(r"\W+", "_", f"{table}_{pred}").strip("_")
    out = os.path.join(sf_dir, "_slices", tag)
    marker = os.path.join(out, "_SLICE_OK")
    # the marker encodes the SOURCE table's identity (file sizes +
    # mtimes), so a regenerated sf1 corpus invalidates old slices
    # instead of silently verifying against stale data
    src_tbl = os.path.join(sf_dir, f"{table}.parquet")
    parts = ([os.path.join(src_tbl, f) for f in sorted(os.listdir(src_tbl))]
             if os.path.isdir(src_tbl) else [src_tbl])
    ident = pred + "|" + "|".join(
        f"{os.path.basename(p)}:{os.path.getsize(p)}:"
        f"{int(os.path.getmtime(p))}"
        for p in parts if p.endswith(".parquet") or not os.path.isdir(p))
    if os.path.exists(marker) and open(marker).read() == ident:
        return out
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    from parity import TABLES  # single source of truth for the corpus
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if t == table:
            tbl = ds.dataset(src, format="parquet").to_table()
            col, mod, rem = re.fullmatch(
                r"(\w+) % (\d+) = (\d+)", pred).groups()
            # pyarrow.compute has no mod; numpy the id column instead
            keep = (tbl[col].to_numpy() % int(mod)) == int(rem)
            pq.write_table(tbl.filter(keep), dst)
        elif not os.path.exists(dst):
            os.symlink(os.path.abspath(src), dst)
    open(marker, "w").write(ident)
    return out


def duckdb_connection_sf1(sf_dir: str, slice_table=None, pred=None):
    """DuckDB connection with the corpus views; ``slice_table``/``pred``
    restrict ONE table to a stratified slice (the subset strategies).
    Module-level so tests/test_sf1_frontier.py uses the same view
    construction as the sweep — the glob and the WHERE injection cannot
    drift apart.  sf1 tables are Spark-written DIRECTORIES
    (table.parquet/part-*) where driver testdata uses single files —
    glob accordingly."""
    import duckdb

    from parity import TABLES

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        w = f" WHERE {pred}" if t == slice_table else ""
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{pat}'){w}")
    return con


def main() -> int:
    extra = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else set()
    skip = {s for s in extra if s}

    from pyspark.sql import SparkSession

    from parity import TABLES, compare

    import duckdb

    spark = (SparkSession.builder.master("local[8]")
             .appName("sf1-parity")
             .config("spark.driver.memory", "24g")  # sf1 broadcasts OOM the 1g default
             .config("spark.ui.enabled", "false")
             # no \r progress bars: they overwrite the per-query
             # PASS rows in captured artifact logs (cost three
             # re-captures in round 15); cosmetic-only config,
             # no effect on any compared value
             .config("spark.ui.showConsoleProgress", "false")
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
            tag = "SKIP(requested)" if name in skip else "SKIP(no-oracle)"
            print(f"[{i}/{len(qs)}] {name:40} {tag}", flush=True)
            n_skip += 1
            continue
        strat = SUBSET.get(name, {"mode": "whole"})
        mode = strat["mode"]
        t0 = time.perf_counter()
        try:
            if mode in ("whole", "full"):
                df = qs[name](spark, SF1)
                oracle_pdf = duck.sql(os_[name]).df()
            elif mode == "output-slice":
                df = qs[name](spark, SF1).filter(strat["post"])
                # keep the connection referenced until .df() finishes —
                # a bare chained call gets GC-closed mid-query
                scon = duckdb_connection_sf1(
                    SF1, strat["table"], strat["pred"])
                oracle_pdf = scon.sql(os_[name]).df()
            elif mode == "corpus-slice":
                sdir = materialize_slice(SF1, strat["table"],
                                         strat["pred"])
                df = qs[name](spark, sdir)
                scon = duckdb_connection_sf1(
                    SF1, strat["table"], strat["pred"])
                oracle_pdf = scon.sql(os_[name]).df()
            compare(df, oracle_pdf, name=name)
            dt = time.perf_counter() - t0
            tag = "PASS" if mode == "whole" else f"PASS({mode})"
            print(f"[{i}/{len(qs)}] {name:40} {tag}  ({dt:.1f}s)",
                  flush=True)
            n_ok += 1
        except Exception as ex:  # noqa: BLE001
            dt = time.perf_counter() - t0
            failures[name] = f"{type(ex).__name__}: {ex}"[:300]
            print(f"[{i}/{len(qs)}] {name:40} FAIL({mode})  ({dt:.1f}s) "
                  f"{failures[name]}", flush=True)
    print(f"\nsf1-parity: {n_ok} matched, {n_skip} skipped, "
          f"{len(failures)} failed; failures={sorted(failures)}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
