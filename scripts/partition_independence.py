#!/usr/bin/env python
"""Partition-order independence check (the COVERAGE.md invariant).

Runs the given queries (default: all oracled) under two deliberately
different configs — local[16] with 16 shuffle partitions and local[5]
with 7 — and asserts the canonical outputs (columns sorted by name, rows
sorted) are bit-identical.  This is the property that makes the driver's
value hash stable under AQE re-plans and cluster re-sizing.

Usage: python scripts/partition_independence.py [q97_funnel q98_... | all]
       python scripts/partition_independence.py admission

``admission`` (round-10, VERDICT r9 task 4) proves the incremental
admission plane partition-independent: the same admitted doc_id set
from ``plans.curation.admit_delta`` under both configs, with FRESHLY
BUILT and with STORED base tables (persisted_shingle_bands /
persisted_exact_hashes), and the same per-batch admitted set from
``streaming.windows.admit_stream``.  The keep-first rule rests on
min(doc_id) tie-breaks and hash joins only, so parallelism must not
leak into which duplicate survives — this check makes that a measured
fact instead of a design claim.  The fixture deliberately plants every
tie class: exact copies of base, near-dups of base, within-delta exact
ties, and fresh docs.
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
    import tempfile

    from pyspark.sql import SparkSession

    # Isolate the disk-cache tier PER CONFIG (round 16): the pair /
    # signature / ehash / span tables persist to SPARK_GRAFT_PAIR_CACHE
    # keyed by corpus fingerprint, so without isolation config B would
    # read back config A's materializations and the "independence" of
    # every cached path would be a parquet round-trip, not a recompute
    # under different parallelism.  A fresh root per config forces both
    # sessions to build their own tables.
    os.environ["SPARK_GRAFT_PAIR_CACHE"] = tempfile.mkdtemp(
        prefix=f"pind-cache-{shuffle}-")

    spark = (SparkSession.builder.master(master)
             .appName(f"pind-{shuffle}")
             .config("spark.sql.shuffle.partitions", str(shuffle))
             .config("spark.ui.enabled", "false")
             # no \r progress bars: they overwrite the per-query
             # PASS rows in captured artifact logs (cost three
             # re-captures in round 15); cosmetic-only config,
             # no effect on any compared value
             .config("spark.ui.showConsoleProgress", "false")
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


def _admission_fixture(root: str) -> None:
    """Deterministic base/delta corpora under ``root`` (pandas/pyarrow —
    no Spark, so the fixture cannot depend on either config).

    Tie classes planted in the delta:
      * exact copies of base docs (id+10M)        -> must reject
      * near-dups of base docs (text + tail, +20M) -> must reject
      * fresh docs (doc_id % 5 == 0, absent from base) -> admit
      * within-delta exact ties (+30M copy of a fresh doc) -> the
        min(doc_id) copy survives, the +30M copy rejects
    """
    import pandas as pd

    docs = pd.read_parquet(
        os.path.join(SF, "documents.parquet"))[["doc_id", "text"]]
    base = docs[docs.doc_id % 5 != 0]
    fresh = docs[docs.doc_id % 5 == 0]
    exact = base[base.doc_id % 11 == 1].assign(
        doc_id=lambda d: d.doc_id + 10_000_000)
    near = base[base.doc_id % 11 == 2].assign(
        doc_id=lambda d: d.doc_id + 20_000_000,
        text=lambda d: d.text + " xqzt trailing probe token")
    tie = fresh[fresh.doc_id % 10 == 0].assign(
        doc_id=lambda d: d.doc_id + 30_000_000)
    delta = (pd.concat([fresh, exact, near, tie])
             .sort_values("doc_id").reset_index(drop=True))
    os.makedirs(root, exist_ok=True)
    base.to_parquet(os.path.join(root, "base.parquet"), index=False)
    delta.to_parquet(os.path.join(root, "delta.parquet"), index=False)
    # two stream batch files, mtime-ordered for deterministic batching
    half = len(delta) // 2
    sdir = os.path.join(root, "incoming")
    os.makedirs(os.path.join(sdir, "f1"), exist_ok=True)
    os.makedirs(os.path.join(sdir, "f2"), exist_ok=True)
    delta.iloc[:half].to_parquet(
        os.path.join(sdir, "f1", "part-0.parquet"), index=False)
    import time
    time.sleep(1.1)
    delta.iloc[half:].to_parquet(
        os.path.join(sdir, "f2", "part-0.parquet"), index=False)


def run_admission_config(master: str, shuffle: int, root: str, tag: str):
    """Admitted sets under one config: (fresh-tables, stored-tables,
    stream) — each a sorted tuple of doc_ids / (batch, doc_id) pairs."""
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master(master)
             .appName(f"pind-admit-{shuffle}")
             .config("spark.sql.shuffle.partitions", str(shuffle))
             .config("spark.ui.enabled", "false")
             # no \r progress bars: they overwrite the per-query
             # PASS rows in captured artifact logs (cost three
             # re-captures in round 15); cosmetic-only config,
             # no effect on any compared value
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from spatial_data_engineering_spark.operators.dedup import (
        persisted_exact_hashes, persisted_shingle_bands)
    from spatial_data_engineering_spark.plans.curation import admit_delta
    from spatial_data_engineering_spark.streaming.windows import admit_stream

    base_path = os.path.join(root, "base.parquet")
    base = spark.read.parquet(base_path)
    delta = spark.read.parquet(os.path.join(root, "delta.parquet"))

    fresh_ids = tuple(sorted(
        r.doc_id for r in admit_delta(base, delta).select("doc_id")
        .collect()))
    stored_ids = tuple(sorted(
        r.doc_id for r in admit_delta(
            base, delta,
            base_signatures=persisted_shingle_bands(spark, base_path),
            base_exact_hashes=persisted_exact_hashes(spark, base_path))
        .select("doc_id").collect()))

    out_dir = os.path.join(root, f"admitted-{tag}")
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", "true")
              .parquet(os.path.join(root, "incoming")))
    admit_stream(base, stream, out_dir, os.path.join(root, f"ckpt-{tag}"))
    stream_ids = tuple(sorted(
        (int(r.batch), int(r.doc_id))
        for r in spark.read.parquet(out_dir).collect()))
    spark.stop()
    return fresh_ids, stored_ids, stream_ids


def check_admission() -> None:
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="pind-admission-")
    try:
        _admission_fixture(root)
        a = run_admission_config("local[16]", 16, root, "a")
        b = run_admission_config("local[5]", 7, root, "b")
        fresh_a, stored_a, stream_a = a
        fresh_b, stored_b, stream_b = b
        assert fresh_a == stored_a, (
            "stored base tables changed the admitted set vs fresh build")
        assert fresh_a == fresh_b and stored_a == stored_b, (
            "admit_delta admitted set depends on parallelism")
        assert stream_a == stream_b, (
            "admit_stream per-batch admitted set depends on parallelism")
        batch_ids = {d for _, d in stream_a}
        assert batch_ids == set(fresh_a), (
            "stream admissions diverge from batch admit_delta over the "
            f"same delta: only_stream={sorted(batch_ids - set(fresh_a))[:5]} "
            f"only_batch={sorted(set(fresh_a) - batch_ids)[:5]}")
        print(f"admission: {len(fresh_a)} admitted of "
              f"{len(set(d for _, d in stream_a) | set(fresh_a))} — "
              "identical under local[16]/16 vs local[5]/7, "
              "stored == fresh tables, stream == batch")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main():
    from spatial_data_engineering_spark.queries_registry import all_queries
    import __spark_entry__ as entry

    args = sys.argv[1:]
    if args == ["admission"]:
        check_admission()
        return
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
