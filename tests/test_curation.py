"""End-to-end curation pipeline properties (plans/curation.py): each
stage's contract must hold through composition, and the whole DAG must be
deterministic."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_ORACLE


def test_curation_pipeline_properties(spark):
    from spatial_data_engineering_spark.catalog import load
    from spatial_data_engineering_spark.operators.dedup import QUERIES as DQ
    from spatial_data_engineering_spark.operators.textops import (
        _PACK_CAP, QUERIES as TQ)
    from spatial_data_engineering_spark.plans.curation import curate

    out = curate(spark, SF_ORACLE).toPandas()
    n_in = load(spark, SF_ORACLE, "documents").count()

    # shrinks but survives
    assert 0 < len(out) < n_in
    # one row per surviving doc
    assert out["doc_id"].is_unique
    # split labels are the contract's three
    assert set(out["split"]) <= {"train", "val", "test"}

    # no confirmed near-dup loser survives
    losers = {r["b_id"] for r in DQ["q47_minhash_lsh"](
        spark, SF_ORACLE).collect()}
    assert not (set(out["doc_id"]) & losers)

    # no contaminated doc survives
    contaminated = {r["doc_id"] for r in TQ["q79_decontaminate"](
        spark, SF_ORACLE).collect()}
    assert not (set(out["doc_id"]) & contaminated)

    # no benchmark MEMBER survives either — eval text must never be
    # assignable to the train split (ADVICE r3)
    from spatial_data_engineering_spark.operators.textops import _DECON_MOD
    assert not any(i % _DECON_MOD == 0 for i in out["doc_id"])

    # packing invariants within each (split, shard)
    for (_, _), grp in out.groupby(["split", "shard"]):
        grp = grp.sort_values("doc_id")
        bins = grp["bin_idx"].tolist()
        assert bins[0] == 0
        assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))
        fill = grp.groupby("bin_idx")["n_tokens"].sum()
        docs = grp.groupby("bin_idx").size()
        assert ((fill <= _PACK_CAP) | (docs == 1)).all()

    # byte-determinism across runs
    again = curate(spark, SF_ORACLE).toPandas()
    key = ["doc_id"]
    a = out.sort_values(key).reset_index(drop=True)
    b = again.sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_materialize_curated_roundtrip_and_pruning(spark, tmp_path):
    """The pipeline sink: split-partitioned parquet round-trips the
    packed assignment exactly, and a split-filtered read prunes at the
    directory level (PartitionFilters in the scan, not a post-filter
    over all files)."""
    from spatial_data_engineering_spark.plans.curation import (
        curate, materialize_curated)

    out_dir = str(tmp_path / "curated")
    materialize_curated(spark, SF_ORACLE, out_dir)

    expected = curate(spark, SF_ORACLE).toPandas()
    back = spark.read.parquet(out_dir)
    got = back.toPandas()
    key = ["doc_id"]
    cols = ["doc_id", "lang", "split", "shard", "bin_idx", "n_tokens"]
    a = expected.sort_values(key).reset_index(drop=True)[cols]
    b = got.sort_values(key).reset_index(drop=True)[cols]
    # partitionBy re-types nothing here, but column order differs
    assert a.equals(b.astype(a.dtypes.to_dict()))

    train = back.filter(F.col("split") == "train")
    plan = train._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(split" in plan, plan
    assert train.count() == (expected["split"] == "train").sum()
