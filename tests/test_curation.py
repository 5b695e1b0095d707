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


def test_admit_delta_planted(spark):
    """Incremental admission: a delta batch against a curated base.
    Planted: an exact copy of a base doc, a near-dup of a base doc, a
    within-delta near-dup pair, a benchmark-contaminated doc and two
    clean docs — only the clean docs and the within-pair keeper admit."""
    from spatial_data_engineering_spark.plans.curation import admit_delta

    import random

    words = ("quark lattice photon meson hadron lepton baryon gluon "
             "boson fermion spinor tensor gauge flux brane string").split()

    def text(seed, n=40):
        # per-seed word ORDER (not a rotation of one cycle): char-8-gram
        # shingles mostly cross word boundaries, so distinct adjacency
        # is what makes two seeds genuinely non-near-dup
        return " ".join(random.Random(seed).choices(words, k=n))

    base = spark.createDataFrame(
        [(i, text(i)) for i in range(10)], "doc_id long, text string")
    bench = spark.createDataFrame(
        [(900, "zebra xylophone quixotic jackdaw " * 12)],
        "doc_id long, text string")
    near_of_base = text(3) + " extra"           # ~0.97 jaccard vs base 3
    within_a = text(77)
    within_b = text(77) + " tail"               # near-dup of within_a
    delta = spark.createDataFrame([
        (100, text(5)),                          # exact copy of base 5
        (101, near_of_base),                     # near-dup of base 3
        (102, within_a),                         # keeper of delta pair
        (103, within_b),                         # dropped: higher id
        (104, "zebra xylophone quixotic jackdaw " * 12 + "x"),  # contaminated
        (105, text(55)),                         # clean
        (106, text(56)),                         # clean
    ], "doc_id long, text string")

    admitted = sorted(
        r.doc_id for r in admit_delta(base, delta, bench).collect())
    assert admitted == [102, 105, 106], admitted

    # without a benchmark frame, decontamination is skipped
    admitted2 = sorted(
        r.doc_id for r in admit_delta(base, delta).collect())
    assert admitted2 == [102, 104, 105, 106], admitted2

    # determinism across runs
    assert admitted == sorted(
        r.doc_id for r in admit_delta(base, delta, bench).collect())


def test_admit_delta_precomputed_signatures(spark):
    """Passing the stored base signature pair yields the same admission
    decisions as recomputing it — the warehouse refresh path."""
    import random

    from spatial_data_engineering_spark.operators.dedup import shingle_bands
    from spatial_data_engineering_spark.plans.curation import admit_delta

    words = ("quark lattice photon meson hadron lepton baryon gluon "
             "boson fermion spinor tensor gauge flux brane string").split()

    def text(seed, n=40):
        return " ".join(random.Random(seed).choices(words, k=n))

    base = spark.createDataFrame(
        [(1, text(3))], "doc_id long, text string")
    delta = spark.createDataFrame(
        [(2, text(3) + " extra"),                        # near-dup of 1
         (3, text(55))],                                 # clean
        "doc_id long, text string")

    fresh = sorted(r.doc_id for r in admit_delta(base, delta).collect())
    stored = sorted(r.doc_id for r in admit_delta(
        base, delta, base_signatures=shingle_bands(base)).collect())
    assert fresh == stored == [3]
