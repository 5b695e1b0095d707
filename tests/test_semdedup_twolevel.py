"""Two-level (IVF-routed) SemDeDup assignment — the >2^18-centroid
scale path (VERDICT r10 item 2: no silent broadcast cliff).

At every reachable test/bench scale K = isqrt(n) stays far below the
crossover, so q148/q201 ship the exact broadcast argmax and the driver
oracles are untouched.  These tests FORCE the gate to prove the routed
plan's properties at small n:

1. equivalence anchor — with nprobe >= m every cell is probed, so the
   routed path must be bit-identical to the broadcast argmax;
2. total assignment — with the default nprobe every nonzero vector is
   assigned exactly once and decisions are partition-independent;
3. fidelity — default-nprobe routing agrees with the exact argmax on
   the overwhelming majority of vectors (IVF recall at tiny m is the
   worst case; production m = isqrt(K) is far finer).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from spatial_data_engineering_spark.operators import similarity as S
from spatial_data_engineering_spark.catalog import load

SF = "/root/testdata/sf0.01"


def _nz(spark, sf=SF):
    e = load(spark, sf, "embeddings")
    return (e.select("vec_id", "embedding",
                     F.expr(S._norm_spark("embedding")).alias("nrm"))
            .filter(F.col("nrm") > 0))


def _pairs(df):
    return sorted((r["vec_id"], r["cid"])
                  for r in df.select("vec_id", "cid").collect())


@pytest.fixture
def forced_two_level(monkeypatch):
    # K at sf0.01 is ~22; a threshold of 1 forces the routed plan
    monkeypatch.setattr(S, "_SEMDEDUP_TWO_LEVEL_K", 1)
    yield


def test_full_probe_is_bitwise_exact(spark, forced_two_level, monkeypatch):
    nz = _nz(spark)
    n = nz.count()
    monkeypatch.setattr(S, "_SEMDEDUP_NPROBE", 10 ** 9)  # probe all cells
    routed = _pairs(S._semdedup_member(nz, n, False))
    monkeypatch.setattr(S, "_SEMDEDUP_TWO_LEVEL_K", 1 << 18)  # broadcast
    exact = _pairs(S._semdedup_member(nz, n, False))
    assert routed == exact
    assert len(routed) == n


def test_default_probe_assigns_every_vector_once(spark, forced_two_level):
    nz = _nz(spark)
    n = nz.count()
    member = S._semdedup_member(nz, n, False)
    got = _pairs(member)
    assert len(got) == n
    assert len({v for v, _ in got}) == n  # exactly once each
    # partition independence: identical decisions under a different
    # physical layout
    again = _pairs(S._semdedup_member(nz.repartition(7), n, False))
    assert got == again
    # every assigned centroid is one of the K seniority-ordered seeds
    k = S._semdedup_k(n)
    seeds = {r["vec_id"] for r in
             nz.orderBy("vec_id").limit(k).select("vec_id").collect()}
    assert {c for _, c in got} <= seeds


def test_partial_probe_fidelity_vs_exact(spark, forced_two_level,
                                         monkeypatch):
    # At sf0.01 m = isqrt(K=22) = 4, and min(default nprobe=8, m) = m is
    # a FULL probe (exact by construction — the anchor test).  Force a
    # genuinely partial probe to characterize the approximation on the
    # adversarial worst case: these synthetic embeddings are unclustered,
    # so routed-argmax recall has no structure to exploit.  Measured on
    # this corpus: nprobe 1/4 cells -> 0.48 agreement (uniform baseline
    # 0.25), 2/4 -> 0.68 (baseline 0.50), 3/4 -> 0.85 (baseline 0.75) —
    # always well above chance, monotone in nprobe, and every vector
    # still assigned exactly once.
    nz = _nz(spark)
    n = nz.count()
    monkeypatch.setattr(S, "_SEMDEDUP_TWO_LEVEL_K", 1 << 18)
    exact = dict(_pairs(S._semdedup_member(nz, n, False)))
    monkeypatch.setattr(S, "_SEMDEDUP_TWO_LEVEL_K", 1)
    prev = 0.0
    for nprobe, floor in ((1, 0.30), (2, 0.55), (3, 0.78)):
        monkeypatch.setattr(S, "_SEMDEDUP_NPROBE", nprobe)
        routed = dict(_pairs(S._semdedup_member(nz, n, False)))
        assert len(routed) == n
        agree = sum(routed[v] == exact[v] for v in exact) / len(exact)
        assert agree >= floor, (nprobe, agree)
        assert agree >= prev  # monotone in probe depth
        prev = agree


def test_seed_strategy_is_a_pure_physical_choice(spark, monkeypatch):
    # The EXACT (broadcast) path must produce bit-identical members
    # whether seeds come from TakeOrderedAndProject or from the
    # range-partition id-rank kernel — forcing the seed gate to 1 flips
    # the strategy while K=22 keeps the assignment exact.
    nz = _nz(spark)
    n = nz.count()
    take_ordered = _pairs(S._semdedup_member(nz, n, False))
    monkeypatch.setattr(S, "_SEMDEDUP_SEED_TAKEORDERED_MAX", 1)
    kernel = _pairs(S._semdedup_member(nz, n, False))
    assert kernel == take_ordered
    assert len(kernel) == n


def test_default_thresholds_keep_bench_scales_exact():
    # the crossover must stay unreachable for every shipped testdata
    # scale (sf1 has 2e4 vectors -> K ~ 141), so driver outputs never
    # depend on the routed approximation
    assert S._SEMDEDUP_TWO_LEVEL_K == 1 << 18
    assert S._semdedup_k(20_000) < S._SEMDEDUP_TWO_LEVEL_K
    # the gate needs n > ~6.9e10 vectors before routing activates
    assert S._semdedup_k(68_719_476_736) == 1 << 18


def test_no_super_cell_is_ever_empty_of_centroids(spark):
    # ADVICE r11: a super-centroid that routes AWAY from its own cell
    # (exact-cosine tie with a smaller-sid super — here cid 40 is a
    # bitwise DUPLICATE of super cid 10, so the asc(sid) tie-break sends
    # it to cell 10) would leave its cell empty; a vector probing only
    # empty cells then vanishes from the assignment join.  The
    # _semdedup_cent_cells guarantee: every super's cell retains at
    # least its own centroid, so ANY probed cell yields candidates.
    rows = [
        (10, [1.0, 0.0, 0.0, 0.0]),   # super, cell 10
        (20, [0.0, 1.0, 0.0, 0.0]),   # super, cell 20
        (30, [0.0, 0.0, 1.0, 0.0]),   # super, cell 30
        (40, [1.0, 0.0, 0.0, 0.0]),   # super, duplicate of cid 10
        (50, [0.9, 0.1, 0.0, 0.0]),   # plain centroids
        (60, [0.1, 0.9, 0.0, 0.0]),
    ]
    cent = (spark.createDataFrame(rows, "cid long, cemb array<double>")
            .select("cid", "cemb",
                    F.expr(S._norm_spark("cemb")).alias("cnrm")))
    sup = (cent.orderBy("cid").limit(4)
           .select(F.col("cid").alias("sid"), F.col("cemb").alias("semb"),
                   F.col("cnrm").alias("snrm")))
    cells = S._semdedup_cent_cells(cent, sup, False)
    got = {(r["sid"], r["cid"]) for r in cells.select("sid", "cid").collect()}
    # the duplicate DID route away (the tie-break fires) ...
    assert (10, 40) in got
    # ... but its own cell is NOT empty (the ADVICE fix) ...
    assert (40, 40) in got
    # ... every super cell has candidates, and each (sid, cid) is unique
    assert {s for s, _ in got} == {10, 20, 30, 40}
    assert len(got) == cells.count()
    # routing itself is otherwise untouched: plain centroids go to their
    # nearest super exactly once
    assert (10, 50) in got and (20, 60) in got
