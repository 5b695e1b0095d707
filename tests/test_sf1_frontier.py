"""10x-scale frontier checks (VERDICT r10 task 4): the sf1 evidence
used to live only in scripts + BENCH_history artifacts; this marked test
makes the 10x path un-bit-rottable.  Deselected by default (pytest.ini
addopts) — run with `pytest -m sf1` (~2-3 min).

Asserts, against the committed testdata_sf1 tables:
- every scale-frontier query completes and returns a sane shape;
- the plan invariants that make them 100 TB-safe hold at 10x data just
  as they do at sf0.001 (no cartesian candidate generation, adaptive
  SemDeDup K actually adapts, the LSH verify join touches candidates
  only).
"""

from __future__ import annotations

import os

import pytest

pytestmark = pytest.mark.sf1

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, "testdata_sf1")

FRONTIER = [
    "q148_semdedup", "q51_srp_lsh_buckets", "q47_minhash_lsh",
    "q50_embedding_neardup", "q154_knn_label_accuracy", "q49_cosine_topk",
    "q193_heaps_law", "q209_source_scorecard", "q56_dedup_components",
    "q212_curation_shards",
]


@pytest.fixture(scope="module", autouse=True)
def _need_sf1():
    if not os.path.isdir(SF1):
        pytest.skip("testdata_sf1 not generated (scripts/make_sf1.py)")


@pytest.mark.parametrize("name", FRONTIER)
def test_frontier_query_completes_at_sf1(spark, name):
    from spatial_data_engineering_spark.queries_registry import all_queries

    df = all_queries()[name](spark, SF1)
    # no cartesian candidate generation at 10x data — the LSH/dedup
    # plans must keep their derived-key equi-joins
    plan = df._jdf.queryExecution().executedPlan().toString()
    if name in ("q47_minhash_lsh", "q51_srp_lsh_buckets",
                "q56_dedup_components"):
        assert "CartesianProduct" not in plan, name
    n = df.count()
    assert n >= 0
    if name in ("q148_semdedup", "q201_cluster_label_purity"):
        # adaptive K at sf1: n ~ 2e4 nonzero vectors -> K ~ 141 clusters
        assert n > 100, f"{name}: adaptive K did not adapt (rows={n})"


def test_semdedup_k_adapts_at_sf1(spark):
    import pyspark.sql.functions as F

    from spatial_data_engineering_spark.catalog import load
    from spatial_data_engineering_spark.operators import similarity as S

    e = load(spark, SF1, "embeddings")
    n = (e.select(F.expr(S._norm_spark("embedding")).alias("nrm"))
         .filter(F.col("nrm") > 0).count())
    k = S._semdedup_k(n)
    assert k > S._SEMDEDUP_K, (n, k)
    assert k < S._SEMDEDUP_TWO_LEVEL_K  # sf1 stays on the exact path
