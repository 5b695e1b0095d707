"""Repo-wide physical-plan invariants for every registry query.

The 100 TB design rules the verdicts grade on — no cartesian products,
no row-at-a-time Python UDFs in any query path — were previously
enforced by per-query audits and greps.  This test compiles the physical
plan of ALL registry queries (no execution; ~1 min for the full
inventory) and asserts the two markers never appear:

* ``CartesianProduct``: an unhinted cross join of sides with unknown
  stats — at scale this is an accidental O(n*m).  Deliberate scalar
  attaches must broadcast one side (BroadcastNestedLoopJoin), which
  states the intent in the plan.  (Caught a real one: q188 crossJoined
  two 1-row aggregates without the hint.)
* ``BatchEvalPython``: a row-at-a-time Python UDF — the slow path the
  engine bans in favor of codegen expressions / Arrow-batched UDFs
  (``ArrowEvalPython`` / ``MapInPandas`` / ``FlatMapGroupsInPandas``
  remain allowed and are the sanctioned Python escape hatches).
"""

from __future__ import annotations

import pytest

from spatial_data_engineering_spark.queries_registry import all_queries

# Plan compilation needs a readable sf_dir for schemas; the smallest one
# keeps any stats estimation instant.
SF_PLAN = "/root/testdata/sf0.001"

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


@pytest.mark.parametrize("name", list(all_queries()))
def test_plan_has_no_forbidden_nodes(spark, name):
    df = all_queries()[name](spark, SF_PLAN)
    plan = df._jdf.queryExecution().executedPlan().toString()
    hits = [m for m in FORBIDDEN if m in plan]
    assert not hits, (
        f"{name}: physical plan contains {hits} — broadcast the scalar "
        f"side of deliberate cross joins, and replace row-at-a-time "
        f"Python UDFs with codegen expressions or Arrow-batched UDFs")
