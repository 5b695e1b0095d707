#!/usr/bin/env python
"""Audit: global (partitionBy-less) Window nodes over unbounded input.

Thin CLI over ``plans.audit.audit_registry`` (the shared sweep — also
run by tests/test_plan_invariants.py every pytest run, which regenerates
GLOBAL_WINDOW_AUDIT.json at the repo root and gates on 0 flagged, so
the committed artifact refreshes automatically each round).

Compiles every registry query's physical plan with the global-order
helpers forced onto their big path (threshold=0), walks the plan tree,
and reports each WindowExec/WindowInPandasExec with an EMPTY partition
spec whose subtree shows no evidence of boundedness: no
TakeOrderedAndProject/Limit/WindowGroupLimit below it, and no Aggregate
grouped on a PINNED bounded domain (calendar buckets, tiny reference
dims — round-9 tightening: entity-keyed aggregates no longer excuse).
Those are the single-task global sorts the round-6 verdict flagged.

Usage: python scripts/global_window_audit.py [--out FILE.json] [qNNN ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.001"


def main(argv):
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv):
            print("usage: global_window_audit.py [--out FILE.json] [qNNN ...]")
            return 2
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    prefixes = argv
    os.environ.setdefault("SPARK_GRAFT_PAIR_CACHE", "/tmp/pair_cache_audit")
    from spatial_data_engineering_spark.plans.audit import audit_registry
    from spatial_data_engineering_spark.queries_registry import all_queries
    from spatial_data_engineering_spark.session import build_session

    spark = build_session(app_name="global-window-audit", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    names = [n for n in all_queries()
             if not prefixes or any(n.startswith(p) for p in prefixes)]
    payload = audit_registry(spark, SF, names)
    for name, v in payload["flagged"].items():
        print(f"FLAG  {name}")
        for line in v:
            print(f"      {str(line)[:140]}")
    if out_path:
        import json
        with open(out_path, "w") as fh:
            json.dump(payload, fh, indent=1)
        print(f"wrote {out_path}: {len(payload['global_windows'])} queries "
              f"with global windows, {payload['n_flagged']} flagged")
    print(f"\n{payload['n_flagged']} flagged / {payload['n_checked']} checked")
    return 1 if payload["flagged"] else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
