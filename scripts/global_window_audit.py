#!/usr/bin/env python
"""Audit: global (partitionBy-less) Window nodes over unbounded input.

Compiles every registry query's physical plan with the global-order
helpers forced onto their big path (threshold=0), walks the plan tree,
and reports each WindowExec/WindowInPandasExec with an EMPTY partition
spec whose subtree shows no evidence of boundedness (no Aggregate, no
TakeOrderedAndProject/Limit/WindowGroupLimit below it).  Those are the
single-task global sorts the round-6 verdict flagged.

Usage: python scripts/global_window_audit.py [qNNN ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.001"

from spatial_data_engineering_spark.plans.audit import \
    global_window_violations  # noqa: E402


def main(prefixes):
    os.environ.setdefault("SPARK_GRAFT_PAIR_CACHE", "/tmp/pair_cache_audit")
    from spatial_data_engineering_spark.operators import relational as R
    from spatial_data_engineering_spark.queries_registry import all_queries
    from spatial_data_engineering_spark.session import build_session

    R._ROW_ID_WINDOW_THRESHOLD = 0  # force big paths everywhere
    spark = build_session(app_name="global-window-audit", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    names = [n for n in qs
             if not prefixes or any(n.startswith(p) for p in prefixes)]
    flagged = {}
    for name in names:
        try:
            v = global_window_violations(qs[name](spark, SF))
        except Exception as ex:  # noqa: BLE001
            print(f"ERROR {name}: {str(ex)[:200]}")
            continue
        if v:
            flagged[name] = v
            print(f"FLAG  {name}")
            for line in v:
                print(f"      {str(line)[:140]}")
    print(f"\n{len(flagged)} flagged / {len(names)} checked")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
