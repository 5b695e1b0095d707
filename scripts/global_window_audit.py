#!/usr/bin/env python
"""Audit: global (partitionBy-less) Window nodes over unbounded input.

Compiles every registry query's physical plan with the global-order
helpers forced onto their big path (threshold=0), walks the plan tree,
and reports each WindowExec/WindowInPandasExec with an EMPTY partition
spec whose subtree shows no evidence of boundedness: no
TakeOrderedAndProject/Limit/WindowGroupLimit below it, and no Aggregate
grouped on a PINNED bounded domain (calendar buckets, tiny reference
dims — round-9 tightening: entity-keyed aggregates no longer excuse).
Those are the single-task global sorts the round-6 verdict flagged.

Usage: python scripts/global_window_audit.py [--out FILE.json] [qNNN ...]

With --out, writes the FULL per-query audit table (every global window
with its bounding evidence, not just violations) as JSON — committed
per round (GLOBAL_WINDOW_AUDIT_r{N}.json) so each remaining
"WindowExec: No Partition Defined" warning in a bench log is
attributable to a named bounded merge.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.001"

from spatial_data_engineering_spark.plans.audit import \
    global_window_report  # noqa: E402


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
    from spatial_data_engineering_spark.operators import relational as R
    from spatial_data_engineering_spark.queries_registry import all_queries
    from spatial_data_engineering_spark.session import build_session

    R._ROW_ID_WINDOW_THRESHOLD = 0  # force big paths everywhere
    spark = build_session(app_name="global-window-audit", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    names = [n for n in qs
             if not prefixes or any(n.startswith(p) for p in prefixes)]
    flagged, table = {}, {}
    for name in names:
        try:
            report = global_window_report(qs[name](spark, SF))
        except Exception as ex:  # noqa: BLE001
            print(f"ERROR {name}: {str(ex)[:200]}")
            table[name] = {"error": str(ex)[:200]}
            continue
        if report:
            table[name] = report
        v = [r["window"] for r in report if not r["ok"]]
        if v:
            flagged[name] = v
            print(f"FLAG  {name}")
            for line in v:
                print(f"      {str(line)[:140]}")
    if out_path:
        import json
        with open(out_path, "w") as fh:
            json.dump({"sf": SF, "n_checked": len(names),
                       "n_flagged": len(flagged),
                       "global_windows": table}, fh, indent=1)
        print(f"wrote {out_path}: {len(table)} queries with global "
              f"windows, {len(flagged)} flagged")
    print(f"\n{len(flagged)} flagged / {len(names)} checked")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
