#!/usr/bin/env python
"""Per-query DRIVER-SIDE construction profiler (round 17, guide §1/§5).

Times fn(spark, sf_dir) ONLY — no action — for every registry query, after
a full warm-up pass so session memos (shingle frames, components, kmeans
fits, MMR pools...) are hot and what remains is the honest per-call
construction cost: py4j round trips for DataFrame/Column API calls plus any
eager driver-side jobs a query legitimately runs while building its plan
(bounded collects, iterative loops).

Output: JSON to stdout, sorted descending by pass-2 construction seconds.
Usage: python scripts/profile_construction.py [qname ...]
"""
from __future__ import annotations

import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from spatial_data_engineering_spark.session import build_session
    from spatial_data_engineering_spark.queries_registry import all_queries

    spark = build_session(app_name="construction-profile")
    queries = sorted(all_queries().items())
    if len(sys.argv) > 1:
        want = set(sys.argv[1:])
        queries = [(n, f) for n, f in queries if n in want]

    # Warm-up: construct AND execute once so JIT, codegen cache and every
    # session memo is hot; the passes below then measure steady state.
    for name, fn in queries:
        try:
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        except Exception as exc:
            print(f"warmup {name}: {type(exc).__name__}: {exc}",
                  file=sys.stderr)

    n_pass = int(os.environ.get("PROFILE_PASSES", "2"))
    per: dict[str, list[float]] = {}
    for _ in range(n_pass):
        for name, fn in queries:
            gc.collect()
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir)
            except Exception:
                continue
            per.setdefault(name, []).append(time.perf_counter() - t0)

    rows = sorted(((name, [round(t, 4) for t in ts])
                   for name, ts in per.items()),
                  key=lambda kv: -min(kv[1]))
    total_min = sum(min(ts) for _, ts in per.items())
    print(json.dumps({"sf_dir": sf_dir, "n": len(rows),
                      "total_min_construction_sec": round(total_min, 2),
                      "per_query": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
