#!/usr/bin/env python
"""One committed per-round invariants artifact (VERDICT r12 task 7).

Folds the three standing structural gates into a single JSON the judge
can verify in one read:

1. **plan_invariants** — every registry query's physical plan compiled
   at the sf0.001 plan fixture with the global-order kernels forced
   onto their big path; asserts the forbidden markers never appear
   (``CartesianProduct``, ``BatchEvalPython`` — the same rules
   tests/test_plan_invariants.py enforces on every pytest run).
2. **global_window_audit** — the partitionBy-less-Window-over-unbounded
   -input sweep (``plans.audit.audit_registry``), i.e. the same payload
   as GLOBAL_WINDOW_AUDIT.json (which this script also refreshes so the
   two artifacts can never diverge).
3. **thirdway** — the generated-oracle discipline: the AST detector
   from tests/test_thirdway_inventory.py plus its replay registry;
   every flagged query must name a pure-Python replay file.

The plan compile is shared between (1) and (2) — one sweep, not two.

Usage: python scripts/invariants.py [rNN]   (writes INVARIANTS.json and,
with a round label, INVARIANTS_rNN.json)
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_PLAN = "/root/testdata/sf0.001"
FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


def _thirdway_section() -> dict:
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import importlib

    tw = importlib.import_module("test_thirdway_inventory")
    flagged = tw.detect_shared_generator_queries()
    missing = sorted(set(flagged) - set(tw.REPLAYS))
    return {
        "n_flagged": len(flagged),
        "n_replays_registered": len(tw.REPLAYS),
        "flagged_without_replay": missing,
        "flagged": {q: sorted(names) for q, names in sorted(flagged.items())},
        "replays": dict(sorted(tw.REPLAYS.items())),
    }


def main(argv) -> int:
    label = argv[1] if len(argv) > 1 else None

    # Static section first — no Spark needed, fails fast.
    thirdway = _thirdway_section()

    from spatial_data_engineering_spark.session import build_session
    from spatial_data_engineering_spark.operators import relational as R
    from spatial_data_engineering_spark.plans.audit import (
        _stable_ids, global_window_report)
    from spatial_data_engineering_spark.queries_registry import all_queries

    # keep the q56/q86/q199 LSH pair-cache side effect out of the repo
    os.environ.setdefault("SPARK_GRAFT_PAIR_CACHE", "/tmp/invariants_pair_cache")
    spark = build_session(app_name="invariants")
    spark.sparkContext.setLogLevel("ERROR")

    qs = all_queries()
    saved = R._ROW_ID_WINDOW_THRESHOLD
    R._ROW_ID_WINDOW_THRESHOLD = 0  # big-path force, as in the pytest gate
    marker_hits: dict[str, list[str]] = {}
    window_flagged: dict[str, list[str]] = {}
    window_table: dict[str, list] = {}
    errors: dict[str, str] = {}
    try:
        for name, fn in qs.items():
            try:
                df = fn(spark, SF_PLAN)
                plan = df._jdf.queryExecution().executedPlan().toString()
            except Exception as ex:  # noqa: BLE001
                errors[name] = str(ex)[:200]
                # audit_registry's error convention, mirrored so the
                # GLOBAL_WINDOW_AUDIT.json this script writes can never
                # disagree with the pytest-refreshed one on a broken
                # query (r13 review)
                window_table[name] = {"error": str(ex)[:200]}
                window_flagged[name] = [f"error: {str(ex)[:200]}"]
                continue
            hits = [m for m in FORBIDDEN if m in plan]
            if hits:
                marker_hits[name] = hits
            report = global_window_report(df)
            if report:
                window_table[name] = report
            bad = [r["window"] for r in report if not r["ok"]]
            if bad:
                window_flagged[name] = bad
    finally:
        R._ROW_ID_WINDOW_THRESHOLD = saved

    payload = {
        "sf": SF_PLAN,
        "n_checked": len(qs),
        "ok": (not marker_hits and not window_flagged and not errors
               and not thirdway["flagged_without_replay"]),
        "plan_invariants": {
            "forbidden_markers": list(FORBIDDEN),
            "n_hits": len(marker_hits),
            "hits": marker_hits,
            "errors": errors,
        },
        "global_window_audit": {
            "n_flagged": len(window_flagged),
            "flagged": _stable_ids(window_flagged),
            "global_windows": _stable_ids(window_table),
        },
        "thirdway": thirdway,
    }
    out = os.path.join(REPO, "INVARIANTS.json")
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=False)
    # refresh the legacy artifact from the SAME sweep so they can't split
    gwa = {"sf": SF_PLAN, "n_checked": len(qs),
           "n_flagged": len(window_flagged),
           "flagged": _stable_ids(window_flagged),
           "global_windows": _stable_ids(window_table)}
    with open(os.path.join(REPO, "GLOBAL_WINDOW_AUDIT.json"), "w") as fh:
        json.dump(gwa, fh, indent=1)
    if label:
        with open(os.path.join(REPO, f"INVARIANTS_{label}.json"), "w") as fh:
            json.dump(payload, fh, indent=1)
    print(json.dumps({k: payload[k] for k in ("n_checked", "ok")}
                     | {"plan_marker_hits": len(marker_hits),
                        "window_flagged": len(window_flagged),
                        "errors": len(errors),
                        "thirdway_flagged": thirdway["n_flagged"],
                        "thirdway_uncovered":
                            thirdway["flagged_without_replay"]}))
    spark.stop()
    return 0 if payload["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
