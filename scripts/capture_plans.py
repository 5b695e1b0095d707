#!/usr/bin/env python
"""Capture .explain("formatted") for registry queries (optimization rounds).

Writes ``plans/<round>/<query>_<tag>.txt`` for every selected query — the
judge checks optimization claims (Exchange counts, join strategies,
PushedFilters, Python-eval nodes) against these files, so they are committed.

Usage:
    python scripts/capture_plans.py r16 before [q01_x,q02_y,...]
    python scripts/capture_plans.py r16 after  q227_audio_neardup

With no query list, captures the FULL inventory.  Plans are compiled at the
bench scale factor (sf0.1 by default, $SPARK_GRAFT_SF_DIR) so the shapes
match what the bench measures (AQE initial plans; the formatted output is
pre-execution, isFinalPlan=false, which is the comparable artifact).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main(argv) -> int:
    if len(argv) < 3:
        raise SystemExit(__doc__)
    rnd, tag = argv[1], argv[2]
    subset = None
    if len(argv) > 3:
        subset = {s.strip() for s in argv[3].split(",") if s.strip()}

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)

    os.environ.setdefault("SPARK_GRAFT_PAIR_CACHE", "/tmp/capture_plans_cache")
    from spatial_data_engineering_spark.session import build_session
    from spatial_data_engineering_spark.queries_registry import all_queries

    spark = build_session(app_name=f"capture_plans_{rnd}_{tag}")
    spark.sparkContext.setLogLevel("ERROR")

    qs = all_queries()
    if subset:
        unknown = subset - set(qs)
        if unknown:
            raise SystemExit(f"unknown queries: {sorted(unknown)}")
        qs = {n: f for n, f in qs.items() if n in subset}

    n_ok = n_err = 0
    for name, fn in sorted(qs.items()):
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        try:
            df = fn(spark, sf_dir)
            text = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            n_ok += 1
        except Exception as ex:  # noqa: BLE001
            text = f"ERROR compiling plan: {type(ex).__name__}: {ex}\n"
            n_err += 1
        with open(path, "w") as fh:
            fh.write(f"-- {name} ({tag}, {rnd}, sf_dir={sf_dir})\n")
            fh.write(text if text.endswith("\n") else text + "\n")
        print(f"{name}: written", file=sys.stderr)
    print(f"captured {n_ok} plans ({n_err} errors) -> {out_dir}")
    spark.stop()
    return 1 if n_err else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
