#!/usr/bin/env python
"""Benchmark harness (driver contract, BASELINE.md).

Runs the engine's query inventory at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with the ``noop`` sink so the full plan executes
(scan -> shuffle -> agg) without sink overhead or driver-side collection.

The JSON line is guaranteed to be the SOLE stdout output: before the JVM
launches, the real stdout fd is saved and fd 1 is redirected to stderr, so
every Spark/py4j/console-progress byte (JVM children inherit fd 1) lands on
stderr and only the final JSON line reaches the caller's stdout.  The
stdout line is deliberately COMPACT (totals only, no per-query map): the
caller's capture truncated the long single line two rounds running
(BENCH_r03/r04 ``parsed: null``), so the per-query medians live solely in
``BENCH.json`` next to this script while stdout stays short enough to
survive any capture.

BASELINE.md's judging rule is "median of >=3 runs" (this host's co-tenant
noise swings single runs 3-10x), so the suite runs ``$SPARK_GRAFT_RUNS``
times (default 3) and reports the per-query MEDIAN; ``value`` is the sum
of medians.  Per-run totals ride along in ``runs_total`` so the spread is
visible in the artifact itself.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _claim_stdout():
    """Reserve the caller's stdout for the JSON line; route fd 1 to stderr.

    ``sys.stdout`` reassignment is not enough: the py4j JVM child and its
    console-progress writer inherit the process's *fd 1* and write to it
    directly.  Duplicating the real stdout away and pointing fd 1 at
    stderr before the JVM launches is the only reliable way to keep the
    one-JSON-line stdout contract.  Returns an ``emit(payload)`` closure
    that writes a compact summary line to the saved fd and the FULL
    payload (per-query medians included) to ``BENCH.json`` on disk.
    """
    real_stdout_fd = os.dup(1)
    os.dup2(2, 1)
    sys.stdout = sys.stderr  # keep Python-level print() coherent with fd 1

    def emit(payload: dict) -> None:
        # stdout FIRST: the one-line contract must hold even if the disk
        # write below fails (read-only checkout, full disk) — losing
        # BENCH.json is recoverable, losing the stdout line is not.
        compact = {k: v for k, v in payload.items() if k != "queries"}
        os.write(real_stdout_fd, (json.dumps(compact) + "\n").encode())
        try:
            with open(os.path.join(REPO, "BENCH.json"), "w") as fh:
                fh.write(json.dumps(payload) + "\n")
        except OSError as exc:
            print(f"bench: BENCH.json write failed: {exc}", file=sys.stderr)
        # Tracked per-round history (round-6 verdict task 6): BENCH.json
        # is gitignored/overwritten, so round-over-round per-query deltas
        # were not auditable from git alone.  When a run is labeled
        # (SPARK_GRAFT_BENCH_LABEL=r7-builder etc.) the FULL payload is
        # appended to BENCH_history.jsonl, which IS committed; unlabeled
        # iteration runs don't pollute the history.
        label = os.environ.get("SPARK_GRAFT_BENCH_LABEL")
        if label:
            try:
                with open(os.path.join(REPO, "BENCH_history.jsonl"),
                          "a") as fh:
                    fh.write(json.dumps({"label": label, **payload}) + "\n")
            except OSError as exc:
                print(f"bench: history append failed: {exc}",
                      file=sys.stderr)

    return emit


def main() -> None:
    emit = _claim_stdout()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        m = re.search(r"sf([\d.]+)", sf_dir)
        sf = float(m.group(1).rstrip(".")) if m else None
    except ValueError:
        sf = None  # e.g. "sf." — never crash before the JSON contract

    from spatial_data_engineering_spark.session import build_session
    from spatial_data_engineering_spark.queries_registry import all_queries

    spark = build_session(app_name="bench")

    # JVM/codegen warmup so the first measured query doesn't pay startup
    # cost: a scan plus a small decimal-aggregate exercises the parquet
    # reader, whole-stage codegen and the hash-agg path.
    try:
        from pyspark.sql import functions as F

        from spatial_data_engineering_spark.catalog import TABLES, load

        # touch every table once (OS page cache + parquet footers) so the
        # first measured query per table isn't charged for cold I/O
        for t in TABLES:
            load(spark, sf_dir, t).count()
        (spark.read.parquet(f"{sf_dir}/nation.parquet")
         .groupBy("n_regionkey")
         .agg(F.sum(F.col("n_nationkey").cast("decimal(30,6)")))
         .write.mode("overwrite").format("noop").save())
        # one real query untimed (VERDICT r10 task 7): BENCH_r10's first
        # suite pass ran 203 s vs 122/113 warm — JIT/codegen/shuffle-
        # machinery cold start was ~45% of a pass and lands entirely on
        # run 1, skewing a 3-run median upward.  q01 exercises the
        # decimal-agg + join + sort paths the suite leans on.
        all_queries()["q01_pricing_summary"](spark, sf_dir).write.mode(
            "overwrite").format("noop").save()
    except Exception as exc:
        # still emit the one-line contract even if the data dir is wrong
        emit({
            "metric": "query_suite_total", "value": -1.0, "unit": "sec",
            "queries": {}, "sf": sf,
            "failures": {"_warmup": f"{type(exc).__name__}: {exc}"[:200]},
        })
        spark.stop()
        return

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_RUNS", "3")))
    per_query: dict[str, list[float]] = {}
    failures: dict[str, str] = {}
    run_totals: list[float] = []
    queries = sorted(all_queries().items())
    # targeted re-measure (e.g. the noise-cluster A/Bs BASELINE.md calls
    # for): SPARK_GRAFT_QUERIES="q81_substring_dup,q156_..." restricts
    # the suite; the emitted JSON still carries n_queries so a subset
    # run can't be mistaken for a full-suite total
    subset = os.environ.get("SPARK_GRAFT_QUERIES")
    if subset:
        want = {s.strip() for s in subset.split(",") if s.strip()}
        unknown = want - {n for n, _ in queries}
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_QUERIES unknown: {sorted(unknown)}")
        queries = [(n, f) for n, f in queries if n in want]
    import gc
    # Optional DISCARDED full-suite warm-up pass (round 15; VERDICT r14
    # task 2).  The sf1 frontier probe's in-suite flags were pure run-1
    # JIT/codegen warm-up two rounds running (r13: 5 flags, r14: 4 —
    # every isolated arbiter median landed BELOW anchor): a 3-run median
    # over [cold, warm, warm] is one noisy co-tenant window away from
    # reading cold.  With SPARK_GRAFT_WARMUP_SUITE=1 the selected
    # queries run once UNTIMED first, so all scored runs start with the
    # JVM, codegen caches and session memos warm — the steady-state
    # number the anchors represent.  The payload records the mode so a
    # warm-started row can't be mistaken for a cold-start one.
    warmup_suite = os.environ.get("SPARK_GRAFT_WARMUP_SUITE") == "1"
    if warmup_suite:
        for name, fn in queries:
            gc.collect()
            try:
                fn(spark, sf_dir).write.mode("overwrite").format(
                    "noop").save()
            except Exception:
                pass  # the timed loop records (and re-tries) failures
    # Optional between-query storage scrub (round 16; VERDICT r15 task
    # 6).  The one surviving sf1 probe flag class was suite COMPOSITION
    # noise: q50-class queries paid for the storage/GC state left by
    # the queries before them (r15: 12.46 s in-suite vs 2.14 s
    # isolated).  With SPARK_GRAFT_CLEARCACHE_BETWEEN=1, after each
    # scored query (OUTSIDE the timed region) the catalog cache is
    # cleared and an explicit JVM GC runs — the gc.collect() below
    # already drops the Python refs, and System.gc() makes the
    # ContextCleaner unpersist the now-dead checkpoint/broadcast blocks
    # NOW instead of at the 1-minute periodic GC, so no query inherits
    # its predecessors' dead storage.  Session-memoized frames survive
    # (their Python refs are live, so their blocks are never collected);
    # the payload records the mode.
    clearcache = os.environ.get("SPARK_GRAFT_CLEARCACHE_BETWEEN") == "1"

    def _scrub():
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    for _ in range(n_runs):
        run_total = 0.0
        for name, fn in queries:
            # release the previous query's py4j handles BEFORE timing:
            # localCheckpoint()-pinned frames (the LSH shingle tables,
            # kernel offsets) hold executor storage until Python GC
            # drops their JVM refs AND the JVM GC lets ContextCleaner
            # unpersist them (the JVM half is the session's 1-minute
            # spark.cleaner.periodicGC.interval).  Without both, blocks
            # accumulate across the 212-query suite and late queries pay
            # the memory pressure — the sf1 probe measured q47 at 11 s
            # isolated vs 53 s late-in-suite.  The gc runs OUTSIDE the
            # timed region.
            gc.collect()
            if clearcache:
                _scrub()
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                dt = time.perf_counter() - t0
                per_query.setdefault(name, []).append(dt)
                run_total += dt
            except Exception as exc:  # a failed query must not hide the rest
                # record the error but KEEP any successful runs' timings
                # and keep trying in later runs: a transient co-tenant
                # failure must not deflate the headline total (the median
                # below covers whatever runs succeeded), and value must
                # stay reconcilable with runs_total
                failures[name] = f"{type(exc).__name__}: {exc}"[:200]
        run_totals.append(round(run_total, 3))

    timings = {name: round(statistics.median(ts), 3)
               for name, ts in per_query.items()}
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "query_suite_total_median",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
        "n_runs": n_runs,
        "runs_total": run_totals,
    }
    if warmup_suite:
        out["warmup_suite"] = True
    if clearcache:
        out["clearcache_between"] = True
    if failures:
        out["failures"] = failures
    emit(out)
    spark.stop()


if __name__ == "__main__":
    main()
