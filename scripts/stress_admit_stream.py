#!/usr/bin/env python
"""Streaming-admission stress (round-8 verdict task 6): the batch
``admit_delta`` stress's streaming twin.

Builds the same synthetic template corpus as stress_curation.py at a
400k-doc base, persists the base signature table once
(``persisted_shingle_bands``), then drives ``admit_stream`` over K
micro-batches of delta files (1k docs each, same even-near-dup /
odd-fresh mix as the batch stress) and reports:

* per-batch wall (the StreamingQueryListener's triggerExecution ms —
  the honest number, not a wrapper's stopwatch);
* the state bound: admit_stream keeps NO Spark state store — its only
  growing structure is the admitted-output parquet whose rows feed the
  next batch's effective base.  Reported per batch so growth is
  visible (it is admission-sized, not arrival-sized).

What must hold: per-batch cost stays in the admit_delta class (the
base never shuffles for a delta probe; base signatures are read from
the persisted table, built zero times inside the stream) and admitted
counts match the batch-mode mix expectation (evens near-dup the base
and reject; odds are fresh vs base but near-dup each other in-group).

Usage: python scripts/stress_admit_stream.py [n_base] [n_batches] [batch_rows]
           [base_parquet]
Defaults: 400_000 4 1_000.  When ``base_parquet`` is given (e.g.
``testdata_sf1/documents.parquet`` — VERDICT r10 task 5), the REAL
corpus at that path is the admission base instead of the synthetic
template corpus (n_base is then ignored); even delta rows exact-dup a
base document (must reject), odd rows carry unique synthetic text
(must admit).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_GRAFT_PAIR_CACHE",
                      os.path.join(tempfile.gettempdir(),
                                   "stress_admit_stream_cache"))
os.environ["PYTHONPATH"] = (
    REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    batch_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000
    base_path = sys.argv[4] if len(sys.argv) > 4 else None

    from pyspark.sql import functions as F
    from pyspark.sql.streaming import StreamingQueryListener

    from spatial_data_engineering_spark.operators.dedup import (
        persisted_exact_hashes, persisted_shingle_bands)
    from spatial_data_engineering_spark.session import build_session
    from spatial_data_engineering_spark.streaming.windows import admit_stream

    spark = build_session(app_name="stress_admit_stream")
    spark.sparkContext.setLogLevel("ERROR")

    words = ("the fast key order sort table scan merge part window small "
             "hash join query row data slow filter customer line batch "
             "value agg group stream column vector").split()
    arr = "array(" + ", ".join(f"'{w}'" for w in words) + ")"
    terms = ", ".join(
        f"element_at({arr}, pmod(hash(id DIV 5, {i}), {len(words)}) + 1)"
        for i in range(40))

    tmp = tempfile.mkdtemp(prefix="stress_admit_stream_")
    out: dict = {"n_base": n_base, "n_batches": n_batches,
                 "batch_rows": batch_rows,
                 "loadavg": open("/proc/loadavg").read().split()[0]}
    try:
        if base_path:
            src = os.path.abspath(base_path)
            base = spark.read.parquet(src).select("doc_id", "text")
            n_base = base.count()
            out["n_base"], out["base"] = n_base, src
        else:
            src = f"{tmp}/documents.parquet"
            (spark.range(n_base).select(
                F.col("id").alias("doc_id"),
                F.expr(f"concat(concat_ws(' ', {terms}), ' v',"
                       f" CAST(id AS STRING))").alias("text"))
             .write.mode("overwrite").parquet(src))
            base = spark.read.parquet(src)

        # the stored tables: built + persisted ONCE, outside the
        # stream (the refresh pattern admit_delta documents), and
        # PASSED THROUGH so the stream rebuilds nothing base-sized —
        # batch-0 trigger wall is admission cost, not base build
        t0 = time.perf_counter()
        sigs = persisted_shingle_bands(spark, src)
        sigs[0].count(); sigs[1].count()
        eh = persisted_exact_hashes(spark, src)
        eh.count()
        out["base_sig_build_sec"] = round(time.perf_counter() - t0, 2)

        # delta files: same mix as the batch stress — evens near-dup a
        # base group (reject vs base), odds are fresh vs base but
        # near-dup each other within a DIV-5 group (keep-first admits
        # roughly one per group)
        stream_dir = f"{tmp}/incoming"
        os.makedirs(stream_dir)
        if base_path:
            # real-corpus mode: evens exact-dup a base document (the
            # exact tier must reject), odds carry unique pseudo-random
            # 40-word texts (must admit).  The dup pool is one
            # batch-sized collect — a bounded driver artifact.
            pool = [r["text"] for r in
                    base.orderBy("doc_id").limit(batch_rows).collect()]
            for b in range(n_batches):
                off = 10_000_000 + b * batch_rows
                rows = []
                for i in range(batch_rows):
                    if i % 2 == 0:
                        txt = pool[(b * 37 + i) % len(pool)]
                    else:
                        txt = " ".join(
                            f"w{(i * 7 + j * 13 + b * 29) % 9973}"
                            for j in range(40))
                    rows.append((off + i, txt))
                (spark.createDataFrame(rows, "doc_id long, text string")
                 .coalesce(1).write.parquet(f"{stream_dir}/f{b}"))
                time.sleep(1.1)  # distinct mtimes => deterministic order
        for b in range(n_batches) if not base_path else []:
            off = 10_000_000 + b * batch_rows
            (spark.range(batch_rows).select(
                (F.col("id") + off).alias("doc_id"),
                F.expr(f"CASE WHEN id % 2 = 0"
                       f" THEN concat(concat_ws(' ', {terms}), ' v',"
                       f" CAST(id * 5 AS STRING))"
                       f" ELSE concat('fresh{b}_', CAST(id AS STRING), ' ',"
                       f" reverse(concat_ws(' ', {terms})), ' z',"
                       f" CAST(id + {off} AS STRING)) END").alias("text"))
             .coalesce(1).write.parquet(f"{stream_dir}/f{b}"))
            time.sleep(1.1)  # distinct mtimes => deterministic order

        progress: list[dict] = []

        class L(StreamingQueryListener):
            def onQueryStarted(self, event):  # noqa: N802
                pass

            def onQueryProgress(self, event):  # noqa: N802
                j = event.progress.json
                progress.append(json.loads(j() if callable(j) else j))

            def onQueryTerminated(self, event):  # noqa: N802
                pass

            def onQueryIdle(self, event):  # noqa: N802
                pass

        spark.streams.addListener(L())
        stream = (spark.readStream.schema("doc_id long, text string")
                  .option("maxFilesPerTrigger", 1)
                  .option("recursiveFileLookup", "true")
                  .parquet(stream_dir))
        out_dir = f"{tmp}/admitted"
        t0 = time.perf_counter()
        admit_stream(base, stream, out_dir, f"{tmp}/ckpt",
                     base_signatures=sigs, base_exact_hashes=eh)
        out["stream_total_sec"] = round(time.perf_counter() - t0, 2)
        time.sleep(3)  # the listener bus is async; let the last
        # progress event land before reading the capture

        # per-batch wall from the listener (triggerExecution); admitted
        # counts from the OUTPUT parquet — the ground truth.  Note
        # numInputRows over-counts: admit_delta's joins evaluate the
        # batch frame several times, and the file source reports rows
        # per scan — reported as rows_read, not rows_arrived.
        trigger = {p["batchId"]: round(
            p["durationMs"].get("triggerExecution", 0) / 1000.0, 2)
            for p in progress if p.get("numInputRows", 0) > 0}
        rows_read = {p["batchId"]: p.get("numInputRows")
                     for p in progress if p.get("numInputRows", 0) > 0}
        admitted = spark.read.parquet(out_dir)
        by_batch = {int(r["batch"]): int(r["n"]) for r in
                    admitted.groupBy("batch")
                    .agg(F.count(F.lit(1)).alias("n")).collect()}
        cum, batches = 0, []
        for bid in sorted(by_batch):
            n_adm = by_batch[bid]
            batches.append(
                {"batch_id": bid,
                 "trigger_sec": trigger.get(bid),
                 "rows_read": rows_read.get(bid),
                 "admitted": n_adm,
                 "effective_base_rows": n_base + cum})
            cum += n_adm
        out["batches"] = batches
        out["n_admitted_total"] = cum
        # invariants: every delta file became its own micro-batch, each
        # admitted something but far fewer than arrived (the near-dup
        # tiers bite), and the admitted "state" grows by admissions,
        # not arrivals
        assert len(batches) == n_batches, batches
        for b in batches:
            assert 0 < b["admitted"] <= batch_rows // 2 + batch_rows // 10, b
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
