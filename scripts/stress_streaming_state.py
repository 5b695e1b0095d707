#!/usr/bin/env python
"""Streaming state-growth stress under adversarial key cardinality
(round-7 verdict task 8).

The question: does the event-time-timeout sessionizer
(streaming/stateful.py::sessionize_with_timeout) keep its state store
bounded by the WATERMARK HORIZON, or does it grow with total distinct
keys?  Adversarial input: every micro-batch introduces K brand-new
user_ids that never appear again (the worst case for keyed state — a
crawl of one-shot visitors).  If timeouts work, a key's state lives
only until the watermark passes session_end + gap, so live state is
O(keys per horizon), not O(total keys ever).

Method: B parquet files, one per micro-batch (maxFilesPerTrigger=1),
batch b holding K fresh keys at event time b*STEP; gap and watermark
are both 1 minute, STEP is 10 minutes, so each batch's keys should be
flushed ~1 batch later.  State rows per batch come from the progress
metrics (stateOperators[0].numRowsTotal).  PASS = max state rows stays
within a couple of batches' keys (<< B*K) and every key except the
un-flushable tail (watermark never passes the final batch on a bounded
source) emits exactly one session.

Usage: python scripts/stress_streaming_state.py [B [K]]   (default 20 5000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = (
    REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    keys_per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 5000

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from spatial_data_engineering_spark.streaming.stateful import (
        sessionize_with_timeout)
    from spatial_data_engineering_spark.streaming.windows import (
        read_events_stream)

    spark = (SparkSession.builder.master("local[8]")
             .appName("stress-streaming-state")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="stream_state_stress_")
    src = os.path.join(work, "src")
    os.makedirs(src)
    step_minutes = 10
    base = "2024-01-01 00:00:00"
    for b in range(n_batches):
        first = b * keys_per_batch
        (spark.range(first, first + keys_per_batch)
         .select(F.col("id").alias("event_id"),
                 (F.to_timestamp(F.lit(base))
                  + F.expr(f"INTERVAL {b * step_minutes} MINUTES"))
                 .alias("ts"),
                 F.col("id").alias("user_id"),
                 F.lit("view").alias("event_type"),
                 F.lit(1.0).alias("value"),
                 F.lit("{}").alias("props"))
         .coalesce(1)
         .write.mode("append").parquet(src))

    stream = read_events_stream(spark, src, max_files_per_trigger=1)
    sessions = sessionize_with_timeout(stream, gap="1 minute",
                                       watermark="1 minute")
    q = (sessions.writeStream.outputMode("append")
         .format("memory").queryName("state_stress")
         .option("checkpointLocation", os.path.join(work, "ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()

    state_rows = [p["stateOperators"][0]["numRowsTotal"]
                  for p in q.recentProgress
                  if p.get("stateOperators")]
    emitted = spark.sql(
        "SELECT COUNT(*) AS n, COUNT(DISTINCT user_id) AS k "
        "FROM state_stress").collect()[0]
    total_keys = n_batches * keys_per_batch
    max_state = max(state_rows) if state_rows else 0
    result = {
        "n_batches": n_batches,
        "keys_per_batch": keys_per_batch,
        "total_distinct_keys": total_keys,
        "max_state_rows": max_state,
        "final_state_rows": state_rows[-1] if state_rows else 0,
        "state_rows_per_batch": state_rows,
        "sessions_emitted": emitted["n"],
        "distinct_keys_emitted": emitted["k"],
        # bounded-source tail: the watermark never passes the last
        # batch's sessions, so those keys legitimately stay in state
        "expected_unflushed_tail": keys_per_batch,
        "bounded": max_state <= 3 * keys_per_batch,
    }
    print(json.dumps(result, indent=2))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    if not result["bounded"]:
        print("FAIL: state grew past 3x the per-horizon key count",
              file=sys.stderr)
        return 1
    if emitted["k"] != total_keys - keys_per_batch:
        print("FAIL: flushed-session coverage mismatch", file=sys.stderr)
        return 1
    print("PASS: state bounded by watermark horizon, all matured keys "
          "flushed exactly once", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
