"""Rate-limited stream sampler (round-11): stream == batch parity and
the late-data / replay guarantees the operator's contract documents.

The streaming op is streaming/stateful.py::rate_limit_stream
(applyInPandasWithState, 2-bigint state per key); the batch twin is
plans/curation.py::rate_limited_admissions (row_number over
(user, day bucket) <= r) — the same twin q215's oracle checks in SQL.
"""

from __future__ import annotations

import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def ordered_events_dir(spark, tmp_path_factory):
    """Events split into 3 ts-ordered files (the log-stream arrival
    contract: per-key ts order across micro-batches)."""
    from spatial_data_engineering_spark.catalog import load

    out = str(tmp_path_factory.mktemp("rl_events"))
    e = load(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "ts").orderBy("ts", "event_id").collect()
    k = len(e) // 3 + 1
    for b in range(3):
        chunk = e[b * k:(b + 1) * k]
        if not chunk:
            continue
        (spark.createDataFrame(chunk)
         .coalesce(1).write.parquet(f"{out}/f{b}"))
        time.sleep(1.1)  # distinct mtimes => deterministic file order
    return out


def test_rate_limit_stream_matches_batch(spark, ordered_events_dir):
    from spatial_data_engineering_spark.plans.curation import (
        rate_limited_admissions)
    from spatial_data_engineering_spark.streaming.stateful import (
        rate_limit_stream)
    from spatial_data_engineering_spark.streaming.windows import (
        run_to_completion)

    batch = spark.read.option("recursiveFileLookup", "true").parquet(
        ordered_events_dir)
    stream = (spark.readStream.schema(batch.schema)
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", "true")
              .parquet(ordered_events_dir))
    got = run_to_completion(rate_limit_stream(stream, r=2),
                            "t_rate_limit").toPandas()
    want = rate_limited_admissions(batch, r=2).toPandas()
    assert len(want) > 0
    got_ids = sorted(got["event_id"].tolist())
    want_ids = sorted(want["event_id"].tolist())
    assert got_ids == want_ids
    # admission is capped and the cap binds somewhere on this data
    per = got.groupby(["user_id", "bucket_start"]).size()
    assert per.max() <= 2
    arrived = batch.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("b")).count().toPandas()
    assert (arrived["count"] > 2).any()  # some keys were actually capped


class _MockState:
    def __init__(self):
        self._v, self.exists = None, False

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v, self.exists = tuple(v), True


def _run(update, state, rows):
    out = list(update(("u",), [pd.DataFrame(rows)], state))
    return sorted(out[0]["event_id"].tolist()) if out else []


def test_late_bucket_rows_never_readmit():
    # contract: rows for a bucket OLDER than the key's current bucket
    # are late beyond policy — dropped, so a replay cannot double-admit
    from spatial_data_engineering_spark.streaming.stateful import (
        make_rate_limit_update)

    day_us = 86_400_000_000
    update = make_rate_limit_update(2, day_us)
    state = _MockState()
    t0 = pd.Timestamp("2024-01-01")
    t1 = pd.Timestamp("2024-01-02")
    # batch 1: day-1 rows fill the cap, day-2 opens a new bucket
    got1 = _run(update, state, {
        "event_id": [1, 2, 3, 10], "ts": [t0, t0, t0, t1]})
    assert got1 == [1, 2, 10]  # 3 rejected by the cap
    # batch 2: a replayed/late day-1 row must NOT reset day-2's window
    got2 = _run(update, state, {"event_id": [4, 11], "ts": [t0, t1]})
    assert got2 == [11]  # 4 is late-dropped; 11 still under day-2's cap
    got3 = _run(update, state, {"event_id": [12], "ts": [t1]})
    assert got3 == []  # day-2 cap now full
    assert state.get == (int(t1.value) // 1000, 2)


def test_within_batch_order_is_ts_then_id():
    from spatial_data_engineering_spark.streaming.stateful import (
        make_rate_limit_update)

    update = make_rate_limit_update(1, 86_400_000_000)
    state = _MockState()
    t0 = pd.Timestamp("2024-01-01 05:00:00")
    t1 = pd.Timestamp("2024-01-01 06:00:00")
    # arrives shuffled inside the micro-batch; the earliest (ts, id) wins
    got = _run(update, state, {"event_id": [9, 3], "ts": [t1, t0]})
    assert got == [3]
