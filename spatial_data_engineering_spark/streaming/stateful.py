"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2 H / §7 phase 5: "custom stateful operators").

``running_user_totals`` keeps per-user running (count, sum) across
micro-batches — the minimal shape of a stateful enrichment operator
(fraud counters, rate limits, session features).  State is one small
tuple per user; timeouts are left to the caller's watermark policy.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("user_id bigint, batch_events bigint, "
                 "total_events bigint, total_value double")
STATE_SCHEMA = "total_events bigint, total_value double"


def _update(key: Any, pdfs: Iterable[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        total_events, total_value = state.get
    else:
        total_events, total_value = 0, 0.0
    batch_events = 0
    batch_value = 0.0
    for pdf in pdfs:
        batch_events += len(pdf)
        batch_value += float(pdf["value"].sum())
    total_events += batch_events
    total_value += batch_value
    state.update((total_events, total_value))
    yield pd.DataFrame({
        "user_id": [user_id], "batch_events": [batch_events],
        "total_events": [total_events], "total_value": [total_value],
    })


def running_user_totals(events: DataFrame) -> DataFrame:
    """Stateful per-user running totals (streaming frame in, stream out)."""
    return (
        events.groupBy("user_id").applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
