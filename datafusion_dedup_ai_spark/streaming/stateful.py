"""Custom stateful streaming operator: cross-trigger exact deduplication via
``applyInPandasWithState`` (extension scope, SURVEY.md §2-C "custom stateful
operators").

Emits each key's FIRST event and suppresses later duplicates for as long as
the key's state lives; state carries the first-seen timestamp and a duplicate
counter. By default state lives forever (NoTimeout — deterministic for the
batch-equivalence smoke tests). For production streams pass
``dedup_horizon_ms`` to bound the store: the operator then runs with
``EventTimeTimeout`` and re-arms each key's timeout to
``watermark + horizon`` on every arrival, and the ``hasTimedOut`` branch
evicts the key once the watermark passes that point — after which a replayed
key is treated as new (the standard bounded-window dedup contract at 100 TB/
day ingest, where unbounded per-key state is the scale-killer).
"""

from __future__ import annotations

from typing import Callable, Iterator

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


def _make_dedup_fn(horizon_ms: int | None) -> Callable:
    def _dedup_fn(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id, event_type = key
        if state.hasTimedOut:
            # Watermark passed this key's timeout: no event arrived within the
            # horizon, so the key can no longer receive in-watermark
            # duplicates — drop its state. A later replay re-enters as new.
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
        if horizon_ms is not None:
            # Sliding expiry: every arrival re-arms eviction to fire once the
            # watermark advances `horizon_ms` past this key's latest activity.
            # The max() matters on early triggers: the watermark lags a batch
            # behind (it is 0 on the first), and arming from the watermark
            # alone would place the timeout BEFORE the data's event time —
            # instant eviction once the watermark catches up.
            latest_ms = max(
                state.getCurrentWatermarkMs(), int(rows["ts_us"].max()) // 1000
            )
            state.setTimeoutTimestamp(latest_ms + horizon_ms)

    return _dedup_fn


def streaming_dedup_first_event(
    stream: DataFrame,
    dedup_horizon_ms: int | None = None,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Keep the first event per (user_id, event_type) across ALL triggers.

    The stateless batch analog is operators.dedup.exact_dedup; this is the
    streaming form where 'first' must survive trigger boundaries, which only
    state can express.

    With ``dedup_horizon_ms=None`` (default) state never expires — exact
    global dedup, right for finite replays and tests. With a horizon the
    operator bounds state via EventTimeTimeout: ``stream.ts`` is watermarked
    by ``watermark_delay`` and keys idle for ``dedup_horizon_ms`` of
    event-time are evicted (tests/test_streaming.py covers the eviction and
    re-admission path).
    """
    from pyspark.sql import functions as F

    if dedup_horizon_ms is None:
        # NoTimeout keeps the smoke path deterministic (a processing-time
        # timeout adds state-cleanup no-data batches that stall
        # processAllAvailable in local tests).
        keyed = stream.select(
            "user_id", "event_type", "event_id", F.unix_micros("ts").alias("ts_us")
        )
        timeout = GroupStateTimeout.NoTimeout
    else:
        # The watermark on ts is what drives getCurrentWatermarkMs() forward
        # and therefore what fires the timeouts. The watermarked column itself
        # must remain in the grouped child plan for the analyzer to accept
        # event-time timeout, so ts is kept alongside its micros projection.
        keyed = stream.withWatermark("ts", watermark_delay).select(
            "user_id",
            "event_type",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "ts",
        )
        timeout = GroupStateTimeout.EventTimeTimeout
    return keyed.groupBy("user_id", "event_type").applyInPandasWithState(
        _make_dedup_fn(dedup_horizon_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
