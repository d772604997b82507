"""Structured Streaming smoke: file-replayed events through watermarked
tumbling and session windows must converge to the batch answers."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from datafusion_dedup_ai_spark.streaming import windows as W


@pytest.fixture(scope="module")
def staged(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream-stage")
    yield str(d)
    shutil.rmtree(str(d), ignore_errors=True)


def test_streaming_hourly_matches_batch(spark, sf_dir, staged):
    stream = W.replay_events_as_stream(spark, sf_dir, staged + "/hourly")
    q = W.run_stream_to_memory(
        W.streaming_hourly_counts(stream), "hourly_smoke", output_mode="complete"
    )
    try:
        q.processAllAvailable()
        got = {
            (r["hour_us"], r["event_type"]): (r["n"], r["sum_value"])
            for r in spark.sql("SELECT * FROM hourly_smoke").collect()
        }
    finally:
        q.stop()

    from datafusion_dedup_ai_spark.sources.readers import load_table

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("hour_us"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / 100.0).alias(
                "sum_value"
            ),
        )
        .collect()
    )
    want = {(r["hour_us"], r["event_type"]): (r["n"], r["sum_value"]) for r in batch}
    assert got == want


def test_streaming_session_windows_smoke(spark, sf_dir, staged):
    stream = W.replay_events_as_stream(spark, sf_dir, staged + "/sessions")
    q = W.run_stream_to_memory(
        W.streaming_session_windows(stream), "sessions_smoke", output_mode="complete"
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM sessions_smoke").collect()
    finally:
        q.stop()
    assert rows
    for r in rows[:200]:
        assert r["session_end_us"] > r["session_start_us"]
        assert r["n_events"] >= 1


def test_stateful_dedup_matches_batch_first_events(spark, sf_dir, staged):
    """applyInPandasWithState dedup must emit exactly the batch keep-first
    set even though events arrive over many triggers."""
    from datafusion_dedup_ai_spark.streaming.stateful import (
        streaming_dedup_first_event,
    )

    stream = W.replay_events_as_stream(spark, sf_dir, staged + "/statededup")
    q = W.run_stream_to_memory(
        streaming_dedup_first_event(stream), "dedup_smoke", output_mode="append"
    )
    try:
        q.processAllAvailable()
        emitted = spark.sql("SELECT * FROM dedup_smoke").collect()
    finally:
        q.stop()

    from datafusion_dedup_ai_spark.operators.dedup import exact_dedup
    from datafusion_dedup_ai_spark.sources.readers import load_table

    # Exactly ONE emission per key across all triggers (the property state
    # exists for — append mode would re-emit without it)...
    keys = [(r["user_id"], r["event_type"]) for r in emitted]
    assert len(keys) == len(set(keys))

    batch = exact_dedup(
        load_table(spark, sf_dir, "events"),
        ["user_id", "event_type"],
        ["ts", "event_id"],
    ).collect()
    want = {(r["user_id"], r["event_type"]): r["event_id"] for r in batch}
    # ...covering exactly the batch key set...
    assert set(keys) == set(want)
    # ...and since the replay arrives in event-time order, first-seen IS the
    # batch keep-first-by-time choice.
    for r in emitted:
        assert want[(r["user_id"], r["event_type"])] == r["event_id"]
