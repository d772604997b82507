"""Structured Streaming operators (extension scope, SURVEY.md §2-C): the
batch tumbling/session aggregations re-expressed as streaming plans with
event-time watermarks, plus a file-replay harness for deterministic tests.

The reference is batch-only (app.py's loop is a sequential for over files);
these exist because the north star includes stream processing of the `events`
shape. The same logical aggregations in queries_relational.py
(hourly_event_stats / user_sessions) are the batch oracles the streaming
results are checked against in tests/test_streaming.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def replay_events_as_stream(
    spark: SparkSession,
    sf_dir: str,
    stage_dir: str,
    n_chunks: int = 8,
    max_files_per_trigger: int = 2,
) -> DataFrame:
    """Stage the events table as n_chunks json files and read them back as a
    file-source stream (maxFilesPerTrigger throttles, simulating arrival).
    Deterministic: chunking is by event_id hash-mod, file order by index."""
    from pyspark.sql import Window

    from datafusion_dedup_ai_spark.sources.readers import load_table

    # Chunk in EVENT-TIME order (ntile over ts) so replayed arrival order
    # approximates a live stream; id-modulo chunking would deliver old events
    # in late triggers and make first-arrival semantics diverge wildly from
    # event-time order.
    w = Window.orderBy("ts", "event_id")
    events = load_table(spark, sf_dir, "events").withColumn(
        "chunk", (F.ntile(n_chunks).over(w) - 1).cast("int")
    )
    os.makedirs(stage_dir, exist_ok=True)
    events.select(
        "event_id", F.unix_micros("ts").alias("ts_us"), "user_id",
        "event_type", "value", "props", "chunk",
    ).write.mode("overwrite").partitionBy("chunk").json(stage_dir)
    raw_schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts_us", LongType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    return (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(stage_dir + "/chunk=*")
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .drop("ts_us")
    )


def streaming_hourly_counts(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour event-time window with a watermark bounding state:
    late data beyond the watermark is dropped, windows finalize and evict.
    Mirrors the batch hourly_event_stats aggregation."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / 100.0).alias(
                "sum_value"
            ),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("hour_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def streaming_sliding_counts(
    stream: DataFrame,
    length: str = "2 hours",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding event-time windows (length > slide => overlapping): each event
    lands in length/slide windows, giving smoothed rolling counts — the
    streaming moving-average shape. Same watermark-bounded state story as the
    tumbling window; state size scales with (windows open per key) which is
    length/slide times the tumbling case, so slide choice IS the state
    budget at 100 TB/day rates."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", length, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_micros(F.col("w.start")).alias("win_start_us"),
            F.unix_micros(F.col("w.end")).alias("win_end_us"),
            "event_type",
            "n",
        )
    )


def streaming_session_windows(stream: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session windows (gap-close semantics) — the streaming analog of
    the batch lag+cumsum sessionization."""
    return (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
        )
    )


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
) -> "pyspark.sql.streaming.StreamingQuery":
    """Drive a streaming plan into an in-memory sink until all staged input is
    consumed (tests call processAllAvailable then read the table)."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .start()
    )


def streaming_click_purchase_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon_minutes: int = 60,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: each purchase joins the same
    user's click events from the preceding ``horizon_minutes``.

    State story (the thing that matters at scale): BOTH sides are
    watermarked and the join carries an explicit time-range predicate, so
    Spark derives state-eviction bounds — a click is dropped from the join
    state once the purchase-side watermark passes click_ts + horizon, and
    vice versa. Without the range condition the state grows forever; the
    analyzer accepts it only in append mode for exactly this reason.
    """
    c = (
        clicks.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    p = (
        purchases.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    horizon = F.expr(f"INTERVAL {horizon_minutes} MINUTES")
    joined = c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - horizon),
    )
    return joined.select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        F.unix_micros("click_ts").alias("click_us"),
        F.unix_micros("purchase_ts").alias("purchase_us"),
    )
