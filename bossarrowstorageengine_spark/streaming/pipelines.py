"""Streaming pipelines — the same logical transformations as the batch
event-time queries (``operators.event_time``), expressed over an unbounded
source with watermarks.

Each builder takes any events-shaped DataFrame (batch or streaming): the
transformation code is identical in both modes — the engine property that
makes the batch oracle meaningful for the streaming path.

Scale: state stores are keyed by (window, event_type) / (user_id, session)
/ (user_id, event_type); watermarks bound state size, so the pipelines run
indefinitely on an unbounded 100 TB/day stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def tumbling_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """1-hour tumbling window × event_type counts/sums; in streaming mode
    the watermark lets Spark finalize (and emit, in append mode) windows
    older than max(ts) − watermark and evict their state."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("win.start").alias("win_start"), "event_type",
                "n_events", "sum_value")
    )


def sessionized_counts(events: DataFrame, gap: str = "10 minutes",
                       watermark: str = "1 hour") -> DataFrame:
    """Per-user session windows (inactivity gap); sessions close when the
    watermark passes session end."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Drop duplicate (user_id, event_type) pairs; with a watermark the
    dedup state is evicted instead of growing forever."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
        return src.dropDuplicatesWithinWatermark(["user_id", "event_type"])
    return src.dropDuplicates(["user_id", "event_type"])
