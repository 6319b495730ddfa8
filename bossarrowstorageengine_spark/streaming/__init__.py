"""Structured Streaming surface (SURVEY.md §2.B9, §3.2 E3): the event-time
operators as incremental pipelines over a file stream, plus a micro-batch
test harness."""

from bossarrowstorageengine_spark.streaming.pipelines import (
    sessionized_counts,
    running_user_totals,
    streaming_dedup,
    tumbling_counts,
)

__all__ = ["tumbling_counts", "sessionized_counts", "streaming_dedup",
           "running_user_totals"]
