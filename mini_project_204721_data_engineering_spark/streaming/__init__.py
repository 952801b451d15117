"""Structured Streaming surface (SURVEY §2.9 / §7 Phase 5).

The reference is batch-only; its closest construct is the idempotent
incremental append (J9).  This module provides the streaming re-expression
a Spark-native engine should have: file-source streams over the events
table, event-time windowed aggregation with watermarks, streaming
dedup, and gap-based sessionization.
"""

from mini_project_204721_data_engineering_spark.streaming.events import (
    read_events_stream,
    tumbling_counts,
    sliding_counts,
    session_counts,
    stream_dedup,
    run_available_now,
)

__all__ = [
    "read_events_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "stream_dedup",
    "run_available_now",
]
