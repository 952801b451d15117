"""Event-stream operators over the ``events`` table shape.

Design notes (scale):
- File-source streams process newly-arrived files incrementally —
  the 100 TB posture is "events land in object storage, maxFilesPerTrigger
  bounds batch size, watermark bounds state".
- Every aggregation here carries a watermark: without it, windowed state
  grows unboundedly.  Watermark delay is the declared late-data tolerance.
- ``dropDuplicates`` with a watermarked event-time key is the streaming
  form of the reference's idempotent ingest (J9, ``utils.py:578-591``) —
  state for keys older than the watermark is dropped automatically.
"""

from __future__ import annotations

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

__all__ = [
    "EVENTS_SCHEMA",
    "read_events_stream",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "stream_dedup",
    "run_available_now",
]

#: canonical events schema once the nanos ts is normalized (catalog.py)
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of events-shaped parquet files.

    The declared schema expects microsecond timestamps (streaming sources
    require a schema up front; land files through a normalization hop if
    the producer writes nanos).
    """
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time windows: count + value sum per (window, type)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("value_sum"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding windows (each event lands in window/slide windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows: per-user activity bursts separated by ``gap`` of
    silence (Spark's native session_window — state bounded by watermark)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def stream_dedup(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming idempotent ingest: drop duplicate (key, event-time) rows,
    with state expiry at the watermark — the streaming J9."""
    keys = keys or ["user_id", "event_type"]
    return events.withWatermark("ts", watermark).dropDuplicates(keys + ["ts"])


def run_available_now(
    stream_df: DataFrame, query_name: str, timeout_sec: int = 120, output_mode: str = "complete"
) -> DataFrame:
    """Run a streaming DataFrame to completion over all currently-available
    input (Trigger.AvailableNow) into an in-memory sink; return the result
    as a batch DataFrame.  Used by tests and backfills.

    ``output_mode``: "complete" for aggregations, "append" for row-wise
    streams (dedup, projections).
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(timeout_sec)
    if not finished:
        # reading the sink now would silently return a partial batch
        q.stop()
        raise TimeoutError(
            f"streaming query {query_name!r} did not finish within {timeout_sec}s"
        )
    spark = stream_df.sparkSession
    return spark.table(query_name)
