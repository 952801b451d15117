"""Streaming corpus intake — the streaming twin of the batch
corpus-assembly pipeline (queries/llm_queries.py::corpus_assembly).

Documents land as parquet files in object storage; each micro-batch is
quality-gated, PII-scrubbed, and exactly-deduped against every
previously-seen content hash, then appended to the curated store.

Scale notes
-----------
- The dedup state is the content-hash set, checkpoint-persisted — a
  crash/restart resumes with the full seen-set (asserted across a real
  restart in tests/test_streaming.py).  Corpus identity has no event
  time, so full-history state cannot be watermark-bounded; at 100 TB
  either (a) bound intake state to a retention horizon with an
  ingest-time ``dropDuplicatesWithinWatermark`` and rely on the
  batch-side band index (llm/dedup.py::incremental_neardup) for
  full-history identity — implemented as
  :func:`curate_stream_bounded`, with eviction + restart-survival
  asserted in tests/test_streaming.py — or (b) accept hash-set state:
  32 B × |corpus| spread across the state store
  (:func:`curate_stream`).
- Gate and scrub are stateless row filters — they add no streaming
  state at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from mini_project_204721_data_engineering_spark.llm.text import pii_redact, quality_score

__all__ = [
    "DOCS_SCHEMA",
    "read_docs_stream",
    "curate_stream",
    "curate_stream_bounded",
    "corpus_stats_stream",
]

#: documents-table schema (streaming sources need it declared up front)
DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def read_docs_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of documents-shaped parquet files."""
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def curate_stream(docs: DataFrame, min_quality: float = 0.5) -> DataFrame:
    """Quality gate → PII scrub → exact dedup, streaming form.

    Emits curated (doc_id, lang, source, text, content_hash, n_tokens)
    rows in append mode.  The hash is computed BEFORE redaction so a
    re-arriving raw duplicate dedups against the stored copy even though
    the stored text is the scrubbed one.
    """
    from mini_project_204721_data_engineering_spark.llm.text import token_count

    gated = docs.filter(quality_score(F.col("text")) >= min_quality)
    hashed = gated.withColumn("content_hash", F.md5("text"))
    scrubbed = hashed.withColumn("text", pii_redact(F.col("text")))
    return scrubbed.dropDuplicates(["content_hash"]).select(
        "doc_id",
        "lang",
        "source",
        "text",
        "content_hash",
        token_count(F.col("text")).alias("n_tokens"),
    )


def curate_stream_bounded(
    docs: DataFrame,
    min_quality: float = 0.5,
    horizon: str = "7 days",
    ingest_ts_col: str = "ingest_ts",
) -> DataFrame:
    """Bounded-state variant of :func:`curate_stream` — option (a) from
    the module docstring, now wired: dedup state is limited to a
    retention ``horizon`` of ingest time via
    ``dropDuplicatesWithinWatermark``, so state size is
    O(intake-rate × horizon) instead of O(|corpus|) — the shape that
    keeps a year-long 100 TB intake from accreting an unbounded
    hash-set in the state store.

    ``docs`` must carry an ``ingest_ts_col`` timestamp (file sources:
    stamp at landing; or ``withColumn(ingest_ts_col,
    F.current_timestamp())`` at the source).  Duplicates re-arriving
    WITHIN the horizon are dropped (state survives checkpointed
    restarts); a duplicate re-arriving after its first copy ages past
    the horizon is intentionally re-admitted here and caught by the
    batch-side full-history identity instead — probe the persistent
    band index (``llm/dedup.py::incremental_neardup``) or the curated
    store's ``content_hash`` column in the downstream merge.  The pair
    (bounded streaming state + indexed batch dedup) is the production
    composition; unbounded :func:`curate_stream` remains for
    small-corpus intakes.
    """
    from mini_project_204721_data_engineering_spark.llm.text import token_count

    gated = docs.filter(quality_score(F.col("text")) >= min_quality)
    hashed = gated.withColumn("content_hash", F.md5("text"))
    scrubbed = hashed.withColumn("text", pii_redact(F.col("text")))
    return (
        scrubbed.withWatermark(ingest_ts_col, horizon)
        .dropDuplicatesWithinWatermark(["content_hash"])
        .select(
            "doc_id",
            "lang",
            "source",
            "text",
            "content_hash",
            F.col(ingest_ts_col),
            token_count(F.col("text")).alias("n_tokens"),
        )
    )


def corpus_stats_stream(docs: DataFrame, min_quality: float = 0.5) -> DataFrame:
    """Running per-language corpus totals over the curated stream
    (complete output mode — the live intake dashboard)."""
    return (
        curate_stream(docs, min_quality)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )
