"""Streaming data-quality gate: run the declarative expectations suite
(:mod:`..operators.expectations`) on every micro-batch and append the
checks-sized report — the input a streaming circuit-breaker or
freshness monitor actually consumes ("stop promoting batches when
null-rate spikes").

State shape: NONE.  Each batch's report is a pure function of the
batch (expectations fuse to one scan of the batch; FK checks join a
STATIC dimension snapshot), so there is no streaming state store, and
restarts are idempotent the same way the embedding intake is — each
batch overwrites its own ``batch=<id>/`` report directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["expectations_stream", "process_expectations_batch",
           "drift_stream", "process_drift_batch"]


def process_expectations_batch(
    batch_df: DataFrame,
    batch_id: int,
    expects: list,
    report_path: str,
    table_name: str = "stream",
    static_tables: dict[str, DataFrame] | None = None,
) -> None:
    """One epoch: run ``expects`` over the batch (plus ``static_tables``
    for FK parents) and overwrite this batch's report directory."""
    from mini_project_204721_data_engineering_spark.operators.expectations import (
        run_expectations,
    )

    if batch_df.isEmpty():
        return
    tables = {table_name: batch_df, **(static_tables or {})}
    report = run_expectations(tables, {table_name: expects}).withColumn(
        "batch_id", F.lit(batch_id).cast("long")
    )
    report.write.mode("overwrite").parquet(f"{report_path}/batch={batch_id}")


def expectations_stream(
    stream_df: DataFrame,
    expects: list,
    report_path: str,
    table_name: str = "stream",
    static_tables: dict[str, DataFrame] | None = None,
):
    """Wire a streaming DataFrame into the per-batch quality gate.
    Returns the ``DataStreamWriter`` (caller adds checkpoint/trigger
    and ``.start()``)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_expectations_batch(
            batch_df, batch_id, expects, report_path, table_name, static_tables
        )

    return stream_df.writeStream.outputMode("append").foreachBatch(process)


def process_drift_batch(
    batch_df: DataFrame,
    batch_id: int,
    ref: DataFrame,
    col: str,
    breaks: list,
    report_path: str,
    eps: float = 1e-6,
) -> None:
    """One epoch of the drift monitor: PSI of this batch's ``col``
    distribution against a STATIC reference snapshot (the training-set
    or last-known-good distribution), written as this batch's
    bins-sized report.  Same statelessness/idempotence contract as the
    expectations gate: the report is a pure function of the batch, and
    each batch overwrites its own ``batch=<id>/`` directory."""
    from mini_project_204721_data_engineering_spark.operators.expectations import psi_drift

    if batch_df.isEmpty():
        return
    report = (
        psi_drift(ref, batch_df, col, breaks, eps=eps)
        .withColumn("batch_id", F.lit(batch_id).cast("long"))
    )
    report.write.mode("overwrite").parquet(f"{report_path}/batch={batch_id}")


def drift_stream(
    stream_df: DataFrame,
    ref: DataFrame,
    col: str,
    breaks: list,
    report_path: str,
    eps: float = 1e-6,
):
    """Wire a streaming DataFrame into the per-batch PSI drift monitor
    (operators/expectations.py::psi_drift vs a static reference).
    Returns the ``DataStreamWriter`` (caller adds checkpoint/trigger
    and ``.start()``).  Downstream alerting reads the report stream
    and triggers on ``sum(psi_term) > 0.25`` per batch — the standard
    investigate threshold."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        process_drift_batch(
            batch_df, batch_id, ref, col, breaks, report_path, eps=eps
        )

    return stream_df.writeStream.outputMode("append").foreachBatch(process)
