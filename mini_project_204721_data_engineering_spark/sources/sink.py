"""Partitioned fact sink (S8 at scale).

The reference appends with chunked multi-row INSERTs in one transaction
(``backend/app/utils.py:170-179``).  The Spark-native equivalent for a
partitioned fact table is **dynamic partition overwrite**: re-ingesting a
date slice atomically replaces exactly the partitions present in the
incoming batch and leaves every other partition untouched — idempotent
re-runs for free, no read-then-anti-join needed when the unit of ingest
is a whole partition.  (Row-level idempotence within a partition stays
``operators.joins.idempotent_append``.)
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "write_fact_partitioned",
    "overwrite_fact_partitions",
    "write_bucketed",
    "write_jdbc",
]


def write_fact_partitioned(df: DataFrame, path: str, partition_cols: Sequence[str]) -> None:
    """Initial/append write of a fact table partitioned for pruning
    (reference's B-tree indexes on date/year, ``models.py:91-99`` →
    directory partitions + parquet min/max stats)."""
    df.write.partitionBy(*partition_cols).mode("append").parquet(path)


def overwrite_fact_partitions(df: DataFrame, path: str, partition_cols: Sequence[str]) -> None:
    """Idempotent partition-grain re-ingest: overwrite ONLY the partitions
    in ``df`` (dynamic mode), never the whole table — the atomic
    replacement the reference's read-then-write ingest lacks
    (SURVEY §7 hard-part #6)."""
    spark: SparkSession = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.partitionBy(*partition_cols).mode("overwrite").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    bucket_cols: Sequence[str],
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed-table sink — the co-located-join layout at 100 TB.

    Pays the shuffle ONCE at write: rows are hashed into ``buckets``
    files per partition on ``bucket_cols``, and that layout is recorded
    in the catalog.  Every later equi-join or aggregation on the bucket
    key between same-bucketed tables runs with NO exchange at all
    (asserted in tests/test_layout.py) — the recurring fact⋈fact shuffle,
    the dominant cost of a repeated 100 TB join, disappears from the
    plan.  ``sort_cols`` additionally pre-sorts within buckets so
    sort-merge joins skip their sort.  ``path`` makes the table external
    (data at ``path``, metadata in the session catalog)."""
    w = df.write.mode(mode).bucketBy(buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 2000,
    num_partitions: int | None = None,
    properties: dict[str, str] | None = None,
    _writer=None,
) -> None:
    """S8 relational parity: append a DataFrame to a JDBC table, matching
    the reference's chunked multi-row INSERT sink
    (``backend/app/utils.py:170-179``: ``to_sql(..., method="multi",
    chunksize=2000)``) — ``batchsize`` defaults to the same 2000.

    Scale notes: each Spark partition opens one connection and writes its
    rows in ``batchsize`` batches — pass ``num_partitions`` to coalesce
    first so a 1000-executor job doesn't open 1000 connections against a
    single Postgres (the classic JDBC-sink failure at scale).  Writes are
    per-partition-atomic, not global: pair with
    ``operators.joins.idempotent_append`` or an upsert-view on the target
    for exactly-once semantics.

    ``_writer`` injects the terminal write for tests (this environment
    ships no JDBC driver jars); the production path is
    ``DataFrameWriter.jdbc``.
    """
    if num_partitions is not None:
        df = df.coalesce(num_partitions)
    props = {"batchsize": str(batchsize), **(properties or {})}
    if _writer is not None:
        _writer(df, url, table, mode, props)
        return
    df.write.option("batchsize", str(batchsize)).jdbc(
        url=url, table=table, mode=mode, properties=props
    )
