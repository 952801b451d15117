"""Table catalog for the synthetic star schema.

The driver provides deterministic parquet tables (TESTDATA.md):
``region nation customer supplier part orders lineitem events documents
embeddings``.  They stand in for the reference's star schema
(reference ``backend/app/models.py:26-87``): ``nation``/``region`` play the
province/district dimensions, ``orders``/``lineitem`` play the fact tables,
``events`` plays the incident log, ``documents``/``embeddings`` back the
LLM-pipeline extensions.

Scale notes
-----------
- ``region`` (5 rows) and ``nation`` (25) are always broadcast — like the
  reference's 928-district dimension, they are broadcast-sized at any SF.
- ``customer``/``supplier``/``part`` are "medium dims": broadcastable at
  test SF, shuffle-joined at 100 TB.  We do NOT hard-broadcast them;
  AQE picks the strategy from observed sizes.
- Fact tables (``lineitem``, ``orders``, ``events``) are read with
  pushdown-friendly plain ``spark.read.parquet`` — filters and column
  pruning reach the scan (verify via ``plans.explain_checks``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["TABLES", "SMALL_DIMS", "load_table", "load_tables", "register_views"]

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: dimensions that are broadcast-sized at every scale factor
SMALL_DIMS = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table as a DataFrame (lazy parquet scan).

    ``events.parquet`` ``ts`` has shipped in two physical forms across
    driver rounds; both are handled:

    - TIMESTAMP(NANOS) (r1-r2 data): Spark has no native type for it —
      read as raw nanos (``spark.sql.legacy.parquet.nanosAsLong``,
      runtime-settable) and rebuild a microsecond timestamp with integer
      division (``div``; float division would lose precision above
      2^53 ns ≈ 1970+104 days).
    - timestamp[us] with isAdjustedToUTC=false (r4+ data): resolves to
      ``TIMESTAMP_NTZ`` under Spark's ``inferTimestampNTZ`` default.  The
      nanos conf is a no-op for it and the column passes through as NTZ,
      so downstream code must use NTZ-safe expressions
      (``timestamp_diff``, never ``unix_micros``).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # scope the legacy conf to this read: analysis of the scan (schema
        # resolution) happens eagerly here, so restoring the previous value
        # afterwards doesn't affect this DataFrame — but a lingering "true"
        # would silently turn every later nano-timestamp read into bigint
        key = "spark.sql.legacy.parquet.nanosAsLong"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "true")
        try:
            df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
            if dict(df.dtypes).get("ts") == "bigint":
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every synthetic table present under ``sf_dir``."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = load_table(spark, sf_dir, name)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view for ``spark.sql``."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
