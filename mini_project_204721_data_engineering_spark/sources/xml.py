"""XML source/sink — Spark 4's NATIVE XML reader (SPARK-44265, the
spark-xml package merged into core), wrapped with the engine's
schema-explicit discipline and a corpus-ingest convenience for the
shape LLM pipelines actually meet: Wikipedia-style ``<page>`` dumps.

Unlike the byte-level clean-room readers in this package (NetCDF,
HDF5, Avro, …), XML needs no hand parser here: the built-in data
source is distributed (one file split per task, no driver bytes),
predicate-pushdown-aware at the row-tag level, and handles entity
decoding / CDATA / attributes per spec.  The wrapper exists to pin the
engine's contracts on top:

- **schema is declared, not inferred, on the production path** — XML
  inference requires an EXTRA full pass over the data (the reader
  samples every row) and can drift shard-to-shard at 100 TB; callers
  pass the DDL they expect, and inference is an explicit opt-in for
  exploration (``schema=None``).
- malformed rows follow the same policy as the JSONL reader:
  PERMISSIVE null-fill by default with the corrupt record preserved in
  ``_corrupt_record`` when the schema carries it, or FAILFAST when
  ``strict=True``.

Reference parity: the reference ingests no XML (its inputs are Excel /
Shapefile / NetCDF); this extends the source family for the wiki-dump
corpus shape, SURVEY §2.8's training-data mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_xml", "write_xml", "xml_pages_to_corpus"]


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: str | None = None,
    strict: bool = False,
) -> DataFrame:
    """Distributed XML scan: one DataFrame row per ``<row_tag>`` element.

    ``schema`` is a DDL string (``"a long, b string"``); None opts into
    inference (exploration only — it costs a full extra pass and the
    inferred types can drift across shards).  ``strict=True`` fails the
    job on the first malformed row instead of null-filling."""
    r = (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .option("mode", "FAILFAST" if strict else "PERMISSIVE")
    )
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)


def write_xml(
    df: DataFrame, path: str, row_tag: str, root_tag: str = "rows"
) -> None:
    """Write a DataFrame as XML part-files (one ``<root_tag>`` document
    per partition, one ``<row_tag>`` element per row) — the round-trip
    half for tests and for feeding XML-consuming downstreams."""
    (
        df.write.format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .mode("overwrite")
        .save(path)
    )


#: Wikipedia-export page shape: the subset of the dump schema a corpus
#: pipeline consumes (title, namespace, id, latest-revision text).  The
#: text element carries attributes in real dumps, so it maps to a
#: struct with the element value in ``_VALUE``.
WIKI_PAGE_SCHEMA = (
    "title string, ns long, id long, "
    "revision struct<id: long, timestamp: string, "
    "text: struct<_VALUE: string, _bytes: long>>"
)


def xml_pages_to_corpus(
    spark: SparkSession, path: str, min_chars: int = 1
) -> DataFrame:
    """Wiki-style XML dump → ``documents``-shaped corpus frame
    ``(doc_id, text, source, n_chars)``: main-namespace pages with
    non-empty latest-revision text.  Runs as one scan with the
    ns/text predicates pushed to the row level by Catalyst; the
    nested-struct projection prunes every dump field not listed in
    :data:`WIKI_PAGE_SCHEMA`."""
    pages = read_xml(spark, path, row_tag="page", schema=WIKI_PAGE_SCHEMA)
    return (
        pages.filter(F.col("ns") == 0)
        .select(
            F.col("id").alias("doc_id"),
            F.col("revision.text._VALUE").alias("text"),
            F.lit("wiki_xml").alias("source"),
        )
        .filter(F.col("text").isNotNull() & (F.length("text") >= min_chars))
        .withColumn("n_chars", F.length("text"))
    )
