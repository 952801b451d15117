"""Tests for the native-XML source wrapper (sources/xml.py)."""
from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from mini_project_204721_data_engineering_spark.sources.xml import (
    WIKI_PAGE_SCHEMA,
    read_xml,
    write_xml,
    xml_pages_to_corpus,
)


def test_xml_roundtrip_schema_explicit_and_malformed_policy(spark):
    """read_xml/write_xml: declared-schema round trip preserves values
    and types; a malformed row null-fills under the default PERMISSIVE
    policy and fails the job under strict=True."""
    d = tempfile.mkdtemp(prefix="xml_rt_")
    try:
        df = spark.createDataFrame(
            [(1, "x", 1.5), (2, "y <&> z", None), (3, None, -2.25)],
            "a long, b string, c double",
        )
        p = os.path.join(d, "out")
        write_xml(df, p, row_tag="row")
        back = read_xml(spark, p, "row", schema="a long, b string, c double")
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
        # entity escaping survived the round trip
        assert back.filter(F.col("b") == "y <&> z").count() == 1

        bad = os.path.join(d, "bad.xml")
        with open(bad, "w") as fh:
            fh.write(
                "<rows><row><a>1</a><b>ok</b></row>"
                "<row><a>NOT_A_NUMBER</a><b>meh</b></row></rows>"
            )
        rows = read_xml(spark, bad, "row", schema="a long, b string").collect()
        assert {r["a"] for r in rows} == {1, None}
        with pytest.raises(Exception):
            read_xml(spark, bad, "row", schema="a long, b string",
                     strict=True).collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_xml_wiki_pages_to_corpus_filters_and_prunes(spark):
    """xml_pages_to_corpus: main-namespace pages with non-empty latest
    text become documents rows; talk pages, empty revisions and short
    texts drop; nested text attributes (_bytes) parse without being
    projected."""
    d = tempfile.mkdtemp(prefix="xml_wiki_")
    try:
        p = os.path.join(d, "dump.xml")
        with open(p, "w") as fh:
            fh.write(
                """<mediawiki>
  <page><title>Alpha</title><ns>0</ns><id>10</id>
    <revision><id>100</id><timestamp>2024-01-01T00:00:00Z</timestamp>
      <text bytes="11">alpha body!</text></revision></page>
  <page><title>Talk:Alpha</title><ns>1</ns><id>11</id>
    <revision><id>101</id><timestamp>2024-01-01T00:00:00Z</timestamp>
      <text bytes="4">talk</text></revision></page>
  <page><title>Empty</title><ns>0</ns><id>12</id>
    <revision><id>102</id><timestamp>2024-01-01T00:00:00Z</timestamp>
      <text bytes="0"></text></revision></page>
  <page><title>Beta</title><ns>0</ns><id>13</id>
    <revision><id>103</id><timestamp>2024-01-02T00:00:00Z</timestamp>
      <text bytes="9">beta body</text></revision></page>
</mediawiki>"""
            )
        out = xml_pages_to_corpus(spark, p, min_chars=5)
        got = {r["doc_id"]: (r["text"], r["source"], r["n_chars"])
               for r in out.collect()}
        assert got == {
            10: ("alpha body!", "wiki_xml", 11),
            13: ("beta body", "wiki_xml", 9),
        }
        # corpus frame composes with downstream llm ops (token_stats shape)
        assert out.select("doc_id", "text", "source", "n_chars").columns == [
            "doc_id", "text", "source", "n_chars",
        ]
    finally:
        shutil.rmtree(d, ignore_errors=True)
