"""Avro Object Container File round-trips (sources/avro.py): binary
encoding, codecs, nullable unions, logical types, multi-file scans,
and corruption behavior."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from mini_project_204721_data_engineering_spark.sources.avro import (
    avro_schema,
    parse_avro,
    read_avro,
    write_avro,
)

SCHEMA = {
    "type": "record",
    "name": "Doc",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "kind", "type": {"type": "enum", "name": "K",
                                  "symbols": ["A", "B", "C"]}},
        {"name": "day", "type": {"type": "int", "logicalType": "date"}},
        {"name": "at", "type": {"type": "long",
                                "logicalType": "timestamp-micros"}},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "blob", "type": "bytes"},
    ],
}


def _rows(n=120, offset=0):
    return [
        {
            "doc_id": i,
            "text": None if i % 7 == 0 else f"doc {i} körper",
            "score": i / 3.0,
            "flag": i % 2 == 0,
            "kind": "ABC"[i % 3],
            "day": dt.date(2024, 1, 1) + dt.timedelta(days=i % 90),
            "at": dt.datetime(2024, 3, 1, 12, 0, 0)
            + dt.timedelta(seconds=i * 37, microseconds=i),
            "tags": [f"t{i % 5}", "x"] if i % 4 else [],
            "blob": bytes([i % 256, 255 - i % 256]),
        }
        for i in range(offset, offset + n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_avro_roundtrip_all_types(tmp_path, codec):
    p = str(tmp_path / f"r_{codec}.avro")
    rows = _rows(120)
    write_avro(p, SCHEMA, rows, codec=codec, block_rows=32)
    schema, got = parse_avro(open(p, "rb").read())
    assert schema["name"] == "Doc"
    assert len(got) == 120
    r17 = got[17]
    assert r17[0] == 17 and r17[1] == "doc 17 körper"
    assert abs(r17[2] - 17 / 3.0) < 1e-12
    assert r17[4] == "C" and r17[7] == ["t2", "x"]
    assert got[14][1] is None  # nullable union
    assert got[3][5] == dt.date(2024, 1, 4)  # logical date
    assert got[1][6] == dt.datetime(2024, 3, 1, 12, 0, 37, 1)
    assert got[5][8] == bytes([5, 250])


def test_avro_distributed_scan_and_schema(spark, tmp_path):
    d = str(tmp_path)
    write_avro(os.path.join(d, "a.avro"), SCHEMA, _rows(80), codec="deflate")
    write_avro(os.path.join(d, "b.avro"), SCHEMA, _rows(40, offset=500))
    out = read_avro(spark, d)
    assert out.count() == 120
    types = dict(out.dtypes)
    assert types["doc_id"] == "bigint" and types["at"] == "timestamp_ntz"
    assert types["day"] == "date" and types["tags"] == "array<string>"
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[503]["text"] == "doc 503 körper"
    assert rows[7]["text"] is None
    assert rows[502]["tags"] == ["t2", "x"]
    sch = avro_schema(os.path.join(d, "a.avro"))
    assert [f["name"] for f in sch["fields"]][0] == "doc_id"


def test_avro_corrupt_and_unsupported(tmp_path, spark):
    with pytest.raises(ValueError, match="magic"):
        parse_avro(b"NOPE" + b"\x00" * 64)
    p = str(tmp_path / "t.avro")
    write_avro(p, SCHEMA, _rows(30))
    raw = bytearray(open(p, "rb").read())
    truncated = bytes(raw[: len(raw) // 2])
    with pytest.raises(ValueError):
        parse_avro(truncated)
    # unsupported codec named loudly
    bad_schema = {"type": "record", "name": "X",
                  "fields": [{"name": "m", "type": {"type": "map", "values": "long"}}]}
    with pytest.raises(NotImplementedError, match="map"):
        write_avro(str(tmp_path / "m.avro"), bad_schema, [{"m": {}}])
    with pytest.raises(ValueError, match="no files match"):
        read_avro(spark, str(tmp_path / "empty_nowhere"))


def test_avro_to_corpus_pipeline_capstone(spark, tmp_path):
    """CDC-dump-to-corpus composition: the documents table landed as
    Avro containers (the Kafka-sink shape), read back distributed, and
    fed through the corpus gate→dedup→stats pipeline — result equals
    the same pipeline over the parquet original (format-independence
    of the engine surface)."""
    from mini_project_204721_data_engineering_spark.catalog import load_table
    from mini_project_204721_data_engineering_spark.llm.text import quality_score

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text", "lang"
    )
    schema = {
        "type": "record", "name": "Docs",
        "fields": [
            {"name": "doc_id", "type": "long"},
            {"name": "text", "type": ["null", "string"]},
            {"name": "lang", "type": ["null", "string"]},
        ],
    }
    rows = [r.asDict() for r in docs.collect()]
    d = str(tmp_path / "land")
    os.makedirs(d)
    write_avro(os.path.join(d, "s0.avro"), schema, rows[: len(rows) // 2],
               codec="deflate")
    write_avro(os.path.join(d, "s1.avro"), schema, rows[len(rows) // 2 :])

    from pyspark.sql import functions as F

    def pipeline(df):
        return (
            df.filter(quality_score(F.col("text")) >= 0.3)
            .withColumn("h", F.md5("text"))
            .groupBy("h").agg(F.min("doc_id").alias("keep_id"))
        )

    via_avro = pipeline(read_avro(spark, d))
    via_parquet = pipeline(docs)
    a = {(r["h"], r["keep_id"]) for r in via_avro.collect()}
    b = {(r["h"], r["keep_id"]) for r in via_parquet.collect()}
    assert a == b and len(a) > 100
