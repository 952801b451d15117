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
        # Debezium NUMERIC shapes: bytes- and fixed-based decimals
        {"name": "price", "type": {"type": "bytes", "logicalType": "decimal",
                                   "precision": 12, "scale": 2}},
        {"name": "rate", "type": {"type": "fixed", "name": "R8", "size": 8,
                                  "logicalType": "decimal",
                                  "precision": 18, "scale": 6}},
    ],
}


def _rows(n=120, offset=0):
    import decimal

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
            # signed decimals incl. negatives and zero
            "price": decimal.Decimal(i * 7 - 200) / 100,
            "rate": decimal.Decimal(i * 11 - 300) / 1_000_000,
        }
        for i in range(offset, offset + n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate", "snappy"])
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
    import decimal as _d

    assert got[0][9] == _d.Decimal("-2.00")    # negative bytes decimal
    assert got[30][9] == _d.Decimal("0.10")
    assert got[0][10] == _d.Decimal("-0.000300")  # fixed(8) decimal
    assert got[40][10] == _d.Decimal("0.000140")


def test_avro_distributed_scan_and_schema(spark, tmp_path):
    d = str(tmp_path)
    write_avro(os.path.join(d, "a.avro"), SCHEMA, _rows(80), codec="deflate")
    write_avro(os.path.join(d, "b.avro"), SCHEMA, _rows(40, offset=500))
    out = read_avro(spark, d)
    assert out.count() == 120
    types = dict(out.dtypes)
    assert types["doc_id"] == "bigint" and types["at"] == "timestamp_ntz"
    assert types["day"] == "date" and types["tags"] == "array<string>"
    assert types["price"] == "decimal(12,2)" and types["rate"] == "decimal(18,6)"
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[503]["text"] == "doc 503 körper"
    assert rows[7]["text"] is None
    assert rows[502]["tags"] == ["t2", "x"]
    import decimal as _d

    assert rows[0]["price"] == _d.Decimal("-2.00")
    assert rows[505]["rate"] == _d.Decimal("0.005255")
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
    # unsupported shapes named loudly: multi-branch union, dangling ref
    multi_union = {"type": "record", "name": "X",
                   "fields": [{"name": "u", "type": ["null", "long", "string"]}]}
    with pytest.raises(NotImplementedError, match="union"):
        write_avro(str(tmp_path / "u.avro"), multi_union, [{"u": 1}])
    dangling = {"type": "record", "name": "Y",
                "fields": [{"name": "r", "type": "NoSuchType"}]}
    with pytest.raises(NotImplementedError, match="NoSuchType"):
        write_avro(str(tmp_path / "r.avro"), dangling, [{"r": None}])
    # corrupt snappy payload (CRC region flipped) → ValueError
    ps = str(tmp_path / "s.avro")
    write_avro(ps, SCHEMA, _rows(30), codec="snappy")
    sraw = bytearray(open(ps, "rb").read())
    sraw[-18] ^= 0xFF  # inside the final block's CRC32 / sync region
    with pytest.raises(ValueError):
        parse_avro(bytes(sraw))
    with pytest.raises(ValueError, match="no files match"):
        read_avro(spark, str(tmp_path / "empty_nowhere"))
    # recursive named types refuse LOUDLY with the field path — never a
    # RecursionError outside the documented contract.  Values use the
    # null branch so the fixture writer terminates.
    node = {"type": "record", "name": "Node",
            "fields": [{"name": "v", "type": "long"},
                       {"name": "next", "type": ["null", "Node"]}]}
    pr = str(tmp_path / "rec.avro")
    write_avro(pr, node, [{"v": 1, "next": None}])
    with pytest.raises(NotImplementedError,
                       match="recursive named-type reference 'Node' at next"):
        parse_avro(open(pr, "rb").read())
    # ... including recursion back to the ROOT from a nested record
    outer = {"type": "record", "name": "Outer", "namespace": "ns",
             "fields": [{"name": "inner", "type": {
                 "type": "record", "name": "Inner",
                 "fields": [{"name": "back", "type": ["null", "ns.Outer"]}],
             }}]}
    po = str(tmp_path / "rec2.avro")
    write_avro(po, outer, [{"inner": {"back": None}}])
    with pytest.raises(NotImplementedError, match="recursive named-type"):
        parse_avro(open(po, "rb").read())


DBZ_VALUE = {
    "type": "record", "name": "Value", "namespace": "dbz.inventory.docs",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": ["null", "string"]},
        {"name": "lang", "type": ["null", "string"]},
    ],
}
DBZ_ENVELOPE = {
    "type": "record", "name": "Envelope", "namespace": "dbz.inventory.docs",
    "fields": [
        # first occurrence DEFINES Value; the second is a name REFERENCE
        # — the exact shape Debezium emits for before/after
        {"name": "before", "type": ["null", DBZ_VALUE]},
        {"name": "after", "type": ["null", "Value"]},
        {"name": "op", "type": "string"},
        {"name": "ts_ms", "type": "long"},
        {"name": "source", "type": {"type": "map", "values": "string"}},
    ],
}


def _envelope_rows(docs_rows):
    out = []
    for i, r in enumerate(docs_rows):
        val = {"doc_id": r["doc_id"], "text": r["text"], "lang": r["lang"]}
        if i % 13 == 0:  # a delete: after=null, before carries the row
            out.append({"before": val, "after": None, "op": "d",
                        "ts_ms": 1700000000000 + i,
                        "source": {"table": "documents", "lsn": str(i)}})
        else:
            out.append({"before": val if i % 3 == 0 else None, "after": val,
                        "op": "u" if i % 3 == 0 else "c",
                        "ts_ms": 1700000000000 + i,
                        "source": {"table": "documents"}})
    return out


def test_avro_debezium_envelope_nested_records_and_maps(spark, tmp_path):
    """The reader's own headline use case: a Debezium CDC envelope is a
    record with NESTED ``before``/``after`` sub-records (the second via
    a named-type reference) plus a ``map<string,string>`` source block,
    snappy-coded in Kafka-ecosystem landings.  Round-trips byte-level
    and reads distributed into Spark struct/map columns."""
    rows = [
        {"doc_id": i, "text": None if i % 11 == 0 else f"doc {i}",
         "lang": ["en", "de", "th"][i % 3]}
        for i in range(60)
    ]
    env_rows = _envelope_rows(rows)
    d = str(tmp_path)
    write_avro(os.path.join(d, "cdc0.avro"), DBZ_ENVELOPE, env_rows[:30],
               codec="snappy", block_rows=7)
    write_avro(os.path.join(d, "cdc1.avro"), DBZ_ENVELOPE, env_rows[30:],
               codec="deflate")
    # byte-level round-trip
    schema, got = parse_avro(open(os.path.join(d, "cdc0.avro"), "rb").read())
    assert len(got) == 30
    assert got[0][1] is None and got[0][0]["doc_id"] == 0  # delete row
    assert got[1][1] == {"doc_id": 1, "text": "doc 1", "lang": "de"}
    assert got[0][4] == {"table": "documents", "lsn": "0"}
    # distributed scan → struct / map dtypes
    out = read_avro(spark, d, pattern="cdc*.avro")
    types = dict(out.dtypes)
    assert types["after"] == "struct<doc_id:bigint,text:string,lang:string>"
    assert types["before"] == types["after"]  # name ref resolved
    assert types["source"] == "map<string,string>"
    assert out.count() == 60
    from pyspark.sql import functions as F

    # unwrap after → the row-level table (the CDC-consume projection)
    live = (
        out.filter(F.col("op") != "d")
        .select(F.col("after.doc_id").alias("doc_id"),
                F.col("after.text").alias("text"),
                F.col("after.lang").alias("lang"))
    )
    got_live = {r["doc_id"]: (r["text"], r["lang"]) for r in live.collect()}
    want_live = {r["doc_id"]: (r["text"], r["lang"])
                 for i, r in enumerate(rows) if i % 13 != 0}
    assert got_live == want_live
    # map access is a plain Spark expression
    lsns = out.filter(F.col("source")["lsn"].isNotNull()).count()
    assert lsns == len([i for i in range(60) if i % 13 == 0])


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

    # same corpus landed as Debezium CDC envelopes (nested before/after
    # records, snappy): unwrap `after` → identical pipeline result for
    # the non-deleted subset
    denv = str(tmp_path / "cdc")
    os.makedirs(denv)
    env_rows = _envelope_rows(rows)
    write_avro(os.path.join(denv, "e0.avro"), DBZ_ENVELOPE,
               env_rows[: len(env_rows) // 2], codec="snappy")
    write_avro(os.path.join(denv, "e1.avro"), DBZ_ENVELOPE,
               env_rows[len(env_rows) // 2 :], codec="deflate")
    unwrapped = (
        read_avro(spark, denv)
        .filter(F.col("op") != "d")
        .select("after.doc_id", "after.text", "after.lang")
    )
    deleted_ids = {r["doc_id"] for i, r in enumerate(rows) if i % 13 == 0}
    via_env = {
        (r["h"], r["keep_id"]) for r in pipeline(unwrapped).collect()
    }
    want = {
        (r["h"], r["keep_id"])
        for r in pipeline(docs.filter(~F.col("doc_id").isin(deleted_ids))).collect()
    }
    assert via_env == want
