"""Compressed-JSONL shard ingest (sources/jsonl.py): zstd/gzip/plain
mixed directories, loose-schema alignment, chunked parsing."""

from __future__ import annotations

import os

import pytest

from mini_project_204721_data_engineering_spark.sources.jsonl import (
    read_jsonl,
    write_jsonl_shard,
)

SCHEMA = "doc_id long, text string, lang string"


def test_jsonl_mixed_codecs_roundtrip(spark, tmp_path):
    d = str(tmp_path)
    write_jsonl_shard(
        [{"doc_id": i, "text": f"zstd doc {i}", "lang": "en"} for i in range(40)],
        os.path.join(d, "a.jsonl.zst"),
    )
    write_jsonl_shard(
        [{"doc_id": 100 + i, "text": f"gzip doc {i}", "lang": "de"} for i in range(30)],
        os.path.join(d, "b.jsonl.gz"),
    )
    write_jsonl_shard(
        [{"doc_id": 200 + i, "text": f"plain doc {i}", "lang": "fr"} for i in range(20)],
        os.path.join(d, "c.jsonl"),
    )
    out = read_jsonl(spark, d, SCHEMA)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 90
    assert rows[3]["text"] == "zstd doc 3" and rows[3]["lang"] == "en"
    assert rows[115]["text"] == "gzip doc 15"
    assert rows[210]["lang"] == "fr"


def test_jsonl_loose_schema_missing_and_extra_fields(spark, tmp_path):
    d = str(tmp_path)
    write_jsonl_shard(
        [
            {"doc_id": 1, "text": "has extra", "lang": "en", "junk": 42},
            {"doc_id": 2, "text": "missing lang"},
        ],
        os.path.join(d, "x.jsonl.zst"),
    )
    out = read_jsonl(spark, d, SCHEMA)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(out.columns) == {"doc_id", "text", "lang"}  # junk dropped
    assert rows[2]["lang"] is None  # missing → null
    assert rows[1]["lang"] == "en"


def test_jsonl_chunked_parse_bounds_memory(spark, tmp_path):
    """chunk_rows smaller than the shard forces multiple yielded chunks
    with identical results — the bounded-task-memory path."""
    d = str(tmp_path)
    write_jsonl_shard(
        [{"doc_id": i, "text": "x" * 50, "lang": "en"} for i in range(500)],
        os.path.join(d, "big.jsonl.zst"),
    )
    out = read_jsonl(spark, d, SCHEMA, chunk_rows=64)
    assert out.count() == 500
    assert out.agg({"doc_id": "sum"}).collect()[0][0] == sum(range(500))


def test_jsonl_no_match_is_empty_scan(spark, tmp_path):
    # binaryFile on a dir with no matching shards → empty DataFrame with
    # the declared schema (new landing directories read as zero rows)
    out = read_jsonl(spark, str(tmp_path), SCHEMA)
    assert out.collect() == []
    assert out.columns == ["doc_id", "text", "lang"]


def test_jsonl_per_line_missing_numeric_field_yields_nulls(spark, tmp_path):
    """A shard where only SOME lines miss a numeric field parses as a
    pandas float column with NaN — the nullable-dtype coercion must turn
    those into SQL nulls instead of failing the task on the long cast."""
    d = str(tmp_path)
    write_jsonl_shard(
        [
            {"doc_id": 1, "text": "has id", "lang": "en"},
            {"text": "no id at all", "lang": "en"},
            {"doc_id": 3, "text": "has id too", "lang": "de"},
        ],
        os.path.join(d, "partial.jsonl.gz"),
    )
    out = read_jsonl(spark, d, SCHEMA)
    rows = sorted(out.collect(), key=lambda r: (r["doc_id"] is None, r["doc_id"]))
    assert [r["doc_id"] for r in rows] == [1, 3, None]
    assert rows[2]["text"] == "no id at all"
    assert dict(out.dtypes)["doc_id"] == "bigint"


def test_jsonl_mixed_junk_in_numeric_field_salvages_parseable(spark, tmp_path):
    """Strings in a declared-long field null out rather than killing the
    shard; numeric strings salvage."""
    d = str(tmp_path)
    write_jsonl_shard(
        [
            {"doc_id": "7", "text": "numeric string id", "lang": "en"},
            {"doc_id": "oops", "text": "junk id", "lang": "en"},
        ],
        os.path.join(d, "junk.jsonl"),
    )
    rows = {r["text"]: r["doc_id"] for r in read_jsonl(spark, d, SCHEMA).collect()}
    assert rows["numeric string id"] == 7
    assert rows["junk id"] is None


def test_jsonl_fractional_float_in_integer_field_nulls_not_fails(spark, tmp_path):
    """A fractional float (1.5) in a declared-long field is an unsafe
    cast pandas refuses even after to_numeric — the coercion must null
    the non-integral value and keep the rest of the shard (integral
    floats like 3.0 still land as longs)."""
    d = str(tmp_path)
    write_jsonl_shard(
        [
            {"doc_id": 1.5, "text": "fractional id", "lang": "en"},
            {"doc_id": 3.0, "text": "integral float id", "lang": "en"},
            {"doc_id": 4, "text": "plain int id", "lang": "de"},
        ],
        os.path.join(d, "frac.jsonl"),
    )
    rows = {r["text"]: r["doc_id"] for r in read_jsonl(spark, d, SCHEMA).collect()}
    assert rows["fractional id"] is None
    assert rows["integral float id"] == 3
    assert rows["plain int id"] == 4


def test_jsonl_quarantine_routes_bad_lines(spark, tmp_path):
    """Dead-letter mode: broken JSON and non-object lines become
    _corrupt_record rows carrying the raw line; good rows parse
    normally with _corrupt_record NULL — one filter splits the two."""
    d = str(tmp_path)
    raw = (
        '{"doc_id": 1, "text": "ok one", "lang": "en"}\n'
        '{"doc_id": 2, "text": "broken\n'  # truncated mid-string
        "42\n"  # valid JSON, not an object
        "\n"  # blank: skipped, not quarantined
        '{"doc_id": 3, "text": "ok two", "lang": "fr"}\n'
        "not json at all\n"
    )
    with open(os.path.join(d, "dirty.jsonl"), "w") as fh:
        fh.write(raw)
    out = read_jsonl(spark, d, SCHEMA, on_error="quarantine")
    assert out.columns == ["doc_id", "text", "lang", "_corrupt_record"]
    rows = out.collect()
    good = {r["doc_id"]: r for r in rows if r["_corrupt_record"] is None}
    bad = sorted(r["_corrupt_record"] for r in rows if r["_corrupt_record"] is not None)
    assert set(good) == {1, 3} and good[3]["lang"] == "fr"
    assert bad == ['42', "not json at all", '{"doc_id": 2, "text": "broken']
    assert all(r["doc_id"] is None for r in rows if r["_corrupt_record"] is not None)


def test_jsonl_quarantine_compressed_and_all_good(spark, tmp_path):
    d = str(tmp_path)
    write_jsonl_shard(
        [{"doc_id": i, "text": f"doc {i}", "lang": "en"} for i in range(25)],
        os.path.join(d, "clean.jsonl.zst"),
    )
    out = read_jsonl(spark, d, SCHEMA, on_error="quarantine")
    assert out.filter("_corrupt_record IS NOT NULL").count() == 0
    assert out.count() == 25


def test_jsonl_fail_mode_still_raises_and_bad_args_refused(spark, tmp_path):
    d = str(tmp_path)
    with open(os.path.join(d, "dirty.jsonl"), "w") as fh:
        fh.write('{"doc_id": 1}\nnot json\n')
    with pytest.raises(Exception):
        read_jsonl(spark, d, SCHEMA).collect()
    with pytest.raises(ValueError, match="on_error"):
        read_jsonl(spark, d, SCHEMA, on_error="skip")
    with pytest.raises(ValueError, match="reserved"):
        read_jsonl(
            spark, d, "doc_id long, _corrupt_record string", on_error="quarantine"
        )
