"""Clean-room protobuf wire format (sources/protobuf.py): round-trip,
the encoding spec's own worked byte examples, unknown-field skipping,
packed repeated scalars, corruption contract, distributed scan."""

from __future__ import annotations

import os

import pytest

from mini_project_204721_data_engineering_spark.sources.protobuf import (
    decode_stream,
    encode_record,
    read_protobuf,
    write_protobuf_shard,
)

SCHEMA = {
    1: ("doc_id", "int64"),
    2: ("text", "string"),
    3: ("score", "double"),
    4: ("flags", "int64", {"repeated": True}),
    5: ("meta", "message", {"schema": {1: ("lang", "string"), 2: ("ok", "bool")}}),
    6: ("delta", "sint64"),
    7: ("blob", "bytes"),
    8: ("ratio", "float"),
}


def _rec(i):
    return {
        "doc_id": i if i % 2 else -i,  # negative int64 = 10-byte varint
        "text": f"doc {i} — ünïcode ✓",
        "score": i * 1.5,
        "flags": [i, i + 1, 0],
        "meta": {"lang": "th" if i % 2 else "en", "ok": bool(i % 3)},
        "delta": -i if i % 2 else i,  # zigzag both signs
        "blob": bytes([i % 256, 0xFF, 0x00]),
        "ratio": float(i),
    }


def test_spec_worked_examples_decode_exactly():
    """The encoding guide's own byte vectors: `08 96 01` is field 1
    varint 150; `12 07 74 65 73 74 69 6e 67` is field 2 string
    'testing' — a decoder not matching these is not protobuf."""
    msg = bytes.fromhex("089601") + bytes.fromhex("120774657374696e67")
    framed = bytes([len(msg)]) + msg
    rows = decode_stream(framed, {1: ("a", "int64"), 2: ("b", "string")})
    assert rows == [{"a": 150, "b": "testing"}]


def test_round_trip_all_types(tmp_path):
    recs = [_rec(i) for i in range(50)]
    p = str(tmp_path / "x.pb")
    write_protobuf_shard(recs, p, SCHEMA)
    with open(p, "rb") as fh:
        back = decode_stream(fh.read(), SCHEMA)
    for orig, got in zip(recs, back):
        for k in ("doc_id", "text", "flags", "meta", "delta", "blob"):
            assert got[k] == orig[k], k
        assert got["score"] == orig["score"]
        assert got["ratio"] == pytest.approx(orig["ratio"])


def test_unknown_fields_skipped_not_fatal():
    """Decode with a NARROWER schema than the writer's: the extra
    fields (varint, len-delimited, i64, i32) skip cleanly — protobuf's
    defining forward-compat behavior."""
    full = encode_record(_rec(7), SCHEMA)
    framed = bytes([len(full)]) + full
    rows = decode_stream(framed, {1: ("doc_id", "int64"), 2: ("text", "string")})
    assert rows[0]["doc_id"] == 7 and rows[0]["text"].startswith("doc 7")


def test_packed_repeated_scalars_decode():
    # field 4, wire 2, three packed varints [3, 270, 86942] — the spec's
    # packed example values
    payload = bytes.fromhex("03" + "8e02" + "9ea705")
    msg = bytes([4 << 3 | 2, len(payload)]) + payload
    rows = decode_stream(bytes([len(msg)]) + msg, {4: ("flags", "int64", {"repeated": True})})
    assert rows[0]["flags"] == [3, 270, 86942]


@pytest.mark.parametrize(
    "raw,msg",
    [
        (bytes([2, 0x08, 0x96]), "truncated varint"),  # value cut mid-varint
        (b"\x7f" + b"\x00" * 2, "overruns the stream"),  # length > data
        (bytes([1, 9 << 3 | 3]), "group wire type"),  # deprecated group (unknown field)
        (bytes([3, 2 << 3 | 2, 1]), "overruns"),  # string len > message
    ],
)
def test_corruption_raises_named_value_error(raw, msg):
    with pytest.raises((ValueError, NotImplementedError), match=msg):
        decode_stream(raw, {1: ("a", "int64"), 2: ("b", "string")})


def test_distributed_scan_multiple_shards(spark, tmp_path):
    d = str(tmp_path)
    write_protobuf_shard([_rec(i) for i in range(40)], os.path.join(d, "a.pb"), SCHEMA)
    write_protobuf_shard([_rec(i) for i in range(40, 70)], os.path.join(d, "b.pb"), SCHEMA)
    out = read_protobuf(spark, d, SCHEMA)
    assert out.count() == 70
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[7]["meta"]["lang"] == "th" and rows[7]["flags"] == [7, 8, 0]
    assert rows[-8]["delta"] == 8 and bytes(rows[-8]["blob"]) == bytes([8, 0xFF, 0])
    # corrupt shard fails LOUDLY naming the file
    with open(os.path.join(d, "c.pb"), "wb") as fh:
        fh.write(b"\x05\x08")
    with pytest.raises(Exception, match="shard c.pb"):
        read_protobuf(spark, d, SCHEMA).collect()


def test_repeated_message_occurrences_merge_per_spec():
    """Two occurrences of a non-repeated message field MERGE (the
    concatenate-serializations idiom): first carries lang, second ok."""
    sub = {1: ("lang", "string"), 2: ("ok", "bool")}
    schema = {5: ("meta", "message", {"schema": sub})}
    occ1 = encode_record({"meta": {"lang": "en"}}, schema)
    occ2 = encode_record({"meta": {"ok": True}}, schema)
    msg = occ1 + occ2  # concatenation = merge, per the spec
    rows = decode_stream(bytes([len(msg)]) + msg, schema)
    assert rows[0]["meta"] == {"lang": "en", "ok": True}


def test_packed_run_crossing_boundary_raises():
    """A packed double run declaring 4 bytes (cutting a value) must
    raise, not consume the next field's bytes."""
    bad = bytes([4 << 3 | 2, 4]) + b"\x00" * 12
    with pytest.raises(ValueError, match="truncated"):
        decode_stream(
            bytes([len(bad)]) + bad,
            {4: ("xs", "double", {"repeated": True})},
        )


def test_encode_out_of_range_varint_refused(tmp_path):
    with pytest.raises(ValueError, match="64-bit range"):
        write_protobuf_shard(
            [{"doc_id": 1 << 64}], str(tmp_path / "x.pb"), {1: ("doc_id", "int64")}
        )
