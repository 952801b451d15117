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


# ---------------------------------------------------------------------------
# .proto schema parser
# ---------------------------------------------------------------------------

from mini_project_204721_data_engineering_spark.sources.protobuf import (  # noqa: E402
    parse_proto_schema,
)

DOC_PROTO = """
syntax = "proto3";
package corpus.v1;
option java_package = "x.y";

message Meta { string lang = 1; bool ok = 2; }

message Doc {
  int64 doc_id = 1;
  string text = 2;      // trailing comment
  double score = 3;     /* block comment */
  repeated int64 flags = 4 [packed = true];
  Meta meta = 5;
  sint64 delta = 6;
  bytes blob = 7;
  float ratio = 8;
}
"""


def test_proto_fixture_equals_hand_written_contract():
    """The done-criterion: the parsed .proto must decode the SAME wire
    bytes identically to the hand-written dict — checked structurally
    (contracts equal) AND behaviorally (same decoded rows)."""
    sch = parse_proto_schema(DOC_PROTO, "Doc")
    assert sch == SCHEMA
    recs = [_rec(i) for i in range(20)]
    for r in recs:  # same bytes out of the encoder, too
        assert encode_record(r, sch) == encode_record(r, SCHEMA)
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.pb")
        write_protobuf_shard(recs, p, SCHEMA)
        with open(p, "rb") as fh:
            data = fh.read()
    assert decode_stream(data, sch) == decode_stream(data, SCHEMA)


def test_proto_oneof_map_enum_nested_and_fq_names():
    text = """
    syntax = "proto2";
    message Outer {
      enum Kind { A = 0; B = 1; }
      message Inner { optional string s = 1; }
      required Kind kind = 1;
      optional Inner in = 2;
      oneof payload { string a = 3; int64 b = 4; }
      map<string, int64> counts = 5;
      repeated .Outer.Inner fq = 6;
    }
    """
    sch = parse_proto_schema(text)  # single top-level message: name optional
    # enum -> int64 varint; oneof members -> plain nullable fields;
    # map -> repeated {1: key, 2: value}; leading-dot name resolves
    assert sch[1] == ("kind", "int64")
    assert sch[3] == ("a", "string") and sch[4] == ("b", "int64")
    assert sch[5][2]["repeated"] and sch[5][2]["schema"] == {
        1: ("key", "string"), 2: ("value", "int64")}
    assert sch[6][2]["schema"] == {1: ("s", "string")}
    rec = {"kind": 1, "in": {"s": "x"}, "a": "hi",
           "counts": [{"key": "k", "value": 3}], "fq": [{"s": "y"}, {"s": "z"}]}
    m = encode_record(rec, sch)
    got = decode_stream(bytes([len(m)]) + m, sch)[0]
    assert got["kind"] == 1 and got["counts"] == [{"key": "k", "value": 3}]
    assert got["fq"] == [{"s": "y"}, {"s": "z"}] and got["b"] is None
    # nested selection by dotted path
    inner = parse_proto_schema(text, "Outer.Inner")
    assert inner == {1: ("s", "string")}


@pytest.mark.parametrize("bad,exc,msg", [
    ('import "a.proto";', NotImplementedError, "import"),
    ("message M { extensions 100 to 199; }", NotImplementedError, "extensions"),
    ("message M { optional group G = 1 { } }", NotImplementedError, "group"),
    ("message M { uint64 x = 1; }", NotImplementedError, "uint64"),
    ("message M { fixed32 x = 1; }", NotImplementedError, "wire type 5"),
    ("message M { sfixed64 x = 1; }", NotImplementedError, "wire type 1"),
    ("message M { M x = 1; }", ValueError, "recursive"),
    ("message A { message B { A a = 1; } B b = 1; }", ValueError, "recursive"),
    ("message M { int64 x = 1; int64 y = 1; }", ValueError, "field number"),
    ("message M { int64 x = 1; string x = 2; }", ValueError, "field name"),
    ("message M { Unknown u = 1; }", ValueError, "unresolved"),
    ("message M { map<float, int64> m = 1; }", ValueError, "map key"),
    ('syntax = "proto9"; message M { int64 x = 1; }', ValueError, "syntax"),
    ("message M { int64 x = }", ValueError, ""),
    ("message M { int64 x = 1 ", ValueError, ""),
    ("message M { int64 x = 1; } message N { int64 y = 1; }", ValueError,
     "message= is required"),
    # protoc parity: map/repeated are forbidden inside oneof, and field
    # numbers must sit in 1..2^29-1 minus the reserved 19000..19999
    ("message M { oneof o { map<string, int64> m = 1; } }", ValueError,
     "map fields are not allowed inside oneof"),
    ("message M { int64 x = 19000; }", ValueError, "reserved"),
    ("message M { int64 x = 19999; }", ValueError, "reserved"),
    ("message M { int64 x = 536870912; }", ValueError, "legal range"),
    ("message M { int64 x = 0; }", ValueError, "legal range"),
])
def test_proto_refusals_are_loud(bad, exc, msg):
    with pytest.raises(exc, match=msg):
        parse_proto_schema(bad)


def test_proto_string_literals_survive_comment_stripping():
    """'//' inside a quoted option value is content, not a comment — a
    protoc-valid go_package URL must not corrupt the parse."""
    text = """
    syntax = "proto3";
    option go_package = "example.com//gen;genpb";
    message M { int64 x = 1; /* block */ string u = 2; // line
    }
    """
    assert parse_proto_schema(text, "M") == {1: ("x", "int64"), 2: ("u", "string")}


def test_proto_aggregate_option_values_skipped():
    """Aggregate option syntax ('{ foo: 1 }', protoc-gen-validate-style
    field options) contains ':' — the skip paths must accept any token."""
    text = """
    syntax = "proto3";
    option (my_opt) = { foo: 1 bar: "x//y" };
    message M {
      int64 x = 1 [(validate.rules).int64 = {gt: 0, lt: 100}];
    }
    """
    assert parse_proto_schema(text, "M") == {1: ("x", "int64")}


def test_proto_repeated_map_refused():
    with pytest.raises(ValueError, match="not allowed on map fields"):
        parse_proto_schema("message M { repeated map<string, int64> m = 1; }")


def test_proto_no_backtracking_past_first_component():
    """protoc's rule: once the first path component binds in a scope,
    resolution is final — 'A.B' where the inner A shadows an outer A
    that has B must REFUSE (protoc rejects this file), not silently
    bind the outer type."""
    text = """
    message A { message B { int64 x = 1; } }
    message Outer {
      message A { int64 y = 1; }
      message Host { A.B f = 1; }
    }
    """
    with pytest.raises(ValueError, match="does not backtrack"):
        parse_proto_schema(text, "Outer.Host")
    # the unshadowed form resolves fine from the same depth
    ok = """
    message A { message B { int64 x = 1; } }
    message Outer { message Host { A.B f = 1; } }
    """
    sch = parse_proto_schema(ok, "Outer.Host")
    assert sch == {1: ("f", "message", {"schema": {1: ("x", "int64")}})}


def test_proto_block_comment_marker_inside_string_is_content():
    text = 'syntax = "proto3"; option go_package = "x/*y"; ' \
           "message M { int64 a = 1; }"
    assert parse_proto_schema(text, "M") == {1: ("a", "int64")}
    # a REAL unterminated comment still refuses
    with pytest.raises(ValueError, match="unterminated"):
        parse_proto_schema("message M { int64 a = 1; } /* oops")


def test_proto_referenced_message_resolves_in_its_own_scope():
    """Type names INSIDE a cross-scope referenced message bind where
    that message LIVES (protoc): B's field 'C' means A.C even when the
    referencing site has its own shadowing C."""
    text = """
    message A {
      message C { int64 x = 1; }
      message B { C f = 1; }
    }
    message Outer {
      message C { string y = 2; }
      message Host { A.B g = 1; }
    }
    """
    sch = parse_proto_schema(text, "Outer.Host")
    assert sch == {
        1: ("g", "message",
            {"schema": {1: ("f", "message",
                            {"schema": {1: ("x", "int64")}})}})
    }
    # and without the shadowing Outer.C the same file must ALSO resolve
    # (the referencing scope must not be required to see A's nested C)
    unshadowed = text.replace("message C { string y = 2; }", "")
    assert parse_proto_schema(unshadowed, "Outer.Host") == sch


def test_proto_fuzz_never_wrong_exception():
    """Random single-edit mutations of a valid .proto either still parse
    or raise ValueError/NotImplementedError — never an unhandled
    IndexError/KeyError/AttributeError."""
    import random

    rng = random.Random(204721)
    base = DOC_PROTO
    for _ in range(300):
        s = list(base)
        op = rng.randrange(3)
        i = rng.randrange(len(s))
        if op == 0:
            del s[i]
        elif op == 1:
            s.insert(i, rng.choice("{}=;<>,[]()\"'abz019 ."))
        else:
            s[i] = rng.choice("{}=;<>,[]()\"'abz019 .")
        try:
            parse_proto_schema("".join(s), "Doc")
        except (ValueError, NotImplementedError):
            pass


def test_distributed_scan_from_parsed_proto(spark, tmp_path):
    """The done-criterion's last leg: the Spark scan runs off a schema
    parsed from .proto text, not a hand dict."""
    d = str(tmp_path)
    sch = parse_proto_schema(DOC_PROTO, "Doc")
    write_protobuf_shard([_rec(i) for i in range(30)], os.path.join(d, "a.pb"), sch)
    out = read_protobuf(spark, d, sch)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 30
    assert rows[7]["meta"]["lang"] == "th" and rows[7]["flags"] == [7, 8, 0]
