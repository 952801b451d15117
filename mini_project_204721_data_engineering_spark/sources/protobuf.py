"""Clean-room Protocol Buffers wire-format source/sink — varint-delimited
record streams ("length-prefixed" / ``writeDelimitedTo`` framing), the
shape protobuf event logs land in object storage.

Written from the PUBLIC encoding spec (protobuf.dev/programming-guides/
encoding): varints, ZigZag, the four live wire types (0 varint,
1 i64, 2 len, 5 i32), packed repeated scalars, nested messages, and
the format's defining behavior — UNKNOWN fields are skipped by wire
type, not errors.  No google.protobuf dependency anywhere (that
package is absent in this environment, which is exactly when a
dependency-free decoder earns its keep).

The caller declares the schema as ``{field_number: (name, type)}`` or
``(name, type, opts)`` with type in {int64, sint64, bool, double,
float, string, bytes, message} and opts ``{"repeated": True}`` /
``{"schema": {...}}`` for nested messages — the same
declare-your-contract discipline as the JSONL and Avro readers.
Groups (wire types 3/4, deprecated since proto2) refuse loudly.

Distributed shape: ``binaryFile`` lists the shard directory, each task
decodes ONE shard in bounded row chunks via ``mapInPandas`` — shard
bytes never visit the driver (the Avro/NetCDF posture).
"""

from __future__ import annotations

import io
import struct
from typing import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "read_protobuf", "write_protobuf_shard",
    "decode_stream", "iter_stream", "encode_record",
]

_SCALARS = {
    "int64": "long", "sint64": "long", "bool": "boolean",
    "double": "double", "float": "float",
    "string": "string", "bytes": "binary",
}


def _norm_schema(schema: Mapping[int, tuple]) -> dict[int, dict]:
    out = {}
    for num, spec in schema.items():
        if not isinstance(num, int) or num < 1:
            raise ValueError(f"field number must be a positive int, got {num!r}")
        name, typ = spec[0], spec[1]
        opts = dict(spec[2]) if len(spec) > 2 else {}
        if typ == "message":
            if "schema" not in opts:
                raise ValueError(f"field {name}: message type needs opts['schema']")
            opts["schema"] = _norm_schema(opts["schema"])
        elif typ not in _SCALARS:
            raise ValueError(
                f"field {name}: unsupported type {typ!r} "
                f"(supported: {sorted(_SCALARS)} + message)"
            )
        out[num] = {"name": name, "type": typ, "repeated": bool(opts.get("repeated")),
                    "schema": opts.get("schema")}
    names = [f["name"] for f in out.values()]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate field names in schema: {names}")
    return out


def _spark_ddl(schema: dict[int, dict]) -> str:
    parts = []
    for num in sorted(schema):
        f = schema[num]
        if f["type"] == "message":
            inner = _spark_ddl(f["schema"])
            t = f"struct<{inner}>"
        else:
            t = _SCALARS[f["type"]]
        if f["repeated"]:
            t = f"array<{t}>"
        parts.append(f"{f['name']}:{t}")
    return ",".join(parts)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    for shift in range(0, 70, 7):
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            if shift == 63 and b > 1:
                raise ValueError("varint exceeds 64 bits")
            return result, pos
    raise ValueError("varint exceeds 10 bytes")


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _decode_value(typ: str, wire: int, buf: bytes, pos: int, sub) -> tuple[object, int]:
    if typ in ("int64", "sint64", "bool"):
        if wire != 0:
            raise ValueError(f"wire type {wire} for varint field")
        raw, pos = _read_varint(buf, pos)
        if typ == "bool":
            return bool(raw), pos
        return (_zigzag(raw) if typ == "sint64" else _signed64(raw)), pos
    if typ == "double":
        if wire != 1:
            raise ValueError(f"wire type {wire} for double field")
        if pos + 8 > len(buf):
            raise ValueError("truncated i64 value")
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ == "float":
        if wire != 5:
            raise ValueError(f"wire type {wire} for float field")
        if pos + 4 > len(buf):
            raise ValueError("truncated i32 value")
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    # len-delimited: string / bytes / message
    if wire != 2:
        raise ValueError(f"wire type {wire} for length-delimited field")
    ln, pos = _read_varint(buf, pos)
    if pos + ln > len(buf):
        raise ValueError("length-delimited value overruns the message")
    chunk = buf[pos:pos + ln]
    pos += ln
    if typ == "string":
        try:
            return chunk.decode("utf-8"), pos
        except UnicodeDecodeError as e:
            raise ValueError(f"invalid UTF-8 in string field: {e}") from e
    if typ == "bytes":
        return bytes(chunk), pos
    return _decode_message(chunk, sub), pos  # nested message


def _skip_unknown(wire: int, buf: bytes, pos: int) -> int:
    if wire == 0:
        _, pos = _read_varint(buf, pos)
        return pos
    if wire == 1:
        if pos + 8 > len(buf):
            raise ValueError("truncated unknown i64 field")
        return pos + 8
    if wire == 5:
        if pos + 4 > len(buf):
            raise ValueError("truncated unknown i32 field")
        return pos + 4
    if wire == 2:
        ln, pos = _read_varint(buf, pos)
        if pos + ln > len(buf):
            raise ValueError("unknown length-delimited field overruns")
        return pos + ln
    raise NotImplementedError(
        f"protobuf group wire type {wire} (deprecated proto2 groups) is not "
        "supported — re-serialize without groups"
    )


def _merge_message(old: dict, new: dict, schema: dict[int, dict]) -> dict:
    """Spec semantics for a non-repeated MESSAGE field seen twice: the
    occurrences MERGE — later scalars overwrite, nested messages merge
    recursively, repeated fields concatenate (the
    concatenate-two-serializations idiom depends on this)."""
    out = dict(old)
    by_name = {f["name"]: f for f in schema.values()}
    for k, v in new.items():
        f = by_name[k]
        if f["repeated"]:
            out[k] = (old.get(k) or []) + (v or [])
        elif f["type"] == "message" and isinstance(old.get(k), dict) and isinstance(v, dict):
            out[k] = _merge_message(old[k], v, f["schema"])
        elif v is not None:
            out[k] = v
    return out


def _decode_message(buf: bytes, schema: dict[int, dict]) -> dict:
    row = {
        f["name"]: ([] if f["repeated"] else None) for f in schema.values()
    }
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        num, wire = tag >> 3, tag & 7
        f = schema.get(num)
        if f is None:
            pos = _skip_unknown(wire, buf, pos)
            continue
        typ = f["type"]
        if f["repeated"] and wire == 2 and typ in ("int64", "sint64", "bool", "double", "float"):
            # packed repeated scalars: one len-delimited run of values —
            # decoded against the RUN's slice so a value crossing the
            # declared end raises instead of eating the next field
            ln, pos = _read_varint(buf, pos)
            if pos + ln > len(buf):
                raise ValueError("packed field overruns the message")
            run = buf[pos:pos + ln]
            pos += ln
            inner_wire = 1 if typ == "double" else (5 if typ == "float" else 0)
            rpos = 0
            while rpos < len(run):
                v, rpos = _decode_value(typ, inner_wire, run, rpos, f["schema"])
                row[f["name"]].append(v)
            continue
        v, pos = _decode_value(typ, wire, buf, pos, f["schema"])
        if f["repeated"]:
            row[f["name"]].append(v)
        elif typ == "message" and isinstance(row[f["name"]], dict):
            row[f["name"]] = _merge_message(row[f["name"]], v, f["schema"])
        else:
            row[f["name"]] = v  # proto3 scalars: last occurrence wins
    return row


def iter_stream(data: bytes, schema: Mapping[int, tuple]):
    """Generator over a varint-delimited record stream — ONE decoded dict
    in flight at a time, so consumers (the distributed reader's chunk
    loop) hold chunk-sized Python state, not the whole shard's.  Corrupt
    framing raises ValueError naming the byte offset."""
    sch = _norm_schema(schema)
    pos = 0
    while pos < len(data):
        start = pos
        try:
            ln, pos = _read_varint(data, pos)
            if pos + ln > len(data):
                raise ValueError("record overruns the stream")
            rec = _decode_message(data[pos:pos + ln], sch)
            pos += ln
        except ValueError as e:
            raise ValueError(f"corrupt protobuf record at byte {start}: {e}") from e
        yield rec


def decode_stream(data: bytes, schema: Mapping[int, tuple]) -> list[dict]:
    """Eager form of :func:`iter_stream` (driver-side / test primitive)."""
    return list(iter_stream(data, schema))


# ---------------------------------------------------------------------------
# encode (tests + shard emission)
# ---------------------------------------------------------------------------

def _write_varint(out: io.BytesIO, v: int) -> None:
    if not -(1 << 63) <= v < (1 << 64):
        # an out-of-range python int would emit a >10-byte varint the
        # decoder (rightly) rejects — refuse at WRITE time instead of
        # producing an unreadable shard
        raise ValueError(f"varint value {v} outside the 64-bit range")
    if v < 0:
        v += 1 << 64  # two's complement on 64 bits (int64 negatives)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _encode_message(rec: Mapping, schema: dict[int, dict]) -> bytes:
    out = io.BytesIO()
    for num in sorted(schema):
        f = schema[num]
        v = rec.get(f["name"])
        if v is None:
            continue
        vals = v if f["repeated"] else [v]
        for item in vals:
            typ = f["type"]
            if typ in ("int64", "sint64", "bool"):
                _write_varint(out, num << 3 | 0)
                if typ == "bool":
                    _write_varint(out, 1 if item else 0)
                elif typ == "sint64":
                    _write_varint(out, (item << 1) ^ (item >> 63))
                else:
                    _write_varint(out, item)
            elif typ == "double":
                _write_varint(out, num << 3 | 1)
                out.write(struct.pack("<d", item))
            elif typ == "float":
                _write_varint(out, num << 3 | 5)
                out.write(struct.pack("<f", item))
            else:
                payload = (
                    item.encode("utf-8") if typ == "string"
                    else bytes(item) if typ == "bytes"
                    else _encode_message(item, f["schema"])
                )
                _write_varint(out, num << 3 | 2)
                _write_varint(out, len(payload))
                out.write(payload)
    return out.getvalue()


def encode_record(rec: Mapping, schema: Mapping[int, tuple]) -> bytes:
    return _encode_message(rec, _norm_schema(schema))


def write_protobuf_shard(records: Sequence[Mapping], path: str,
                         schema: Mapping[int, tuple]) -> None:
    """One varint-delimited shard — the round-trip half."""
    sch = _norm_schema(schema)
    with open(path, "wb") as fh:
        buf = io.BytesIO()
        for rec in records:
            msg = _encode_message(rec, sch)
            _write_varint(buf, len(msg))
            buf.write(msg)
        fh.write(buf.getvalue())


# ---------------------------------------------------------------------------
# distributed read
# ---------------------------------------------------------------------------

def read_protobuf(
    spark: SparkSession,
    dir_path: str,
    schema: Mapping[int, tuple],
    pattern: str = "*.pb",
    chunk_rows: int = 20_000,
) -> DataFrame:
    """Distributed varint-delimited protobuf scan → DataFrame with the
    declared schema.  One shard per task; rows surface in
    ``chunk_rows`` pandas batches so task memory stays bounded by chunk
    size + shard bytes."""
    import pandas as pd

    sch = _norm_schema(schema)
    # top level is "name type, ..."; nested structs keep the colon form
    top = []
    for num in sorted(sch):
        f = sch[num]
        t = (
            f"struct<{_spark_ddl(f['schema'])}>" if f["type"] == "message"
            else _SCALARS[f["type"]]
        )
        if f["repeated"]:
            t = f"array<{t}>"
        top.append(f"{f['name']} {t}")
    ddl = ", ".join(top)
    names = [sch[num]["name"] for num in sorted(sch)]

    def worker(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                shard = row["path"].rsplit("/", 1)[-1]
                chunk: list[dict] = []
                try:
                    # generator decode: at most chunk_rows decoded dicts
                    # in flight on top of the raw shard bytes
                    for rec in iter_stream(bytes(row["content"]), schema):
                        chunk.append(rec)
                        if len(chunk) >= chunk_rows:
                            yield pd.DataFrame(
                                {n: [r[n] for r in chunk] for n in names}
                            )
                            chunk = []
                except ValueError as e:
                    raise ValueError(f"shard {shard}: {e}") from e
                if chunk:
                    yield pd.DataFrame({n: [r[n] for r in chunk] for n in names})

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(dir_path)
        .select("path", "content")
        .mapInPandas(worker, ddl)
    )
