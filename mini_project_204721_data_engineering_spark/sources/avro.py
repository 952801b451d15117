"""Avro Object Container File source & sink — the Kafka-ecosystem
landing format (Debezium CDC dumps, Confluent sink archives), which
this Spark distribution does not load (the avro module is external and
absent from the classpath — ``Failed to find data source: avro``).

Clean-room byte reader of the PUBLIC Avro 1.11 specification
(avro.apache.org/docs/ — "Object Container Files" + "Binary
Encoding"), same strategy as the netcdf/xls/warc readers: magic
``Obj\\x01``, a file-metadata map carrying the writer schema JSON and
codec, a 16-byte sync marker, then sync-delimited blocks of
zigzag-varint-encoded records.  Codecs: ``null``, ``deflate`` (raw
DEFLATE, no zlib wrapper), and ``snappy`` (raw snappy block + 4-byte
big-endian CRC32 of the uncompressed data, per the spec; decompressed
via pyarrow's bundled codec — the Kafka-ecosystem default).  Schema:
records (NESTED records too, including named-type references — the
Debezium CDC envelope is a record whose ``before``/``after`` fields
are ``["null", RowRecord]`` with the second occurrence a name ref),
``map`` types (string keys per the spec → ``map<string,T>``),
nullable unions ``["null", T]``, enum, fixed, bytes, arrays, and the
common logical types (date, timestamp-millis/micros, and decimal over
bytes/fixed — the Debezium NUMERIC encoding: two's-complement
big-endian unscaled int → Spark ``decimal(p,s)``) — anything else
(multi-branch unions, recursive types) refuses loudly with the field
path.

Scale shape: ``binaryFile`` + ``mapInPandas``, one container per task,
bytes never on the driver; the schema is read driver-side from the
FIRST file's header only (one bounded read).  Record decode is a
per-row Python loop by necessity (Avro's variable-length encoding has
no vectorizable layout) — the honest cost of the format, parallel
across files/tasks like every binary reader here; re-land as parquet
for repeated scans.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_avro", "parse_avro", "write_avro", "avro_schema"]

_MAGIC = b"Obj\x01"


class _R:
    __slots__ = ("b", "p")

    def __init__(self, b: bytes, p: int = 0):
        self.b = b
        self.p = p

    def long(self) -> int:
        n = shift = 0
        while True:
            byte = self.b[self.p]
            self.p += 1
            n |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (n >> 1) ^ -(n & 1)

    def raw(self, n: int) -> bytes:
        out = self.b[self.p : self.p + n]
        if len(out) != n:
            raise ValueError("truncated Avro data")
        self.p += n
        return out

    def bytes_(self) -> bytes:
        return self.raw(self.long())


def _meta_map(r: _R) -> dict[str, bytes]:
    out: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:  # block with byte size prefix
            n = -n
            r.long()
        for _ in range(n):
            k = r.bytes_().decode("utf-8")
            out[k] = r.bytes_()
    return out


_PRIMITIVES = frozenset(
    ("null", "boolean", "int", "long", "float", "double", "bytes", "string")
)


def _resolve_named(sch, names: dict, path: str, open_names: set):
    """A bare string that is not a primitive is a reference to a
    previously DEFINED named type (record/enum/fixed) — the Avro
    named-type mechanism Debezium uses for its ``before``/``after``
    envelope fields (first occurrence defines ``Value``, the second
    just says ``"Value"``).  A reference to a type STILL BEING defined
    (``record Node { next: ["null","Node"] }``) is a recursive schema —
    unrepresentable as a fixed-depth Spark struct, so it refuses loudly
    with the field path instead of recursing forever."""
    if isinstance(sch, str) and sch not in _PRIMITIVES:
        if sch in open_names:
            raise NotImplementedError(
                f"Avro recursive named-type reference {sch!r} at {path} "
                "(the type is still being defined) — recursive schemas "
                "have no fixed-depth Spark struct equivalent"
            )
        try:
            return names[sch]
        except KeyError:
            raise NotImplementedError(
                f"Avro named-type reference {sch!r} at {path} has no "
                "preceding definition (forward references "
                "are not supported)"
            ) from None
    return sch


def _register_named(sch: dict, names: dict) -> None:
    """Record a record/enum/fixed definition under its short AND full
    (namespace-qualified) name, the two forms a reference may use."""
    name = sch.get("name")
    if not name:
        return
    names[name] = sch
    ns = sch.get("namespace")
    if ns:
        names[f"{ns}.{name}"] = sch


def _field_decoder(sch, path: str, names: dict | None = None,
                   open_names: set | None = None):
    """schema node → (python decode fn, spark type ddl).

    ``open_names`` tracks named types whose definition is in progress
    down the current walk, so a self/mutually-recursive reference is
    caught as a loud :class:`NotImplementedError` (with the field path)
    instead of a ``RecursionError`` outside the documented contract."""
    if names is None:
        names = {}
    if open_names is None:
        open_names = set()
    sch = _resolve_named(sch, names, path, open_names)
    if isinstance(sch, str):
        sch = {"type": sch}
    if isinstance(sch, list):  # union: only ["null", T] (either order)
        branches = [s for s in sch if s != "null"]
        if len(sch) != 2 or len(branches) != 1:
            raise NotImplementedError(
                f"Avro union beyond ['null', T] at {path}: {sch}"
            )
        null_idx = sch.index("null")
        inner, ddl = _field_decoder(branches[0], path, names, open_names)

        def dec_union(r: _R):
            return None if r.long() == null_idx else inner(r)

        return dec_union, ddl
    t = sch["type"]
    logical0 = sch.get("logicalType")
    if logical0 == "decimal" and t in ("bytes", "fixed"):
        # two's-complement big-endian unscaled int (the Debezium NUMERIC
        # encoding) → Spark decimal(p, s)
        import decimal as _dec

        prec, scale = sch.get("precision"), sch.get("scale", 0)
        if prec is None:
            raise NotImplementedError(
                f"Avro decimal at {path} lacks 'precision'"
            )
        if t == "fixed":
            _register_named(sch, names)
            size = sch["size"]

            def dec_decimal_fixed(r: _R, _s=scale, _n=size):
                raw = r.raw(_n)
                return _dec.Decimal(
                    int.from_bytes(raw, "big", signed=True)
                ).scaleb(-_s)

            return dec_decimal_fixed, f"decimal({prec},{scale})"

        def dec_decimal(r: _R, _s=scale):
            raw = r.bytes_()
            if not raw:
                raise ValueError(f"empty Avro decimal at {path}")
            return _dec.Decimal(
                int.from_bytes(raw, "big", signed=True)
            ).scaleb(-_s)

        return dec_decimal, f"decimal({prec},{scale})"
    if t == "record":  # nested record → Spark struct
        _register_named(sch, names)
        # both names a reference may use are OPEN until the fields are
        # fully walked — a field referring back to either is recursion
        opened = {sch["name"]} if sch.get("name") else set()
        if sch.get("namespace") and sch.get("name"):
            opened.add(f"{sch['namespace']}.{sch['name']}")
        open_names |= opened
        sub_decs, sub_names, sub_ddls = [], [], []
        for f in sch["fields"]:
            d, ddl = _field_decoder(
                f["type"], f"{path}.{f['name']}", names, open_names
            )
            sub_decs.append(d)
            sub_names.append(f["name"])
            sub_ddls.append(f"{f['name']}:{ddl}")
        open_names -= opened

        def dec_rec(r: _R):
            return {n: d(r) for n, d in zip(sub_names, sub_decs)}

        return dec_rec, f"struct<{','.join(sub_ddls)}>"
    if t == "map":  # string-keyed per the spec → map<string,T>
        inner, ddl = _field_decoder(sch["values"], path + "{}", names,
                                    open_names)

        def dec_map(r: _R):
            out = {}
            while True:
                n = r.long()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    r.long()  # byte size, unused
                for _ in range(n):
                    k = r.bytes_().decode("utf-8")
                    out[k] = inner(r)

        return dec_map, f"map<string,{ddl}>"
    logical = sch.get("logicalType")
    if t == "long" and logical in ("timestamp-micros", "timestamp-millis"):
        mult = 1 if logical == "timestamp-micros" else 1000
        import datetime as _dt

        def dec_ts(r: _R):
            us = r.long() * mult
            return _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=us)

        return dec_ts, "timestamp_ntz"
    if t == "int" and logical == "date":
        import datetime as _dt

        return (
            lambda r: _dt.date(1970, 1, 1) + _dt.timedelta(days=r.long()),
            "date",
        )
    if t in ("long", "int"):
        return (lambda r: r.long()), ("long" if t == "long" else "int")
    if t == "double":
        return (lambda r: struct.unpack("<d", r.raw(8))[0]), "double"
    if t == "float":
        return (lambda r: struct.unpack("<f", r.raw(4))[0]), "float"
    if t == "boolean":
        return (lambda r: r.raw(1) != b"\x00"), "boolean"
    if t == "string":
        return (lambda r: r.bytes_().decode("utf-8")), "string"
    if t == "bytes":
        return (lambda r: r.bytes_()), "binary"
    if t == "null":
        return (lambda r: None), "string"
    if t == "enum":
        _register_named(sch, names)
        symbols = sch["symbols"]
        return (lambda r: symbols[r.long()]), "string"
    if t == "fixed":
        _register_named(sch, names)
        size = sch["size"]
        return (lambda r: r.raw(size)), "binary"
    if t == "array":
        inner, ddl = _field_decoder(sch["items"], path + "[]", names,
                                    open_names)

        def dec_arr(r: _R):
            out = []
            while True:
                n = r.long()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    r.long()  # byte size, unused
                for _ in range(n):
                    out.append(inner(r))

        return dec_arr, f"array<{ddl}>"
    raise NotImplementedError(f"Avro type {t!r} at {path} not supported")


def _record_decoder(schema: dict):
    if schema.get("type") != "record":
        raise NotImplementedError("top-level Avro schema must be a record")
    registry: dict = {}
    _register_named(schema, registry)
    # the top-level record's own names stay OPEN for the whole walk — a
    # field referring back to the root is recursion, caught immediately
    root_open = {schema["name"]} if schema.get("name") else set()
    if schema.get("namespace") and schema.get("name"):
        root_open.add(f"{schema['namespace']}.{schema['name']}")
    decs, names, ddls = [], [], []
    for f in schema["fields"]:
        d, ddl = _field_decoder(f["type"], f["name"], registry,
                                set(root_open))
        decs.append(d)
        names.append(f["name"])
        ddls.append(f"`{f['name']}` {ddl}")
    return decs, names, ", ".join(ddls)


def _snappy_decompress(data: bytes) -> bytes:
    """Raw snappy block (NOT the framed format): the stream's own
    leading plain varint is the uncompressed length — parse it so
    pyarrow's bundled codec (which demands ``decompressed_size``) can
    allocate.  The 4-byte big-endian CRC32 of the UNCOMPRESSED bytes
    that the Avro spec appends after the block is verified by the
    caller."""
    import pyarrow as pa

    n = shift = i = 0
    while True:
        if i >= len(data):
            raise ValueError("truncated snappy length header")
        byte = data[i]
        i += 1
        n |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return bytes(pa.Codec("snappy").decompress(data, n))


def parse_avro(content: bytes) -> tuple[dict, list[tuple]]:
    """One container's (writer schema, decoded rows) — corrupt input
    raises ValueError (the binary readers' shared contract)."""
    try:
        r = _R(content)
        if r.raw(4) != _MAGIC:
            raise ValueError("not an Avro object container (bad magic)")
        meta = _meta_map(r)
        schema = json.loads(meta["avro.schema"].decode("utf-8"))
        codec = meta.get("avro.codec", b"null").decode("ascii")
        if codec not in ("null", "deflate", "snappy"):
            raise NotImplementedError(f"Avro codec {codec!r} not supported")
        sync = r.raw(16)
        decs, names, _ = _record_decoder(schema)
        rows: list[tuple] = []
        while r.p < len(r.b):
            count = r.long()
            size = r.long()
            block = r.raw(size)
            if codec == "deflate":
                block = zlib.decompress(block, -15)
            elif codec == "snappy":
                if len(block) < 4:
                    raise ValueError("snappy block too short for its CRC")
                block, crc = _snappy_decompress(block[:-4]), block[-4:]
                if struct.pack(">I", zlib.crc32(block) & 0xFFFFFFFF) != crc:
                    raise ValueError("snappy block CRC32 mismatch")
            br = _R(block)
            for _ in range(count):
                rows.append(tuple(d(br) for d in decs))
            if r.raw(16) != sync:
                raise ValueError("Avro sync marker mismatch")
        return schema, rows
    except (IndexError, struct.error, KeyError, zlib.error, UnicodeDecodeError,
            json.JSONDecodeError, OverflowError, MemoryError, OSError) as e:
        # OverflowError: a corrupt varint decoding to an astronomical
        # date/timestamp offset (hypothesis-found); MemoryError: a
        # corrupt length prefix; OSError: pyarrow's snappy codec raises
        # ArrowIOError (an OSError) on corrupt compressed bytes
        # (hypothesis-found) — its ArrowInvalid is already a ValueError
        raise ValueError(f"corrupt or truncated Avro container: {e!r}") from e


def avro_schema(path: str, spark: SparkSession | None = None) -> dict:
    """Writer schema of one container — header-only bounded read (64 KiB
    covers any sane metadata block; grows if the header is larger)."""
    from mini_project_204721_data_engineering_spark.sources.arrow_ipc import _head_bytes

    n = 1 << 16
    while True:
        head = _head_bytes(path, n, spark)
        try:
            r = _R(head)
            if r.raw(4) != _MAGIC:
                raise ValueError("not an Avro object container (bad magic)")
            return json.loads(_meta_map(r)["avro.schema"].decode("utf-8"))
        except (IndexError, KeyError) as e:
            if len(head) < n:  # whole file read and still broken
                raise ValueError(f"corrupt Avro header: {e!r}") from e
            n *= 4


def read_avro(
    spark: SparkSession, dir_path: str, pattern: str = "*.avro"
) -> DataFrame:
    """Distributed Avro directory scan → DataFrame (schema from the
    first file's header; every container decoded executor-side)."""
    import pandas as pd

    from mini_project_204721_data_engineering_spark.sources.arrow_ipc import (
        _fs_glob_first,
    )

    first = _fs_glob_first(spark, dir_path, pattern)
    if first is None:
        raise ValueError(f"no files match {pattern!r} under {dir_path}")
    schema = avro_schema(first, spark)
    decs, names, ddl = _record_decoder(schema)

    def worker(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                _, rows = parse_avro(bytes(row["content"]))
                yield pd.DataFrame(rows, columns=names)

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(dir_path)
        .select("content")
        .mapInPandas(worker, ddl)
    )


def _zig(n: int) -> bytes:
    n = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _collect_names(sch, names: dict) -> None:
    """Pre-walk a schema in definition order, registering every named
    type — the writer can't rely on lazy registration during encoding
    because a ``["null", Record]`` union whose value is null never
    recurses into the branch that defines the record."""
    if isinstance(sch, str):
        return
    if isinstance(sch, list):
        for s in sch:
            _collect_names(s, names)
        return
    t = sch.get("type")
    if t in ("record", "enum", "fixed"):
        _register_named(sch, names)
    if t == "record":
        for f in sch["fields"]:
            _collect_names(f["type"], names)
    elif t == "array":
        _collect_names(sch["items"], names)
    elif t == "map":
        _collect_names(sch["values"], names)


def _encode_value(v, sch, out: bytearray, names: dict | None = None) -> None:
    if names is None:
        names = {}
    # the writer resolves per-VALUE, so recursion terminates with the
    # data itself — no open-name tracking needed here
    sch = _resolve_named(sch, names, "<write>", set())
    if isinstance(sch, str):
        sch = {"type": sch}
    if isinstance(sch, list):
        branches = [s for s in sch if s != "null"]
        if len(sch) != 2 or len(branches) != 1:
            raise NotImplementedError(
                f"Avro writer union beyond ['null', T]: {sch}"
            )
        null_idx = sch.index("null")
        if v is None:
            out += _zig(null_idx)
            return
        out += _zig(1 - null_idx)
        _encode_value(v, branches[0], out, names)
        return
    t = sch["type"]
    if t == "record":
        _register_named(sch, names)
        for f in sch["fields"]:
            _encode_value(v.get(f["name"]), f["type"], out, names)
        return
    if t == "map":
        if v:
            out += _zig(len(v))
            for k, item in v.items():
                kb = str(k).encode("utf-8")
                out += _zig(len(kb)) + kb
                _encode_value(item, sch["values"], out, names)
        out += _zig(0)
        return
    logical = sch.get("logicalType")
    if logical == "decimal" and t in ("bytes", "fixed"):
        import decimal as _dec

        unscaled = int(_dec.Decimal(v).scaleb(sch.get("scale", 0)))
        if t == "fixed":
            _register_named(sch, names)
            out += unscaled.to_bytes(sch["size"], "big", signed=True)
        else:
            b = unscaled.to_bytes(
                (unscaled.bit_length() + 8) // 8, "big", signed=True
            )
            out += _zig(len(b)) + b
    elif t == "long" and logical in ("timestamp-micros", "timestamp-millis"):
        import datetime as _dt

        us = int((v - _dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000)
        out += _zig(us if logical == "timestamp-micros" else us // 1000)
    elif t == "int" and logical == "date":
        import datetime as _dt

        out += _zig((v - _dt.date(1970, 1, 1)).days)
    elif t in ("long", "int"):
        out += _zig(int(v))
    elif t == "double":
        out += struct.pack("<d", float(v))
    elif t == "float":
        out += struct.pack("<f", float(v))
    elif t == "boolean":
        out += b"\x01" if v else b"\x00"
    elif t == "string":
        b = str(v).encode("utf-8")
        out += _zig(len(b)) + b
    elif t in ("bytes", "fixed"):
        if t == "fixed":
            _register_named(sch, names)
        b = bytes(v)
        out += (_zig(len(b)) + b) if t == "bytes" else b
    elif t == "enum":
        _register_named(sch, names)
        out += _zig(sch["symbols"].index(v))
    elif t == "array":
        if v:
            out += _zig(len(v))
            for item in v:
                _encode_value(item, sch["items"], out, names)
        out += _zig(0)
    else:
        raise NotImplementedError(f"Avro writer type {t!r}")


def write_avro(
    path: str,
    schema: dict,
    rows: list[dict],
    codec: str = "null",
    block_rows: int = 1000,
    sync: bytes = b"0123456789abcdef",
) -> None:
    """Fixture writer: one container with the given writer schema —
    the round-trip half for tests and fuzzing (codecs
    null/deflate/snappy)."""
    out = bytearray(_MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec.encode()}
    out += _zig(len(meta))
    for k, v in meta.items():
        kb = k.encode()
        out += _zig(len(kb)) + kb + _zig(len(v)) + v
    out += _zig(0)
    out += sync
    registry: dict = {}
    _collect_names(schema, registry)
    for i in range(0, max(len(rows), 1), block_rows):
        chunk = rows[i : i + block_rows]
        if not chunk:
            break
        body = bytearray()
        for row in chunk:
            for f in schema["fields"]:
                _encode_value(row.get(f["name"]), f["type"], body, registry)
        payload = bytes(body)
        if codec == "deflate":
            c = zlib.compressobj(9, zlib.DEFLATED, -15)
            payload = c.compress(payload) + c.flush()
        elif codec == "snappy":
            import pyarrow as pa

            crc = struct.pack(">I", zlib.crc32(payload) & 0xFFFFFFFF)
            payload = bytes(pa.Codec("snappy").compress(payload)) + crc
        out += _zig(len(chunk)) + _zig(len(payload)) + payload + sync
    with open(path, "wb") as fh:
        fh.write(bytes(out))
