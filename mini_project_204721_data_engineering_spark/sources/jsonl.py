"""Compressed JSONL ingest — ``.jsonl.zst`` / ``.jsonl.gz`` /
``.jsonl.lz4`` shard directories, the wire format web-scale text
corpora actually ship in (Common-Crawl derivatives, RedPajama, etc.).

Spark's native JSON reader handles gzip but NOT zstd/lz4 text files in
this environment; pyarrow (already on every executor — it powers
``mapInPandas``) bundles all three codecs, so the distributed shape is
the same as the NetCDF/Arrow readers: ``binaryFile`` lists the shard
directory, each task streams ONE shard through
``pyarrow.input_stream(compression=...)`` and parses line-delimited
JSON in bounded chunks — shard bytes never visit the driver.

The caller declares the schema (the corpus contract); fields absent
from a record are null, extra fields are dropped — JSONL's usual
loose-schema discipline, applied explicitly.  Absence is handled
per-VALUE, not per-column: a shard where only some lines miss a
numeric field parses as a pandas float column with NaN, so every
column is coerced to the declared type with NULLABLE dtypes (Int64 &c.)
before Arrow conversion — missing values become SQL nulls instead of
failing the task on a float→long cast.
"""

from __future__ import annotations

import io

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_jsonl", "write_jsonl_shard"]

_EXT_CODECS = {".zst": "zstd", ".zstd": "zstd", ".gz": "gzip", ".lz4": "lz4"}


def _codec_for(path: str) -> str | None:
    low = path.lower()
    for ext, codec in _EXT_CODECS.items():
        if low.endswith(ext):
            return codec
    return None


def read_jsonl(
    spark: SparkSession,
    dir_path: str,
    schema: str,
    pattern: str = "*.jsonl*",
    chunk_rows: int = 50_000,
    on_error: str = "fail",
) -> DataFrame:
    """Distributed compressed-JSONL scan → DataFrame with the declared
    ``schema`` (a DDL string, e.g. ``"doc_id long, text string"``).
    Compression is per-file by extension (mixed directories are fine);
    parsing streams ``chunk_rows``-line pandas chunks per shard so task
    memory stays bounded regardless of shard size.

    ``on_error``: ``"fail"`` (default) — a malformed line fails the
    task loudly, the right posture for curated inputs.
    ``"quarantine"`` — the dead-letter posture for crawl-grade inputs:
    unparseable LINES (broken JSON, or a line whose value is not an
    object) land as rows with all declared fields NULL and the raw line
    in an appended ``_corrupt_record`` string column (Spark's
    PERMISSIVE idiom); good rows carry ``_corrupt_record`` NULL, so one
    ``filter`` splits the stream into the main and dead-letter sinks
    without a second scan.  Per-VALUE junk inside a parseable line
    (a string in a declared long field) is salvage-coerced to NULL in
    BOTH modes — that is schema looseness, not corruption."""
    import pandas as pd

    from pyspark.sql.types import (
        BooleanType,
        ByteType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
        _parse_datatype_string,
    )

    if on_error not in ("fail", "quarantine"):
        raise ValueError(f"on_error must be 'fail' or 'quarantine', got {on_error!r}")
    parsed = _parse_datatype_string(schema)
    fields = [f.name for f in parsed.fields]
    quarantine = on_error == "quarantine"
    if quarantine and "_corrupt_record" in fields:
        raise ValueError(
            "_corrupt_record is reserved for the quarantine column — "
            "rename the declared field"
        )
    out_schema = schema + ", _corrupt_record string" if quarantine else schema
    out_fields = fields + ["_corrupt_record"] if quarantine else fields
    # declared type → pandas NULLABLE dtype, so per-line absence (NaN in
    # an otherwise-integral column) lands as null instead of a cast error
    _nullable = {
        LongType: "Int64", IntegerType: "Int32", ShortType: "Int16",
        ByteType: "Int8", DoubleType: "Float64", FloatType: "Float32",
        BooleanType: "boolean",
    }
    coerce = {
        f.name: _nullable[type(f.dataType)]
        for f in parsed.fields
        if type(f.dataType) in _nullable
    }

    def _coerced(chunk):
        for col in fields:
            if col not in chunk.columns:
                chunk[col] = None
        for col, dtype in coerce.items():
            try:
                chunk[col] = chunk[col].astype(dtype)
            except (TypeError, ValueError):
                # mixed junk (e.g. strings in a long field):
                # salvage what parses, null the rest
                vals = pd.to_numeric(chunk[col], errors="coerce")
                if dtype.startswith("Int"):
                    # fractional/non-finite floats in a
                    # declared integer column are an unsafe
                    # cast (astype would raise and fail the
                    # whole task) — null them, keep the
                    # integral values
                    vals = vals.where(vals.mod(1) == 0)
                chunk[col] = vals.astype(dtype)
        return chunk

    def _decompressed(row):
        import pyarrow as pa

        content = bytes(row["content"])
        codec = _codec_for(row["path"])
        if codec is not None:
            content = pa.input_stream(
                pa.BufferReader(content), compression=codec
            ).read()
        return content

    def worker(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                reader = pd.read_json(
                    io.BytesIO(_decompressed(row)), lines=True, chunksize=chunk_rows
                )
                for chunk in reader:
                    yield _coerced(chunk)[fields]

    def worker_quarantine(batches):
        # per-line stdlib parse: ~2-3x the pandas C parser, paid only in
        # this mode — the price of deterministically routing every bad
        # LINE instead of failing (or mis-filing) a 50k-line chunk
        import json

        for pdf in batches:
            for _, row in pdf.iterrows():
                lines = _decompressed(row).decode("utf-8", errors="replace").split("\n")
                good, bad = [], []

                def flush():
                    out = _coerced(pd.DataFrame(good, columns=fields))
                    out["_corrupt_record"] = None
                    if bad:
                        dead = pd.DataFrame({c: [None] * len(bad) for c in fields})
                        dead["_corrupt_record"] = bad
                        out = pd.concat([out, _coerced(dead)], ignore_index=True)
                    return out[out_fields]

                for ln in lines:
                    if not ln.strip():
                        continue
                    try:
                        obj = json.loads(ln)
                    except ValueError:
                        obj = None
                    if isinstance(obj, dict):
                        good.append(obj)
                    else:  # broken JSON, or a non-object value
                        bad.append(ln)
                    if len(good) + len(bad) >= chunk_rows:
                        yield flush()
                        good, bad = [], []
                if good or bad:
                    yield flush()

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(dir_path)
        .select("path", "content")
        .mapInPandas(worker_quarantine if quarantine else worker, out_schema)
    )


def write_jsonl_shard(records, path: str) -> None:
    """Write one compressed JSONL shard (codec from the extension;
    plain text when none) — the round-trip half for tests and for
    emitting loader-ready shards from driver-side tooling."""
    import json

    import pyarrow as pa

    raw = "".join(json.dumps(r, ensure_ascii=False) + "\n" for r in records).encode()
    codec = _codec_for(path)
    if codec is None:
        with open(path, "wb") as fh:
            fh.write(raw)
        return
    with open(path, "wb") as fh:
        with pa.output_stream(fh, compression=codec) as out:
            out.write(raw)
