"""Arrow IPC / Feather v2 source & sink — the ML-pipeline interchange
format (Hugging Face datasets, Polars, pandas ``to_feather`` all speak
it), which Spark has no native reader for.

Scale shape mirrors the NetCDF reader: ``binaryFile`` lists the landing
directory, every task decodes ONE file's bytes with pyarrow (already a
Spark dependency — Arrow powers ``mapInPandas`` itself), streaming one
pandas frame per Arrow RECORD BATCH so a multi-GB file never
materializes whole in a task.  File bytes never visit the driver; the
schema is read driver-side from the FIRST file's footer only (metadata,
not data).

Both container flavors are handled: the IPC *file* format (Feather v2,
magic ``ARROW1``) and the IPC *stream* format (no footer, fed from
sockets/queues).  Compressed record batches (lz4/zstd) decode iff the
running pyarrow build carries the codec — the standard wheel does.

Schema inference goes through the Hadoop FileSystem abstraction when a
``SparkSession`` is in hand, so the reader works identically on local
paths, HDFS, and object stores (the same listing the ``binaryFile``
scan uses), and it reads ONLY the leading schema message — in both
container flavors the stream header (after the 8-byte file magic, for
the file format) begins with the encapsulated Schema message, so a
bounded head read suffices; record batches and the footer are never
fetched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_arrow_ipc", "write_arrow_ipc", "arrow_ipc_schema"]

_MAGIC = b"ARROW1"


def _open_reader(content: bytes):
    import pyarrow as pa

    if content[:6] == _MAGIC:
        return pa.ipc.open_file(pa.BufferReader(content))
    return pa.ipc.open_stream(pa.BufferReader(content))


def _fs_for(spark: SparkSession, path_str: str):
    """(Hadoop FileSystem, Path) for a path string — the same resolution
    chain Spark's own file sources use, so any configured filesystem
    (file://, hdfs://, s3a://, ...) works."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath, jvm


def _fs_glob_first(spark: SparkSession, dir_path: str, pattern: str) -> str | None:
    """Lexicographically first file matching ``pattern`` under
    ``dir_path`` on whatever filesystem owns the path."""
    fs, _, jvm = _fs_for(spark, dir_path)
    glob = jvm.org.apache.hadoop.fs.Path(dir_path, pattern)
    statuses = fs.globStatus(glob)
    if statuses is None:
        return None
    files = sorted(
        str(s.getPath().toString()) for s in statuses if s.isFile()
    )
    return files[0] if files else None


def _head_bytes(path: str, n: int, spark: SparkSession | None) -> bytes:
    """First ``min(n, filesize)`` bytes of ``path`` — via Hadoop FS when
    a session is given (any filesystem), plain ``open`` otherwise."""
    if spark is None:
        with open(path, "rb") as fh:
            return fh.read(n)
    fs, jpath, jvm = _fs_for(spark, path)
    size = fs.getFileStatus(jpath).getLen()
    want = min(n, int(size))
    stream = fs.open(jpath)
    try:
        return bytes(
            jvm.org.apache.commons.io.IOUtils.toByteArray(stream, want)
        )
    finally:
        stream.close()


def arrow_ipc_schema(path: str, spark: SparkSession | None = None):
    """The pyarrow schema of one IPC file or stream — a bounded HEAD
    read (magic + the encapsulated Schema message only; record batches
    and the file-format footer are never touched).  Pass ``spark`` to
    resolve the path through the Hadoop FS abstraction (HDFS/S3/...);
    without it the path must be driver-local."""
    import pyarrow as pa

    head = _head_bytes(path, 16, spark)
    off = 8 if head[:6] == _MAGIC else 0  # file magic is 8 bytes padded
    # encapsulated message: 0xFFFFFFFF continuation + int32 metadata
    # length (current format), or a bare int32 length (legacy pre-0.15)
    if head[off : off + 4] == b"\xff\xff\xff\xff":
        meta_len = int.from_bytes(head[off + 4 : off + 8], "little")
        need = off + 8 + meta_len
    else:
        meta_len = int.from_bytes(head[off : off + 4], "little")
        need = off + 4 + meta_len
    if meta_len <= 0 or meta_len > 64 << 20:  # corrupt header: let
        # pyarrow produce its own clean invalid-file error on the head
        return _open_reader(head).schema
    buf = head if need <= len(head) else _head_bytes(path, need, spark)
    return pa.ipc.read_schema(pa.BufferReader(buf[off:need]))


def read_arrow_ipc(
    spark: SparkSession,
    dir_path: str,
    pattern: str = "*.arrow",
    columns: list[str] | None = None,
) -> DataFrame:
    """Distributed Arrow-IPC directory scan → DataFrame.

    The Spark schema derives from the first matching file driver-side
    (a bounded head read of the Schema message via the Hadoop FS
    abstraction — works on any configured filesystem); every file is
    then decoded executor-side, one pandas frame per record batch
    (bounded task memory), with optional column pruning applied AT
    DECODE (the IPC file layout lets pyarrow skip unprojected column
    buffers entirely)."""
    import pyarrow as pa

    first = _fs_glob_first(spark, dir_path, pattern)
    if first is None:
        raise ValueError(f"no files match {pattern!r} under {dir_path}")
    schema = arrow_ipc_schema(first, spark)
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])
    spark_schema = ", ".join(
        f"`{f.name}` {_spark_type(f.type)}" for f in schema
    )
    want = list(schema.names)

    def worker(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                reader = _open_reader(bytes(row["content"]))
                if hasattr(reader, "num_record_batches"):  # file format
                    it = (
                        reader.get_batch(i)
                        for i in range(reader.num_record_batches)
                    )
                else:  # stream format
                    it = iter(reader)
                for rb in it:
                    tbl = pa.Table.from_batches([rb]).select(want)
                    yield tbl.to_pandas()

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(dir_path)
        .select("content")
        .mapInPandas(worker, spark_schema)
    )


def _spark_type(t) -> str:
    import pyarrow as pa

    if pa.types.is_int64(t):
        return "long"
    if pa.types.is_int32(t):
        return "int"
    if pa.types.is_int16(t):
        return "short"
    if pa.types.is_int8(t):
        return "byte"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp_ntz" if t.tz is None else "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"array<{_spark_type(t.value_type)}>"
    raise ValueError(f"unsupported Arrow type {t} for the IPC reader")


def write_arrow_ipc(
    df_pandas,
    path: str,
    batch_rows: int = 1 << 16,
    stream: bool = False,
    compression: str | None = None,
) -> None:
    """Write one Arrow IPC file (Feather-v2 file format, or the stream
    format with ``stream=True``) from a pandas frame — the round-trip
    half for tests and for handing curated shards to IPC-speaking
    consumers."""
    import pyarrow as pa

    tbl = pa.Table.from_pandas(df_pandas, preserve_index=False)
    opts = pa.ipc.IpcWriteOptions(compression=compression)
    with open(path, "wb") as fh:
        opener = pa.ipc.new_stream if stream else pa.ipc.new_file
        with opener(fh, tbl.schema, options=opts) as w:
            for rb in tbl.to_batches(max_chunksize=batch_rows):
                w.write_batch(rb)
