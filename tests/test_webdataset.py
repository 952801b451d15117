"""WebDataset tar-shard sink/source tests (sources/webdataset.py)."""
from __future__ import annotations

import io
import os
import shutil
import tarfile
import tempfile

import pytest
from pyspark.sql import functions as F

from mini_project_204721_data_engineering_spark.sources.webdataset import (
    read_webdataset,
    write_webdataset,
)


def _samples(spark, n=40):
    rows = []
    for i in range(n):
        key = f"{i:06d}"
        rows.append((key, "img", bytes([i % 256]) * (10 + i)))
        rows.append((key, "txt", f"caption {i}".encode()))
        rows.append((key, "json", b'{"id": %d}' % i))
    return spark.createDataFrame(rows, "sample_key string, ext string, payload binary")


def test_webdataset_roundtrip_grouping_and_determinism(spark):
    """write→read round-trips every member byte-for-byte; a sample's
    members land in the SAME shard adjacently; shard assignment is
    deterministic (two writes → byte-identical tars); shard count is
    as requested; the input-contract check refuses loudly."""
    d1 = tempfile.mkdtemp(prefix="wds1_")
    d2 = tempfile.mkdtemp(prefix="wds2_")
    try:
        df = _samples(spark)
        write_webdataset(df, d1, n_shards=4)
        names = sorted(os.listdir(d1))
        assert names == [f"shard-{i:05d}.tar" for i in range(4)]
        back = read_webdataset(spark, d1)
        got = {(r["sample_key"], r["ext"]): bytes(r["payload"]) for r in back.collect()}
        want = {(r["sample_key"], r["ext"]): bytes(r["payload"]) for r in df.collect()}
        assert got == want
        # every sample's members share one shard
        spread = (
            back.groupBy("sample_key")
            .agg(F.countDistinct("shard").alias("ns"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        assert all(r["ns"] == 1 and r["n"] == 3 for r in spread)
        # members of a sample are ADJACENT in the tar (WebDataset rule)
        for name in names:
            with tarfile.open(os.path.join(d1, name)) as tf:
                keys = [m.name.rpartition(".")[0] for m in tf.getmembers()]
            seen = set()
            prev = None
            for k in keys:
                if k != prev:
                    assert k not in seen, f"sample {k} split inside {name}"
                    seen.add(k)
                prev = k
        # byte-identical rerun (pinned mtimes/uids, stable assignment)
        write_webdataset(df.repartition(13), d2, n_shards=4)
        for name in names:
            with open(os.path.join(d1, name), "rb") as a, open(
                os.path.join(d2, name), "rb"
            ) as b:
                assert a.read() == b.read(), name
        with pytest.raises(ValueError, match="missing"):
            write_webdataset(df.drop("ext"), d1)
    finally:
        shutil.rmtree(d1, ignore_errors=True)
        shutil.rmtree(d2, ignore_errors=True)


def test_webdataset_composes_with_multimodal_sniff(spark):
    """The read side feeds the multimodal pipeline: PNG payloads written
    through shards still sniff width/height from real header bytes."""
    import struct
    import zlib

    from mini_project_204721_data_engineering_spark.llm.multimodal import sniff_media_header

    def png(w, h):
        ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
        chunk = b"IHDR" + ihdr
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", len(ihdr))
            + chunk
            + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
        )

    d = tempfile.mkdtemp(prefix="wds_png_")
    try:
        df = spark.createDataFrame(
            [(f"{i:04d}", "png", png(16 + i, 9 + i)) for i in range(6)],
            "sample_key string, ext string, payload binary",
        )
        write_webdataset(df, d, n_shards=2)
        back = read_webdataset(spark, d).filter(F.col("ext") == "png").collect()
        assert len(back) == 6
        for r in back:
            meta = sniff_media_header(bytes(r["payload"]))
            i = int(r["sample_key"])
            assert (meta["width"], meta["height"]) == (16 + i, 9 + i)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_webdataset_corrupt_shard_raises_named_error(spark):
    """A corrupt shard fails the read LOUDLY naming the file — not a
    bare TarError from deep inside a task."""
    d = tempfile.mkdtemp(prefix="wds_bad_")
    try:
        with open(os.path.join(d, "shard-00000.tar"), "wb") as fh:
            fh.write(b"this is definitely not a tar archive" * 20)
        with pytest.raises(Exception, match="corrupt WebDataset shard shard-00000.tar"):
            read_webdataset(spark, d).collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_webdataset_truncated_after_valid_header_raises_named_error(spark):
    """One valid 512-byte header then truncation: tarfile.open succeeds,
    the failure comes from member iteration — the shard-naming contract
    must cover that too."""
    import tarfile as _tarfile

    d = tempfile.mkdtemp(prefix="wds_trunc_")
    try:
        buf = io.BytesIO()
        with _tarfile.open(fileobj=buf, mode="w") as tf:
            info = _tarfile.TarInfo("sample.txt")
            payload = b"x" * 4096
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
        raw = buf.getvalue()
        with open(os.path.join(d, "shard-00000.tar"), "wb") as fh:
            fh.write(raw[:700])  # header intact, payload cut mid-block
        with pytest.raises(Exception, match="corrupt WebDataset shard shard-00000.tar"):
            read_webdataset(spark, d).collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)
