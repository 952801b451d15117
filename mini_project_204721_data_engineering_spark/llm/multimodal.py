"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design: image/audio/video payloads are ``binary`` columns with a metadata
struct alongside (modality, byte length, content hash).  All *plumbing* —
schema, partition-friendly batch shape, Arrow-batched UDF signatures — is
real and tested; the actual media decode is STUBBED (this environment has
no image/audio libraries) behind ``decode_stub``/``fake_feature_extract``:

- :func:`with_payload_meta` — metadata derivation (pure Column exprs)
- :func:`chunk_payload` — fixed-size byte chunking (frame-sampling shape)
- :func:`decode_batches` — the ``mapInPandas`` decode pipeline; the
  per-batch worker calls ``decoder`` which defaults to a deterministic
  fake; a real deployment passes e.g. a PIL/librosa-backed callable.
- :func:`sniff_media_header` / :func:`sniff_media_batches` — REAL
  header-level metadata (PNG/JPEG/GIF/BMP dimensions, WAV audio
  params) parsed from container bytes with no media library; only
  pixel/sample decode remains behind the injectable stub.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "with_payload_meta",
    "chunk_payload",
    "decode_stub",
    "fake_feature_extract",
    "decode_batches",
    "sample_frames",
    "sniff_media_header",
    "sniff_media_batches",
]


def with_payload_meta(df: DataFrame, payload_col: str = "payload", modality: str = "image") -> DataFrame:
    """Attach the typed metadata struct for an opaque binary column."""
    return df.withColumn(
        "payload_meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.length(F.col(payload_col)).alias("byte_len"),
            F.md5(F.col(payload_col)).alias("content_hash"),
        ),
    )


def chunk_payload(df: DataFrame, payload_col: str = "payload", chunk_bytes: int = 1024) -> DataFrame:
    """Explode a binary payload into fixed-size chunks (the frame-sample /
    tile shape): (…, chunk_idx, chunk: binary).  Pure SQL expressions —
    the split happens executor-side, payloads never visit the driver."""
    n_chunks = F.ceil(F.length(F.col(payload_col)) / F.lit(chunk_bytes)).cast("int")
    return (
        df.withColumn("_n", n_chunks)
        # guard _n = 0: sequence(0, -1) is the DESCENDING [0, -1] in Spark,
        # which would fabricate chunks for empty payloads — emit none instead
        .withColumn(
            "chunk_idx",
            F.explode(F.expr("CASE WHEN _n <= 0 THEN array() ELSE sequence(0, _n - 1) END")),
        )
        .withColumn(
            "chunk",
            F.expr(f"substring({payload_col}, chunk_idx * {chunk_bytes} + 1, {chunk_bytes})"),
        )
        .drop("_n")
    )


def decode_stub(payload: bytes) -> bytes:
    """Placeholder for a real media decoder (PIL/ffmpeg/librosa).  The
    container has none of those libs, so decoding is explicitly
    unavailable — callers wanting real decode must inject their own."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "environment; pass a real decoder to decode_batches()"
    )


def fake_feature_extract(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for an embedding model: md5-seeded floats.
    Keeps the full pipeline (schema, batching, downstream joins) testable
    without media libs."""
    h = hashlib.md5(payload).digest()
    return [b / 255.0 for b in h[:dim]]


def decode_batches(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    dim: int = 8,
    extractor: Callable[[bytes], list[float]] | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` so each worker sees pandas batches (Arrow transfer,
    zero driver involvement); schema is declared up front.  ``extractor``
    defaults to the deterministic fake; inject a real model runner in
    production.
    """
    fn = extractor or (lambda p: fake_feature_extract(p, dim))
    schema = f"{id_col} long, features array<double>"

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [fn(bytes(p)) for p in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(worker, schema)


def sample_frames(
    df: DataFrame,
    every_n: int = 4,
    payload_col: str = "payload",
    chunk_bytes: int = 1024,
) -> DataFrame:
    """Frame sampling for video-shaped payloads: chunk, keep every Nth
    chunk (frame 0, N, 2N, ...), preserving chunk_idx so downstream
    decode knows the temporal position.  Selection is a pushable modulo
    filter on chunk_idx — at scale the decoder (the expensive stage) sees
    1/N of the frames and the filter rides the same executor pass as the
    chunking, no extra shuffle."""
    chunks = chunk_payload(df, payload_col=payload_col, chunk_bytes=chunk_bytes)
    return chunks.filter(F.col("chunk_idx") % every_n == 0)


def sniff_media_header(payload: bytes) -> dict:
    """REAL (dependency-free) media metadata from container headers —
    the one decode-adjacent step that needs no media library, because
    formats put their geometry in fixed byte positions:

    - PNG: IHDR width/height (big-endian u32 at bytes 16/20);
    - JPEG: scan markers to the first SOF0-SOF15 frame header;
    - GIF87a/89a: logical screen descriptor (little-endian u16);
    - BMP: BITMAPINFOHEADER i32 dims;
    - WAV (RIFF): fmt chunk channels/sample-rate + data-chunk byte size
      → duration;
    - MP4/ISO-BMFF (the video modality): box walk to ``moov`` →
      ``mvhd`` timescale+duration (v0 u32s / v1 u64s) and the first
      visual ``trak``'s ``tkhd`` 16.16-fixed width/height.

    Returns {"format", "width", "height", "channels", "sample_rate",
    "duration_s"} with None for inapplicable fields and format
    "unknown" for unrecognized/truncated bytes — never raises (this
    runs inside a corpus-wide scan; one corrupt blob must not kill the
    task)."""
    import struct as _st

    out = {"format": "unknown", "width": None, "height": None,
           "channels": None, "sample_rate": None, "duration_s": None}
    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
            out["format"] = "png"
            out["width"], out["height"] = _st.unpack(">II", payload[16:24])
        elif payload[:3] == b"\xff\xd8\xff":
            p = 2
            while p + 9 < len(payload):
                if payload[p] != 0xFF:
                    break
                marker = payload[p + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    p += 2
                    continue
                seg_len = _st.unpack(">H", payload[p + 2 : p + 4])[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    out["format"] = "jpeg"
                    out["height"], out["width"] = _st.unpack(
                        ">HH", payload[p + 5 : p + 9]
                    )
                    break
                p += 2 + seg_len
        elif payload[:6] in (b"GIF87a", b"GIF89a"):
            out["format"] = "gif"
            out["width"], out["height"] = _st.unpack("<HH", payload[6:10])
        elif payload[:2] == b"BM" and len(payload) >= 26:
            out["format"] = "bmp"
            w, h = _st.unpack("<ii", payload[18:26])
            out["width"], out["height"] = abs(w), abs(h)
        elif len(payload) >= 12 and payload[4:8] == b"ftyp":
            # ISO BMFF: [u32 size][4cc type][payload] boxes; size==1 →
            # 64-bit largesize follows, size==0 → box runs to EOF
            def boxes(buf, p, end):
                while p + 8 <= end:
                    size = _st.unpack(">I", buf[p : p + 4])[0]
                    typ = buf[p + 4 : p + 8]
                    body = p + 8
                    if size == 1:
                        if p + 16 > end:
                            return
                        size = _st.unpack(">Q", buf[p + 8 : p + 16])[0]
                        body = p + 16
                    elif size == 0:
                        size = end - p
                    if size < 8 or p + size > end:
                        return
                    yield typ, body, p + size
                    p += size

            def find(buf, p, end, typ4):
                for typ, body, nxt in boxes(buf, p, end):
                    if typ == typ4:
                        return body, nxt
                return None

            moov = find(payload, 0, len(payload), b"moov")
            if moov:
                out["format"] = "mp4"
                mb, me = moov
                mvhd = find(payload, mb, me, b"mvhd")
                if mvhd:
                    vb, _ = mvhd
                    ver = payload[vb]
                    if ver == 1:
                        tscale = _st.unpack(">I", payload[vb + 20 : vb + 24])[0]
                        dur = _st.unpack(">Q", payload[vb + 24 : vb + 32])[0]
                    else:
                        tscale, dur = _st.unpack(
                            ">II", payload[vb + 12 : vb + 20]
                        )
                    if tscale:
                        out["duration_s"] = round(dur / tscale, 6)
                # first trak with non-zero tkhd dims = the visual track
                p = mb
                while True:
                    trak = find(payload, p, me, b"trak")
                    if trak is None:
                        break
                    tb, tn = trak
                    tkhd = find(payload, tb, tn, b"tkhd")
                    if tkhd:
                        kb, _ = tkhd
                        koff = kb + (96 if payload[kb] == 1 else 84)
                        w, h = _st.unpack(
                            ">II", payload[koff - 8 : koff]
                        )
                        if w and h:  # 16.16 fixed point
                            out["width"], out["height"] = w >> 16, h >> 16
                            break
                    p = tn
        elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            p = 12
            rate = channels = bits = data_len = None
            while p + 8 <= len(payload):
                cid = payload[p : p + 4]
                clen = _st.unpack("<I", payload[p + 4 : p + 8])[0]
                if cid == b"fmt " and clen >= 16:
                    channels, rate = _st.unpack("<HI", payload[p + 10 : p + 16])
                    bits = _st.unpack("<H", payload[p + 22 : p + 24])[0]
                elif cid == b"data":
                    data_len = clen
                p += 8 + clen + (clen & 1)  # chunks are word-aligned
            if rate:
                out["format"] = "wav"
                out["channels"], out["sample_rate"] = channels, rate
                if data_len is not None and bits:
                    bytes_per_s = rate * channels * (bits // 8)
                    if bytes_per_s:
                        out["duration_s"] = round(data_len / bytes_per_s, 6)
    except Exception:  # noqa: BLE001 — corrupt blob → "unknown", by contract
        return {"format": "unknown", "width": None, "height": None,
                "channels": None, "sample_rate": None, "duration_s": None}
    return out


def sniff_media_batches(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Distributed header sniff over a binary column (``mapInPandas`` —
    Arrow batches, payload bytes never on the driver): (id, format,
    width, height, channels, sample_rate, duration_s).  This is real
    metadata extraction, not a stub — only sample/pixel DECODE needs
    the absent media libs."""
    schema = (
        f"{id_col} long, format string, width int, height int, "
        "channels int, sample_rate int, duration_s double"
    )

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [sniff_media_header(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "format": [m["format"] for m in metas],
                    "width": pd.array([m["width"] for m in metas], dtype="Int32"),
                    "height": pd.array([m["height"] for m in metas], dtype="Int32"),
                    "channels": pd.array([m["channels"] for m in metas], dtype="Int32"),
                    "sample_rate": pd.array(
                        [m["sample_rate"] for m in metas], dtype="Int32"
                    ),
                    "duration_s": pd.array(
                        [m["duration_s"] for m in metas], dtype="Float64"
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(worker, schema)
