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
