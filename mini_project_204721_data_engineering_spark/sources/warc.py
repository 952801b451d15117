"""WARC (Web ARChive, ISO 28500) reader — the Common-Crawl container:
the raw-crawl front door of a training-data pipeline, feeding
:func:`~..llm.text.strip_html` and the quality/dedup cascade.

Clean-room byte parser of the public WARC/1.0-1.1 format (same strategy
as the netcdf/xls readers): a record is a ``WARC/1.x`` version line,
CRLF header lines to a blank line, a ``Content-Length``-sized block,
and a CRLF CRLF separator.  For ``response`` records the block is an
HTTP message — status line, headers, blank line, body; the body decodes
with the charset declared in the HTTP ``Content-Type`` (fallback
UTF-8/replace — crawls lie about encodings, so decoding never raises).

Scale shape: ``binaryFile`` + ``mapInPandas``, one ``.warc`` /
``.warc.gz`` file per task (gzip members concatenate — stdlib
``gzip.GzipFile`` reads them all), bytes never on the driver.  The
writer emits well-formed fixtures for round-trip tests and fuzzing.
"""

from __future__ import annotations

import gzip
import io
import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

__all__ = ["parse_warc", "read_warc", "write_warc"]

_CHARSET_RE = re.compile(rb"charset\s*=\s*[\"']?([\w.-]+)", re.I)


def _unfold(lines: list[bytes]) -> list[bytes]:
    """RFC-822-style header unfolding (ISO 28500 §4: a header line may
    continue on the next line with leading SP/HTAB): join continuation
    lines onto their predecessor with a single space."""
    out: list[bytes] = []
    for line in lines:
        if line[:1] in (b" ", b"\t") and out:
            out[-1] = out[-1] + b" " + line.strip()
        else:
            out.append(line)
    return out


def _split_headers(block: bytes) -> tuple[dict[str, str], bytes]:
    head, _, rest = block.partition(b"\r\n\r\n")
    headers: dict[str, str] = {}
    for line in _unfold(head.split(b"\r\n")[1:]):  # [0] is version/status
        k, _, v = line.partition(b":")
        if _:
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1"
            )
    return headers, rest


def parse_warc(content: bytes, max_records: int = 1_000_000) -> list[dict]:
    """All records of one WARC file (gzip-sniffed) as dicts:
    ``record_id, warc_type, target_uri, http_status, content_type,
    body_text``.  Non-response records carry their block decoded
    UTF-8/replace in ``body_text``; corrupt/truncated containers raise
    ``ValueError`` (the binary readers' shared contract).  Folded
    (SP/HTAB-continued) header lines unfold per ISO 28500 §4.
    ``max_records`` is a runaway-file guard, not a silent cap: hitting
    it with bytes still unread raises — split the file or raise the
    cap; records are never dropped silently."""
    if content[:2] == b"\x1f\x8b":
        try:
            content = gzip.GzipFile(fileobj=io.BytesIO(content)).read()
        except (OSError, EOFError) as e:
            raise ValueError(f"corrupt WARC gzip: {e!r}") from e
    out: list[dict] = []
    p = 0
    n = len(content)
    while p < n and len(out) < max_records:
        if content[p : p + 2] == b"\r\n":  # tolerate extra separators
            p += 2
            continue
        if not content.startswith(b"WARC/", p):
            raise ValueError(f"bad WARC version line at byte {p}")
        head_end = content.find(b"\r\n\r\n", p)
        if head_end < 0:
            raise ValueError("truncated WARC header")
        headers: dict[str, str] = {}
        for line in _unfold(content[p:head_end].split(b"\r\n")[1:]):
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                    "latin-1"
                )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError as e:
            raise ValueError("WARC record without valid Content-Length") from e
        block_start = head_end + 4
        block = content[block_start : block_start + clen]
        if len(block) != clen:
            raise ValueError("truncated WARC record block")
        rec = {
            "record_id": headers.get("warc-record-id", ""),
            "warc_type": headers.get("warc-type", ""),
            "target_uri": headers.get("warc-target-uri", ""),
            "http_status": None,
            "content_type": headers.get("content-type", ""),
            "body_text": "",
        }
        if rec["warc_type"] == "response" and block[:5] == b"HTTP/":
            http_headers, body = _split_headers(block)
            status_line = block.split(b"\r\n", 1)[0].split(b" ")
            rec["http_status"] = (
                int(status_line[1]) if len(status_line) > 1 and status_line[1].isdigit() else None
            )
            rec["content_type"] = http_headers.get("content-type", rec["content_type"])
            m = _CHARSET_RE.search(
                http_headers.get("content-type", "").encode("latin-1")
            )
            charset = m.group(1).decode("latin-1") if m else "utf-8"
            try:
                rec["body_text"] = body.decode(charset, "replace")
            except LookupError:  # unknown charset label in the wild
                rec["body_text"] = body.decode("utf-8", "replace")
        else:
            rec["body_text"] = block.decode("utf-8", "replace")
        out.append(rec)
        p = block_start + clen
    while p < n and content[p : p + 2] == b"\r\n":
        p += 2
    if p < n:
        raise ValueError(
            f"WARC file exceeds max_records={max_records} "
            f"({n - p} bytes unread) — split the file or raise the cap"
        )
    return out


_WARC_SCHEMA = (
    "record_id string, warc_type string, target_uri string, "
    "http_status int, content_type string, body_text string"
)


def read_warc(
    spark: SparkSession, dir_path: str, pattern: str = "*.warc*"
) -> DataFrame:
    """Distributed WARC directory scan → one row per record."""

    def worker(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                yield pd.DataFrame(parse_warc(bytes(row["content"])), columns=[
                    "record_id", "warc_type", "target_uri", "http_status",
                    "content_type", "body_text",
                ])

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(dir_path)
        .select("content")
        .mapInPandas(worker, _WARC_SCHEMA)
    )


def write_warc(path: str, pages: list[dict], compress: bool | None = None) -> None:
    """Fixture writer: one ``response`` record per page dict
    (``uri, status, html, charset``), gzip'd when the path ends
    ``.gz`` (one member per record — the Common-Crawl layout)."""
    if compress is None:
        compress = path.endswith(".gz")
    chunks: list[bytes] = []
    for i, page in enumerate(pages):
        charset = page.get("charset", "utf-8")
        body = page["html"].encode(charset)
        http = (
            f"HTTP/1.1 {page.get('status', 200)} OK\r\n"
            f"Content-Type: text/html; charset={charset}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode("latin-1") + body
        rec = (
            f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:rec-{i}>\r\n"
            f"WARC-Target-URI: {page['uri']}\r\n"
            f"Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode("latin-1") + http + b"\r\n\r\n"
        chunks.append(gzip.compress(rec) if compress else rec)
    with open(path, "wb") as fh:
        fh.write(b"".join(chunks))
