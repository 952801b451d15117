"""WARC reader round-trips (sources/warc.py): plain + per-record-gzip
containers, charset handling, HTTP header split, and the end-to-end
crawl→strip_html extraction composition."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mini_project_204721_data_engineering_spark.sources.warc import (
    parse_warc,
    read_warc,
    write_warc,
)

PAGES = [
    {"uri": "http://a.example/1", "html": "<html><body><p>First page &amp; text</p></body></html>"},
    {"uri": "http://a.example/2", "html": "<p>Zweite Seite: grüße</p>", "charset": "latin-1"},
    {"uri": "http://a.example/3", "html": "<script>x</script><p>Third</p>", "status": 404},
]


def test_parse_warc_roundtrip_plain_and_gzip(tmp_path):
    for name in ("f.warc", "f.warc.gz"):
        p = str(tmp_path / name)
        write_warc(p, PAGES)
        recs = parse_warc(open(p, "rb").read())
        assert [r["target_uri"] for r in recs] == [pg["uri"] for pg in PAGES]
        assert all(r["warc_type"] == "response" for r in recs)
        assert recs[0]["http_status"] == 200 and recs[2]["http_status"] == 404
        assert "First page" in recs[0]["body_text"]
        assert "grüße" in recs[1]["body_text"]  # latin-1 charset honored
        assert "text/html" in recs[0]["content_type"]


def test_parse_warc_corrupt_raises_value_error(tmp_path):
    p = str(tmp_path / "f.warc")
    write_warc(p, PAGES)
    raw = open(p, "rb").read()
    with pytest.raises(ValueError):
        parse_warc(raw[: len(raw) // 2 - 7])  # truncated mid-record
    with pytest.raises(ValueError):
        parse_warc(b"NOT A WARC AT ALL\r\n\r\n")


def test_read_warc_distributed_and_strip_html_composition(spark, tmp_path):
    d = str(tmp_path)
    write_warc(os.path.join(d, "a.warc.gz"), PAGES)
    write_warc(
        os.path.join(d, "b.warc"),
        [{"uri": "http://b.example/x", "html": "<div>Fourth &lt;doc&gt;</div>"}],
    )
    from mini_project_204721_data_engineering_spark.llm.text import strip_html

    out = read_warc(spark, d).filter("http_status = 200").select(
        "target_uri", strip_html(F.col("body_text")).alias("text")
    )
    got = {r["target_uri"]: r["text"] for r in out.collect()}
    assert got["http://a.example/1"] == "First page & text"
    assert "http://a.example/3" not in got  # the 404 is filtered out
    assert got["http://a.example/2"] == "Zweite Seite: grüße"
    assert got["http://b.example/x"] == "Fourth <doc>"


def test_crawl_to_training_corpus_capstone(spark, tmp_path):
    """The full crawl→corpus pipeline in one composed plan over real
    WARC bytes: ingest → HTML text extraction → quality gate → exact
    dedup → curated parquet.  A duplicated page survives once; the
    boilerplate-only page is gated out; all text is markup-free."""
    import os

    from mini_project_204721_data_engineering_spark.llm.text import quality_score, strip_html

    body = " ".join(f"solid sentence number {i} with plenty of words" for i in range(12))
    pages = [
        {"uri": "http://c.example/good1", "html": f"<html><body><p>{body}</p></body></html>"},
        {"uri": "http://c.example/dup", "html": f"<div>{body}</div>"},      # same text
        {"uri": "http://c.example/thin", "html": "<script>x()</script><p>ok</p>"},
    ]
    d = str(tmp_path / "crawl")
    os.makedirs(d)
    write_warc(os.path.join(d, "shard0.warc.gz"), pages)
    out_dir = str(tmp_path / "curated")

    curated = (
        read_warc(spark, d)
        .filter("http_status = 200")
        .select("target_uri", strip_html(F.col("body_text")).alias("text"))
        .filter(quality_score(F.col("text")) >= 0.6)
        .withColumn("content_hash", F.md5("text"))
        .dropDuplicates(["content_hash"])
    )
    curated.write.parquet(out_dir)
    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) == 1  # dup collapsed, thin page gated
    assert rows[0]["text"] == body
    assert "<" not in rows[0]["text"]


def test_warc_folded_header_lines_unfold():
    """ISO 28500 §4 allows header values to continue on lines starting
    with SP/HTAB — the parser joins them instead of corrupting the
    block-boundary search."""
    body = b"hello folded world"
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/plain;\r\n\t charset=utf-8\r\n"
        + b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
    )
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://f.example/\r\n"
        b"  folded-uri-tail\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        + b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
        + http + b"\r\n\r\n"
    )
    recs = parse_warc(rec)
    assert len(recs) == 1
    assert recs[0]["target_uri"] == "http://f.example/ folded-uri-tail"
    assert recs[0]["http_status"] == 200
    assert recs[0]["content_type"].startswith("text/plain")
    assert recs[0]["body_text"] == "hello folded world"


def test_warc_max_records_cap_raises_not_truncates(tmp_path):
    """Hitting max_records with bytes still unread raises — records are
    never silently dropped."""
    p = str(tmp_path / "many.warc")
    write_warc(p, [{"uri": f"http://m.example/{i}", "html": f"<p>pg {i}</p>"} for i in range(5)])
    content = open(p, "rb").read()
    assert len(parse_warc(content)) == 5  # default cap: all records
    with pytest.raises(ValueError, match="max_records"):
        parse_warc(content, max_records=3)


def test_url_parts_and_canonical_dedup_composition(spark):
    """URL decomposition + canonicalization over crawl records: parts
    extract correctly (scheme/host/domain/path/query, userinfo and
    ports stripped from host), canonical forms collapse trivial
    variants, and the WARC→canonical-URL frontier-dedup composition
    keeps one record per canonical URL."""
    from mini_project_204721_data_engineering_spark.llm.text import (
        canonical_url,
        url_parts,
    )

    urls = [
        "https://News.Example.co.uk:443/a/b?q=1#frag",
        "http://user:pw@sub.site.org/path/",
        "https://news.example.co.uk/a/b?q=1",
        "ftp://files.example.com",
        "not a url at all",
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i long, url string")
    out = {r["i"]: r["p"] for r in df.select("i", url_parts(F.col("url")).alias("p")).collect()}
    assert out[0]["scheme"] == "https"
    assert out[0]["host"] == "news.example.co.uk"  # lowercased, port stripped
    # last-two-labels heuristic: multi-label public suffixes under-split
    # (documented trade) — co.uk, not example.co.uk
    assert out[0]["registered_domain"] == "co.uk"
    assert out[0]["path"] == "/a/b" and out[0]["query"] == "q=1"
    assert out[1]["host"] == "sub.site.org"  # userinfo stripped
    assert out[1]["registered_domain"] == "site.org"
    assert out[3]["scheme"] == "ftp" and out[3]["path"] == ""
    assert out[4]["scheme"] == "" and out[4]["host"] == ""
    canon = {r["i"]: r["c"] for r in df.select("i", canonical_url(F.col("url")).alias("c")).collect()}
    assert canon[0] == canon[2] == "https://news.example.co.uk/a/b?q=1"
    assert canon[1] == "http://sub.site.org/path"
    # frontier dedup: one row per canonical URL
    kept = (
        df.withColumn("c", canonical_url(F.col("url")))
        .groupBy("c").agg(F.min("i").alias("first_i"))
    )
    assert kept.count() == 4
