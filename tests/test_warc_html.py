"""WARC-lite reader (sources/warc.py) + HTML text extraction
(functions/html.py): the Common-Crawl-shaped front half of a
pretraining pipeline, end to end on real files."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from pipeline_dataengineer_spark.functions.html import (
    html_title,
    html_to_text,
    visible_text_ratio,
)
from pipeline_dataengineer_spark.sources.warc import parse_warc_records, read_warc


def _warc_record(url: str, html: bytes, warc_type: str = "response") -> bytes:
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n" + html
    body = http if warc_type == "response" else html
    headers = (
        f"WARC/1.0\r\nWARC-Type: {warc_type}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return headers + body + b"\r\n\r\n"


_HTML_A = (b"<html><head><script>var x=1;</script><title>Page A</title></head>"
           b"<body><h1>Hello</h1><p>first paragraph</p></body></html>")
_HTML_B = (b"<html><body><p>second &amp; final</p><!-- hidden --></body></html>")


def test_parse_warc_records_plain_and_gzip_members():
    raw = (
        _warc_record("https://a.example/x", _HTML_A)
        + _warc_record("meta", b"ignored", warc_type="warcinfo")
        + _warc_record("https://b.example/y", _HTML_B)
    )
    recs = list(parse_warc_records(raw))
    assert [r[0] for r in recs] == ["response", "warcinfo", "response"]
    assert recs[0][1] == "https://a.example/x" and recs[0][3] == 200
    assert recs[0][4] == _HTML_A  # http headers split off
    # member-per-record gzip framing (the .warc.gz layout)
    gz = gzip.compress(
        _warc_record("https://a.example/x", _HTML_A)
    ) + gzip.compress(_warc_record("https://b.example/y", _HTML_B))
    assert [r[1] for r in parse_warc_records(gz)] == [
        "https://a.example/x", "https://b.example/y",
    ]
    # truncated tail: parsed records survive, no raise
    assert len(list(parse_warc_records(raw[: len(raw) - 40]))) >= 2


def test_read_warc_to_text_pipeline(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "seg-0.warc").write_bytes(
        _warc_record("https://a.example/x", _HTML_A)
        + _warc_record("meta", b"ignored", warc_type="warcinfo")
    )
    (d / "seg-1.warc.gz").write_bytes(
        gzip.compress(_warc_record("https://b.example/y", _HTML_B))
    )
    df = read_warc(spark, str(d) + "/*")
    out = {
        r["url"]: (r["text"], r["title"], r["ratio"])
        for r in df.select(
            "url",
            html_to_text(F.col("payload").cast("string")).alias("text"),
            html_title(F.col("payload").cast("string")).alias("title"),
            visible_text_ratio(F.col("payload").cast("string")).alias("ratio"),
        ).collect()
    }
    assert out["https://a.example/x"][0] == "Page A Hello first paragraph"
    assert out["https://a.example/x"][1] == "Page A"
    assert out["https://b.example/y"][0] == "second & final"
    assert out["https://b.example/y"][1] is None
    assert 0 < out["https://a.example/x"][2] < 0.5  # mostly markup
    # warcinfo records filtered by response_only
    assert df.count() == 2
