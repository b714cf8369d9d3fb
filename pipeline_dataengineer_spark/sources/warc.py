"""WARC-lite reader: web-archive records → rows, over binaryFile.

Common Crawl — the canonical 100-TB pretraining input — ships as
WARC: concatenated records, each ``WARC/1.0\\r\\n`` + headers +
``\\r\\n\\r\\n`` + Content-Length payload bytes + ``\\r\\n\\r\\n``.
This reader keeps the Spark plumbing real and library-free:

- files arrive via the built-in ``binaryFile`` source (path/size
  metadata prunes BEFORE payload bytes load — same front door as
  the media pipeline, ``sources/files.py``);
- record splitting + header parsing run in ``mapInPandas`` (Arrow
  batches, one Python worker per file partition — per-record
  overhead amortized, memory bounded by batch size);
- response records yield (url, warc_type, content_type, payload
  binary); HTTP response payloads get their status line + headers
  split off so the body is the raw HTML, ready for
  ``functions.html.html_to_text``.

Gzip members (the .warc.gz framing where each record is its own
deflate stream) are handled per-file with stdlib zlib. At real scale
point the SAME reader at a bucket of .warc.gz objects; splitting
WITHIN a multi-gigabyte archive file needs a gzip-member-aware
InputFormat, which is the documented seam (files ≤ a few hundred MB —
Common Crawl's actual segment size — parallelize per-file just
fine)."""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("source_file", T.StringType(), False),
        T.StructField("record_idx", T.IntegerType(), False),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def _maybe_gunzip(data: bytes) -> bytes:
    """Decompress all gzip members if the file is gzipped (the
    .warc.gz member-per-record framing concatenates streams)."""
    if data[:2] != b"\x1f\x8b":
        return data
    out = bytearray()
    pos = 0
    while pos < len(data) and data[pos : pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out += d.decompress(data[pos:])
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return bytes(out)


def parse_warc_records(data: bytes):
    """Yield (warc_type, url, content_type, http_status, payload)
    per record. Malformed tails stop cleanly (truncated crawls are a
    certainty at scale; a reader that throws at 99% is wrong)."""
    data = _maybe_gunzip(data)
    pos = 0
    while True:
        start = data.find(b"WARC/", pos)
        if start < 0:
            return
        hdr_end = data.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        for line in data[start:hdr_end].split(b"\r\n")[1:]:
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.strip().lower().decode()] = v.strip().decode(
                    "utf-8", "replace"
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        body = data[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        warc_type = headers.get("warc-type")
        url = headers.get("warc-target-uri")
        ctype = headers.get("content-type")
        status = None
        if warc_type == "response" and body[:5] == b"HTTP/":
            http_end = body.find(b"\r\n\r\n")
            if http_end >= 0:
                status_line = body[: body.find(b"\r\n")].split(b" ")
                if len(status_line) >= 2 and status_line[1].isdigit():
                    status = int(status_line[1])
                for hline in body[:http_end].split(b"\r\n")[1:]:
                    if hline.lower().startswith(b"content-type:"):
                        ctype = hline.split(b":", 1)[1].strip().decode(
                            "utf-8", "replace"
                        )
                body = body[http_end + 4 :]
        yield warc_type, url, ctype, status, bytes(body)


def read_warc(
    spark: SparkSession, path_glob: str, response_only: bool = True
) -> DataFrame:
    """WARC files under ``path_glob`` → one row per record
    (``WARC_SCHEMA``). binaryFile scan + mapInPandas split."""
    import pandas as pd

    files = (
        spark.read.format("binaryFile").load(path_glob)
        .select("path", "content")
    )

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for i, (wt, url, ctype, status, payload) in enumerate(
                    parse_warc_records(bytes(content))
                ):
                    if response_only and wt != "response":
                        continue
                    rows.append(
                        {
                            "source_file": path,
                            "record_idx": i,
                            "warc_type": wt,
                            "url": url,
                            "content_type": ctype,
                            "http_status": status,
                            "payload": payload,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields]
            )

    return files.mapInPandas(split, WARC_SCHEMA)
