"""Minimal real PDF text extraction — no PDF library.

Covers the simple-PDF shape that dominates machine-generated
documents (reports, invoices, exports): content streams either
uncompressed or FlateDecode (stdlib zlib), text drawn with the
``Tj`` / ``'`` / ``TJ`` operators using literal ``(...)`` or hex
``<...>`` strings. That is exactly the subset a pure-Python parser
can own honestly; scanned/image PDFs and exotic filters (JBIG2, CCITT)
need real OCR/codec stacks and raise instead of faking it.

Same Spark seam as every media op: an Arrow ``mapInPandas`` pass over
the binary column — map-side, no shuffle, corrupt blobs → NULL.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
# literal string (with escapes) followed by a text-showing operator,
# or a TJ array of literals/numbers
_TJ_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)\s*(?:Tj|')|\[(?:[^\]\\]|\\.)*\]\s*TJ|<[0-9A-Fa-f\s]+>\s*Tj")
_LIT_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]+>")
_ESC = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(lit: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(lit):
        c = lit[i : i + 1]
        if c == b"\\" and i + 1 < len(lit):
            nxt = lit[i + 1 : i + 2]
            if nxt in _ESC:
                out += _ESC[nxt]
                i += 2
            elif nxt.isdigit():  # octal \nnn (1-3 digits)
                j = i + 1
                while j < len(lit) and j < i + 4 and lit[j : j + 1].isdigit():
                    j += 1
                out.append(int(lit[i + 1 : j], 8) & 0xFF)
                i = j
            else:
                out += nxt
                i += 2
        else:
            out += c
            i += 1
    return bytes(out)


def _decode_string(tok: bytes) -> str:
    if tok.startswith(b"("):
        return _unescape(tok[1:-1]).decode("latin-1", "replace")
    hexs = re.sub(rb"\s", b"", tok[1:-1])
    if len(hexs) % 2:
        hexs += b"0"  # spec: odd final digit pads with 0
    return bytes.fromhex(hexs.decode("ascii")).decode("latin-1", "replace")


def _pdf_text(payload: bytes) -> str:
    """Concatenated text of all Tj/'/TJ show operators across the
    document's content streams, in stream order; text-showing calls
    are joined by single spaces (layout reconstruction is out of
    scope — this is the corpus-ingestion cut, not a renderer)."""
    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF")
    pieces: list[str] = []
    for m in _STREAM_RE.finditer(payload):
        raw = m.group(1)
        try:
            content = zlib.decompress(raw)
        except zlib.error:
            content = raw  # uncompressed content stream
        for tm in _TJ_RE.finditer(content):
            tok = tm.group(0)
            if tok.rstrip().endswith(b"TJ"):
                # TJ array: concatenate its string elements (numbers
                # are kerning offsets)
                for lit in _LIT_RE.finditer(tok):
                    pieces.append(_decode_string(lit.group(0)))
            else:
                lit = _LIT_RE.match(tok)
                pieces.append(_decode_string(lit.group(0)))
    if not pieces:
        raise ValueError("no extractable text streams")
    return " ".join(p for p in pieces if p != "")


def pdf_text_extract(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """PDF payload → (pdf_text, n_text_chars) via mapInPandas — real
    stream walking + FlateDecode + Tj/TJ string decoding (escapes,
    octal, hex strings). Rows that aren't simple text PDFs get NULLs
    (the honest boundary: scanned PDFs need OCR, not a regex)."""
    import pandas as pd

    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("pdf_text", T.StringType(), True),
            T.StructField("n_text_chars", T.LongType(), True),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, lens = [], []
            for payload in pdf[payload_col]:
                try:
                    t = _pdf_text(payload)
                    texts.append(t)
                    lens.append(len(t))
                except Exception:
                    texts.append(None)
                    lens.append(None)
            yield pdf.assign(pdf_text=texts, n_text_chars=lens)

    return df.mapInPandas(op, out_schema)
