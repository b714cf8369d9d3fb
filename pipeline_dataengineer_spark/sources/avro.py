"""Avro Object Container File reader — pure Python, no spark-avro jar.

Spark treats Avro as an external module (the ``spark-avro`` connector
jar, absent from this container just like the Kafka jars). The
container FORMAT, however, is a simple public spec (header with a
JSON schema + codec, sync-marker-delimited blocks of binary-encoded
records), so this engine reads it the same way it reads WARC:
``binaryFile`` scan → ``mapInPandas`` record decode — one Python
worker per file, Arrow batches out, schema projected to Spark types.

Scale shape: files parallelize across tasks (a directory of N files
decodes N-wide); within a file, blocks stream sequentially exactly as
any Avro reader must (the format is sync-block sequential). Column
PRUNING happens after decode — this is the honest cost of a row-major
format vs parquet, and the reason the engine's stage tables are
parquet; the reader exists to INGEST upstream Avro into them.

Supported: null/boolean/int/long/float/double/bytes/string, record,
array, map, union, enum, fixed; codecs null and deflate. Unsupported
codecs (snappy/zstd need native libs) raise per file.
"""

from __future__ import annotations

import json
import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_MAGIC = b"Obj\x01"


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def long(self) -> int:
        # zigzag varint
        shift = 0
        acc = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def raw(self, n: int) -> bytes:
        out = self.buf[self.pos : self.pos + n]
        if len(out) != n:
            raise ValueError("truncated Avro data")
        self.pos += n
        return out

    def bytes_(self) -> bytes:
        return self.raw(self.long())

    def string(self) -> str:
        return self.bytes_().decode("utf-8")


def _decode(r: _Reader, schema):
    """Decode one value per the WRITER schema (spec §binary encoding)."""
    if isinstance(schema, str):
        kind = schema
    elif isinstance(schema, list):  # union: index then value
        idx = r.long()
        return _decode(r, schema[idx])
    else:
        kind = schema["type"]
    if kind == "null":
        return None
    if kind == "boolean":
        return r.raw(1) != b"\x00"
    if kind in ("int", "long"):
        return r.long()
    if kind == "float":
        return struct.unpack("<f", r.raw(4))[0]
    if kind == "double":
        return struct.unpack("<d", r.raw(8))[0]
    if kind == "bytes":
        return r.bytes_()
    if kind == "string":
        return r.string()
    if kind == "record":
        return {f["name"]: _decode(r, f["type"]) for f in schema["fields"]}
    if kind == "enum":
        return schema["symbols"][r.long()]
    if kind == "fixed":
        return r.raw(schema["size"])
    if kind == "array":
        out = []
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:  # negative count: block byte size follows
                r.long()
                n = -n
            for _ in range(n):
                out.append(_decode(r, schema["items"]))
    if kind == "map":
        out = {}
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:
                r.long()
                n = -n
            for _ in range(n):
                key = r.string()  # key first: RHS evaluates before subscript
                out[key] = _decode(r, schema["values"])
    raise ValueError(f"unsupported Avro type {kind!r}")


def _parse_container(payload: bytes):
    """(schema, codec, [record dict/value, ...]) from one container file."""
    if payload[:4] != _MAGIC:
        raise ValueError("not an Avro object container file")
    r = _Reader(payload, 4)
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            r.long()
            n = -n
        for _ in range(n):
            # bind the key first: Python evaluates an assignment's RHS
            # before the subscript, which would consume the stream in
            # the wrong order
            key = r.string()
            meta[key] = r.bytes_()
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec {codec!r}")
    sync = r.raw(16)
    records = []
    while r.pos < len(payload):
        count = r.long()
        size = r.long()
        block = r.raw(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)  # raw deflate per spec
        br = _Reader(block)
        for _ in range(count):
            records.append(_decode(br, schema))
        if r.raw(16) != sync:
            raise ValueError("sync marker mismatch")
    return schema, codec, records


def avro_schema_to_spark(schema) -> T.DataType:
    """Writer schema → Spark type (unions with null → nullable)."""
    if isinstance(schema, list):
        non_null = [s for s in schema if s != "null"]
        if len(non_null) != 1:
            raise ValueError("only unions with null are supported")
        return avro_schema_to_spark(non_null[0])
    kind = schema if isinstance(schema, str) else schema["type"]
    prim = {
        "null": T.NullType(), "boolean": T.BooleanType(),
        "int": T.IntegerType(), "long": T.LongType(),
        "float": T.FloatType(), "double": T.DoubleType(),
        "bytes": T.BinaryType(), "string": T.StringType(),
        "enum": T.StringType(),
    }
    if kind in prim:
        return prim[kind]
    if kind == "fixed":
        return T.BinaryType()
    if kind == "record":
        return T.StructType(
            [
                T.StructField(f["name"], avro_schema_to_spark(f["type"]), True)
                for f in schema["fields"]
            ]
        )
    if kind == "array":
        return T.ArrayType(avro_schema_to_spark(schema["items"]), True)
    if kind == "map":
        return T.MapType(T.StringType(), avro_schema_to_spark(schema["values"]), True)
    raise ValueError(f"unsupported Avro type {kind!r}")


def read_avro(spark: SparkSession, path: str, glob: str = "*.avro") -> DataFrame:
    """Directory (or single file) of Avro containers → DataFrame.

    All files must share a schema (the first file's schema wins; a
    mismatching file raises in its task — schema drift in a feed is
    an error to surface, not to guess around). Top-level schema must
    be a record (the overwhelmingly common case)."""
    import glob as globmod
    import os

    import pandas as pd

    probe = sorted(
        globmod.glob(os.path.join(path, glob))
        if os.path.isdir(path)
        else [path]
    )
    if not probe:
        raise FileNotFoundError(f"no Avro files under {path!r}")
    with open(probe[0], "rb") as fh:
        head = fh.read()
    schema0, _codec, _ = _parse_container(head)
    if not (isinstance(schema0, dict) and schema0["type"] == "record"):
        raise ValueError("top-level Avro schema must be a record")
    spark_schema = avro_schema_to_spark(schema0)
    field_names = [f.name for f in spark_schema.fields]
    canonical = json.dumps(schema0, sort_keys=True)

    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob if os.path.isdir(path) else "*")
        .load(path)
        .select("path", "content")
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for payload in pdf["content"]:
                schema, _c, records = _parse_container(bytes(payload))
                if json.dumps(schema, sort_keys=True) != canonical:
                    raise ValueError("Avro schema drift across files")
                rows.extend(records)
            yield pd.DataFrame(
                [[rec.get(n) for n in field_names] for rec in rows],
                columns=field_names,
            )

    return binary.mapInPandas(op, spark_schema)
