"""Pure-Python Avro container reader (sources/avro.py): round trips
against an independent minimal writer, both codecs, nested types,
distribution across files."""

from __future__ import annotations

import json
import struct
import zlib


def _zigzag(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _string(s: str) -> bytes:
    b = s.encode()
    return _zigzag(len(b)) + b


def _encode(value, schema) -> bytes:
    if isinstance(schema, list):  # union
        for i, branch in enumerate(schema):
            if value is None and branch == "null":
                return _zigzag(i)
            if value is not None and branch != "null":
                return _zigzag(i) + _encode(value, branch)
        raise AssertionError
    kind = schema if isinstance(schema, str) else schema["type"]
    if kind == "null":
        return b""
    if kind == "boolean":
        return b"\x01" if value else b"\x00"
    if kind in ("int", "long"):
        return _zigzag(value)
    if kind == "float":
        return struct.pack("<f", value)
    if kind == "double":
        return struct.pack("<d", value)
    if kind == "bytes":
        return _zigzag(len(value)) + value
    if kind == "string":
        return _string(value)
    if kind == "record":
        return b"".join(_encode(value[f["name"]], f["type"]) for f in schema["fields"])
    if kind == "enum":
        return _zigzag(schema["symbols"].index(value))
    if kind == "array":
        body = b"".join(_encode(v, schema["items"]) for v in value)
        return (_zigzag(len(value)) + body if value else b"") + _zigzag(0)
    if kind == "map":
        body = b"".join(_string(k) + _encode(v, schema["values"]) for k, v in value.items())
        return (_zigzag(len(value)) + body if value else b"") + _zigzag(0)
    raise AssertionError(kind)


def write_avro_container(path, schema, records, codec="null"):
    sync = bytes(range(16))
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec.encode()}
    out = bytearray(b"Obj\x01")
    out += _zigzag(len(meta))
    for k, v in meta.items():
        out += _string(k) + _zigzag(len(v)) + v
    out += _zigzag(0)
    out += sync
    if records:
        block = b"".join(_encode(r, schema) for r in records)
        if codec == "deflate":
            comp = zlib.compressobj(9, zlib.DEFLATED, -15)
            block = comp.compress(block) + comp.flush()
        out += _zigzag(len(records)) + _zigzag(len(block)) + block + sync
    with open(path, "wb") as fh:
        fh.write(bytes(out))


SCHEMA = {
    "type": "record",
    "name": "Doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "title", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
        {"name": "kind", "type": {"type": "enum", "name": "K",
                                  "symbols": ["A", "B"]}},
        {"name": "inner", "type": {"type": "record", "name": "Inner",
                                   "fields": [{"name": "x", "type": "int"},
                                              {"name": "y", "type": ["null", "double"]}]}},
    ],
}


def _recs(start, n):
    return [
        {
            "id": i,
            "title": None if i % 3 == 0 else f"t{i}",
            "score": i * 0.5,
            "flag": i % 2 == 0,
            "tags": [f"g{i % 2}", "all"] if i % 4 else [],
            "attrs": {"a": i, "b": i * 10} if i % 5 else {},
            "kind": "A" if i % 2 else "B",
            "inner": {"x": i, "y": None if i % 2 else i * 1.5},
        }
        for i in range(start, start + n)
    ]


def test_avro_round_trip_both_codecs(spark, tmp_path):
    from pipeline_dataengineer_spark.sources.avro import read_avro

    d = tmp_path / "avro"
    d.mkdir()
    write_avro_container(d / "p0.avro", SCHEMA, _recs(0, 20), codec="null")
    write_avro_container(d / "p1.avro", SCHEMA, _recs(20, 20), codec="deflate")
    write_avro_container(d / "p2.avro", SCHEMA, [], codec="null")  # empty file

    df = read_avro(spark, str(d))
    assert df.schema["title"].dataType.typeName() == "string"
    assert df.schema["inner"].dataType.typeName() == "struct"
    rows = {r["id"]: r for r in df.collect()}
    assert len(rows) == 40
    assert rows[3]["title"] is None and rows[4]["title"] == "t4"
    assert rows[7]["score"] == 3.5 and rows[6]["flag"] is True
    assert rows[5]["tags"] == ["g1", "all"] and rows[4]["tags"] == []
    assert rows[6]["attrs"] == {"a": 6, "b": 60} and rows[5]["attrs"] == {}
    assert rows[9]["kind"] == "A" and rows[8]["kind"] == "B"
    assert rows[8]["inner"]["x"] == 8 and rows[8]["inner"]["y"] == 12.0
    assert rows[9]["inner"]["y"] is None
    # Spark-side ops compose on the decoded frame
    from pyspark.sql import functions as F
    agg = df.filter(F.col("flag")).agg(F.sum("id")).collect()[0][0]
    assert agg == sum(i for i in range(40) if i % 2 == 0)


def test_avro_rejects_drift_and_bad_codec(spark, tmp_path):
    import pytest

    from pipeline_dataengineer_spark.sources.avro import read_avro

    d = tmp_path / "avro"
    d.mkdir()
    write_avro_container(d / "a.avro", SCHEMA, _recs(0, 3))
    other = dict(SCHEMA, fields=SCHEMA["fields"][:2])
    write_avro_container(d / "b.avro", other, [{"id": 1, "title": "x"}])
    with pytest.raises(Exception, match="drift"):
        read_avro(spark, str(d)).collect()

    snappy = tmp_path / "s"
    snappy.mkdir()
    write_avro_container(snappy / "c.avro", SCHEMA, _recs(0, 2), codec="snappy")
    with pytest.raises(Exception, match="codec"):
        read_avro(spark, str(snappy)).collect()
