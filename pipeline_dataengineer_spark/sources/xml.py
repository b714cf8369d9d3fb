"""XML source reader — pure stdlib, no spark-xml jar.

Spark's XML support (``spark-xml`` / built-in ``format("xml")`` in
Databricks images) is another external-jar surface absent from this
container, same class as Kafka and Avro. XML itself is stdlib
territory (``xml.etree.ElementTree``), so ingestion follows the
established jar-free pattern of ``sources/avro.py`` and
``sources/warc.py``: ``binaryFile`` scan → ``mapInPandas`` per-file
parse → Arrow batches out with a real nested Spark schema.

Mapping (spark-xml conventions):

- every element matching ``row_tag`` becomes a row;
- attributes become ``_name`` string fields (``attr_prefix``);
- a child element with no attributes/children becomes a string field
  (empty/whitespace text → NULL);
- a child with structure becomes a nested struct; text alongside
  structure lands in ``_VALUE``;
- a child tag repeated within one row becomes an array.

Schema is inferred from the FIRST file driver-side (all leaves are
strings — casts are the caller's, as with spark-xml's
inferSchema=false); later files conform to it: missing fields
NULL-fill, unknown fields are ignored, a field that changes SHAPE
(scalar vs struct vs array) raises in its task — silent coercion of
structural drift hides feed breakage.

Scale shape: one task per file (binaryFile), DOM parse per file —
files parallelize N-wide; the honest cost of a document format, and
like Avro/WARC the reader exists to ingest upstream XML into parquet
stage tables, not to serve queries off XML.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from xml.etree import ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_VALUE = "_VALUE"


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _elem_to_value(elem: ET.Element, attr_prefix: str):
    """Element → str | dict (attrs + children; repeated tag → list)."""
    text = (elem.text or "").strip() or None
    if not elem.attrib and len(elem) == 0:
        return text
    out: dict = {attr_prefix + _strip_ns(k): v for k, v in elem.attrib.items()}
    seen: dict[str, list] = {}
    for child in elem:
        seen.setdefault(_strip_ns(child.tag), []).append(
            _elem_to_value(child, attr_prefix)
        )
    for tag, vals in seen.items():
        out[tag] = vals if len(vals) > 1 else vals[0]
    if text is not None:
        out[_VALUE] = text
    return out


def _merge_type(a, b):
    """Merge two inferred shapes ('str' | dict | ['list', elem])."""
    if a is None:
        return b
    if b is None:
        return a
    kinds = {_kind(a), _kind(b)}
    if kinds == {"str"}:
        return "str"
    if kinds == {"dict"}:
        keys = set(a) | set(b)
        return {k: _merge_type(a.get(k), b.get(k)) for k in keys}
    if kinds == {"list"}:
        return ["list", _merge_type(a[1], b[1])]
    if "list" in kinds:  # scalar/struct promoted into the array
        lst = a if _kind(a) == "list" else b
        other = b if _kind(a) == "list" else a
        return ["list", _merge_type(lst[1], other)]
    raise ValueError(f"XML field shape conflict: {a!r} vs {b!r}")


def _kind(t) -> str:
    if t == "str" or isinstance(t, str):
        return "str"
    if isinstance(t, dict):
        return "dict"
    if isinstance(t, list):
        return "list"
    raise ValueError(f"bad shape {t!r}")


def _infer_shape(value):
    if value is None or isinstance(value, str):
        return "str" if isinstance(value, str) else None
    if isinstance(value, dict):
        return {k: _infer_shape(v) for k, v in value.items()}
    if isinstance(value, list):
        t = None
        for v in value:
            t = _merge_type(t, _infer_shape(v))
        return ["list", t or "str"]
    raise ValueError(f"unexpected XML value {value!r}")


def _shape_to_spark(shape) -> T.DataType:
    if shape is None or _kind(shape) == "str":
        return T.StringType()
    if _kind(shape) == "dict":
        return T.StructType(
            [
                T.StructField(k, _shape_to_spark(v))
                for k, v in sorted(shape.items())
            ]
        )
    return T.ArrayType(_shape_to_spark(shape[1]))


def _conform(value, dtype: T.DataType):
    """Project a parsed value into the inferred schema: NULL-fill
    missing struct fields, ignore unknowns, lift single values into
    arrays; structural mismatch raises."""
    if value is None:
        return None
    if isinstance(dtype, T.StringType):
        if isinstance(value, str):
            return value
        raise ValueError(f"expected text, found structure: {value!r}")
    if isinstance(dtype, T.ArrayType):
        vals = value if isinstance(value, list) else [value]
        return [_conform(v, dtype.elementType) for v in vals]
    if isinstance(dtype, T.StructType):
        if not isinstance(value, dict):
            raise ValueError(f"expected structure, found: {value!r}")
        return {f.name: _conform(value.get(f.name), f.dataType) for f in dtype.fields}
    raise ValueError(f"unsupported type {dtype}")


def _parse_rows(payload: bytes, row_tag: str, attr_prefix: str) -> list:
    root = ET.fromstring(payload)
    matches = (
        [root] if _strip_ns(root.tag) == row_tag else list(root.iter())
    )
    out = []
    for el in matches:
        if _strip_ns(el.tag) == row_tag:
            out.append(_elem_to_value(el, attr_prefix))
    return out


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    glob: str = "*.xml",
    attr_prefix: str = "_",
) -> DataFrame:
    """Directory (or single file) of XML documents → DataFrame, one
    row per ``row_tag`` element."""
    import glob as globmod

    import pandas as pd

    probe = sorted(
        globmod.glob(os.path.join(path, glob))
        if os.path.isdir(path)
        else [path]
    )
    if not probe:
        raise FileNotFoundError(f"no XML files under {path!r}")
    with open(probe[0], "rb") as fh:
        first_rows = _parse_rows(fh.read(), row_tag, attr_prefix)
    if not first_rows:
        raise ValueError(f"no <{row_tag}> elements in {probe[0]!r}")
    shape = None
    for r in first_rows:
        shape = _merge_type(shape, _infer_shape(r))
    if _kind(shape) == "str":
        spark_schema = T.StructType([T.StructField(_VALUE, T.StringType())])
        wrap = True
    else:
        spark_schema = _shape_to_spark(shape)
        wrap = False
    field_types = [(f.name, f.dataType) for f in spark_schema.fields]

    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob if os.path.isdir(path) else "*")
        .load(path)
        .select("content")
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for payload in pdf["content"]:
                for raw in _parse_rows(bytes(payload), row_tag, attr_prefix):
                    if wrap:
                        recs.append([raw])
                    else:
                        if not isinstance(raw, dict):
                            raise ValueError(
                                f"<{row_tag}> shape drift: scalar row {raw!r}"
                            )
                        recs.append(
                            [_conform(raw.get(n), t) for n, t in field_types]
                        )
            yield pd.DataFrame(recs, columns=[n for n, _ in field_types])

    return binary.mapInPandas(op, spark_schema)
