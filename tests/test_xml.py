"""Jar-free XML reader (sources/xml.py)."""

import pytest

from pipeline_dataengineer_spark.sources.xml import read_xml

BOOKS = """<catalog>
  <book id="b1" lang="en">
    <title>Spark at Scale</title>
    <author>Ada</author>
    <author>Grace</author>
    <price currency="USD">42.50</price>
  </book>
  <book id="b2">
    <title>Stream Processing</title>
    <author>Edsger</author>
    <price currency="EUR">31.00</price>
  </book>
</catalog>
"""

BOOKS2 = """<catalog>
  <book id="b3">
    <title>Lakehouse Notes</title>
    <author>Barbara</author>
    <price currency="GBP">17.90</price>
    <unknown>ignored</unknown>
  </book>
</catalog>
"""


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_read_xml_basic(spark, tmp_path):
    _write(tmp_path, "a.xml", BOOKS)
    df = read_xml(spark, str(tmp_path), "book")
    rows = {r["_id"]: r for r in df.collect()}
    assert set(rows) == {"b1", "b2"}
    assert rows["b1"]["title"] == "Spark at Scale"
    assert rows["b1"]["author"] == ["Ada", "Grace"]
    assert rows["b1"]["_lang"] == "en"
    assert rows["b2"]["_lang"] is None
    assert rows["b1"]["price"]["_currency"] == "USD"
    assert rows["b1"]["price"]["_VALUE"] == "42.50"


def test_read_xml_multiple_files_conform(spark, tmp_path):
    """Second file: missing _lang NULL-fills, unknown child ignored,
    single author lifts into the inferred array."""
    _write(tmp_path, "a.xml", BOOKS)
    _write(tmp_path, "b.xml", BOOKS2)
    df = read_xml(spark, str(tmp_path), "book")
    rows = {r["_id"]: r for r in df.collect()}
    assert set(rows) == {"b1", "b2", "b3"}
    assert rows["b3"]["author"] == ["Barbara"]
    assert rows["b3"]["_lang"] is None
    assert "unknown" not in df.columns


def test_read_xml_single_file_path(spark, tmp_path):
    p = _write(tmp_path, "only.xml", BOOKS)
    assert read_xml(spark, p, "book").count() == 2


def test_read_xml_scalar_rows(spark, tmp_path):
    _write(tmp_path, "t.xml", "<r><v>1</v><v>2</v><v></v></r>")
    df = read_xml(spark, str(tmp_path), "v")
    assert [r["_VALUE"] for r in df.collect()] == ["1", "2", None]


def test_read_xml_structural_drift_raises(spark, tmp_path):
    _write(tmp_path, "a.xml", "<r><row><x>1</x></row></r>")
    _write(tmp_path, "b.xml", '<r><row><x a="1"><y>2</y></x></row></r>')
    df = read_xml(spark, str(tmp_path), "row")
    with pytest.raises(Exception, match="expected text|shape"):
        df.collect()


def test_read_xml_no_rows_raises(spark, tmp_path):
    _write(tmp_path, "a.xml", "<r><x>1</x></r>")
    with pytest.raises(ValueError, match="no <book> elements"):
        read_xml(spark, str(tmp_path), "book")
