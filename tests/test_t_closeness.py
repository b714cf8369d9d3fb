"""t-closeness audit (operators/privacy.py:t_closeness_report)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline_dataengineer_spark.operators.privacy import t_closeness_report


def _fixture(spark):
    rows = (
        [("A", 0)] * 4 + [("B", 1)] * 4 + [("C", 0)] * 2 + [("C", 1)] * 2
    )
    return spark.createDataFrame(rows, "cls string, v long")


def test_t_closeness_known_values(spark):
    # global: v=0 and v=1 at 6/12 each, m=2. A is all-0 (t=0.5 by
    # hand: |4*12-6*4| / (4*12*1)), B mirrors it, C matches global
    # exactly (t=0).
    out = {
        r["cls"]: (r["class_size"], r["t"])
        for r in t_closeness_report(_fixture(spark), ["cls"], "v").collect()
    }
    assert out == {"A": (4, 0.5), "B": (4, 0.5), "C": (4, 0.0)}


def test_t_closeness_null_sensitive_excluded(spark):
    df = _fixture(spark).union(
        spark.createDataFrame([("A", None)], "cls string, v long")
    )
    out = {r["cls"]: r["t"] for r in t_closeness_report(df, ["cls"], "v").collect()}
    assert out["A"] == 0.5  # the NULL row neither counts nor crashes


def test_t_closeness_single_value_domain(spark):
    df = spark.createDataFrame([("A", 7), ("B", 7)], "cls string, v long")
    out = t_closeness_report(df, ["cls"], "v").collect()
    assert all(r["t"] == 0.0 for r in out)
