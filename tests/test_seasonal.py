"""seasonal_decompose (operators/timeseries.py): recovers a planted
trend + seasonal signal; edge NULLs; even-period double MA; additive
identity value == trend + seasonal + resid wherever defined."""

import math

import pytest
from pyspark.sql import functions as F

from pipeline_dataengineer_spark.operators.timeseries import (
    seasonal_decompose,
)


def _series(spark, n=70, period=7, key="a"):
    rows = []
    seas = [10.0, -5.0, 3.0, 0.0, -4.0, 2.0, -6.0]
    for t in range(n):
        v = 100.0 + 0.5 * t + seas[t % period]
        rows.append((key, t, v))
    return spark.createDataFrame(rows, "k string, t long, v double")


def test_recovers_planted_signal(spark):
    df = _series(spark)
    out = seasonal_decompose(df, ["k"], "t", "v", period=7).collect()
    by_t = {r["t"]: r for r in out}
    # edges: first/last 3 rows have NULL trend/resid
    for t in (0, 1, 2, 67, 68, 69):
        assert by_t[t]["trend"] is None and by_t[t]["resid"] is None
    # interior: MA(7) of linear trend + zero-mean weekly seasonal is
    # the trend itself; resid ~ 0
    for t in range(3, 67):
        assert by_t[t]["trend"] == pytest.approx(100.0 + 0.5 * t, abs=1e-6)
        assert abs(by_t[t]["resid"]) < 0.2
    # seasonal phase profile matches the planted one up to centering
    seas = [10.0, -5.0, 3.0, 0.0, -4.0, 2.0, -6.0]
    c = sum(seas) / 7
    for t in range(3, 67):
        assert by_t[t]["seasonal"] == pytest.approx(
            seas[t % 7] - c, abs=0.2
        )


def test_additive_identity(spark):
    df = _series(spark, n=40)
    out = seasonal_decompose(df, ["k"], "t", "v", period=7)
    bad = out.filter(
        F.col("trend").isNotNull()
        & (
            F.abs(
                F.col("v")
                - (F.col("trend") + F.col("seasonal") + F.col("resid"))
            )
            > 1e-9
        )
    ).count()
    assert bad == 0


def test_even_period_double_ma(spark):
    rows = [("a", t, 50.0 + (5.0 if t % 4 == 0 else -1.0)) for t in range(24)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    out = {r["t"]: r for r in seasonal_decompose(df, ["k"], "t", "v", 4).collect()}
    # 2x4 MA of a pure period-4 signal is the constant mean
    mean = (5.0 + 3 * -1.0) / 4 + 50.0
    for t in range(2, 22):
        assert out[t]["trend"] == pytest.approx(mean, abs=1e-9)
    assert out[0]["trend"] is None and out[23]["trend"] is None


def test_multiple_keys_independent(spark):
    df = _series(spark, n=30, key="a").union(
        _series(spark, n=30, key="b").withColumn("v", F.col("v") * 2)
    )
    out = seasonal_decompose(df, ["k"], "t", "v", period=7)
    a = {r["t"]: r["trend"] for r in out.filter("k = 'a'").collect()}
    b = {r["t"]: r["trend"] for r in out.filter("k = 'b'").collect()}
    for t in range(3, 27):
        assert b[t] == pytest.approx(2 * a[t], rel=1e-12)
