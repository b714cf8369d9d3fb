"""Skew operators: salted results must equal unsalted results."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline_dataengineer_spark.operators.skew import salted_groupby_sum, salted_join


def test_salted_agg_equals_plain(spark):
    # 90% of rows share one hot key
    rows = [("hot" if i % 10 else f"k{i}", float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "k string, v double")
    plain = {
        (r["k"]): (round(r["s"], 6), r["c"])
        for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count("*").alias("c")).collect()
    }
    salted = {
        (r["k"]): (round(r["s"], 6), r["c"])
        for r in salted_groupby_sum(df, ["k"], {"s": "v"}, counts="c", salt=8).collect()
    }
    assert plain == salted


def test_salted_join_equals_plain(spark):
    big = spark.createDataFrame(
        [("hot" if i % 5 else f"k{i}", i) for i in range(500)], "k string, v long"
    )
    small = spark.createDataFrame(
        [("hot", "H"), ("k5", "A"), ("k10", "B")], "k string, tag string"
    )
    plain = sorted(map(tuple, big.join(small, "k").collect()))
    salted = sorted(map(tuple, salted_join(big, small, on="k", salt=4).select("k", "v", "tag").collect()))
    assert plain == salted
