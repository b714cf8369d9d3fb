"""Exact per-group fixed-count sample (operators/sampling.py:
group_sample): equals the naive full-rank definition on every input,
including when the prefilter comes up short and the guard fires."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from pipeline_dataengineer_spark.operators.sampling import (
    group_sample,
    portable_bucket,
)


def _naive(df, keys, id_col, k):
    w = Window.partitionBy(*keys).orderBy(
        portable_bucket(F.col(id_col), 1_000_000), id_col
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_group_sample_equals_definition(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") % 7).alias("g"), F.col("id").alias("id")
    )
    got = group_sample(df, ["g"], "id", k=25)
    want = _naive(df, ["g"], "id", 25)
    assert _rows(got) == _rows(want)
    sizes = got.groupBy("g").count().collect()
    assert all(r["count"] == 25 for r in sizes)


def test_group_sample_small_groups_kept_whole(spark):
    df = spark.range(0, 30).select(
        (F.col("id") % 10).alias("g"), F.col("id").alias("id")
    )
    got = group_sample(df, ["g"], "id", k=50)
    assert _rows(got) == _rows(df)


def test_group_sample_guard_fires_exactly(spark):
    """oversample=1.0 with tiny k makes the prefilter routinely
    short; the guard must still produce the exact defined sample."""
    df = spark.range(0, 2000).select(
        (F.col("id") % 3).alias("g"), F.col("id").alias("id")
    )
    got = group_sample(df, ["g"], "id", k=5, oversample=1.0)
    want = _naive(df, ["g"], "id", 5)
    assert _rows(got) == _rows(want)


def test_group_sample_layout_stable(spark):
    df = spark.range(0, 3000).select(
        (F.col("id") % 4).alias("g"), F.col("id").alias("id")
    )
    a = group_sample(df.repartition(17), ["g"], "id", k=10)
    b = group_sample(df.coalesce(1), ["g"], "id", k=10)
    assert _rows(a) == _rows(b)
