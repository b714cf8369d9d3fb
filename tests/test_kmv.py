"""KMV distinct sketch (functions/sketches.py kmv_* family).

Laws: exact below k; order-statistic estimate within theory error
above k; merge == single-pass identity; intersection estimate exact
below k and close above it.
"""

import pytest
from pyspark.sql import functions as F

from pipeline_dataengineer_spark.functions.sketches import (
    kmv_estimate,
    kmv_intersection,
    kmv_states,
    merge_kmv,
)


def _ids(spark, lo, hi, key="g"):
    return spark.range(lo, hi).select(
        F.lit(key).alias("k"), F.col("id").alias("v")
    )


def test_exact_below_k(spark):
    df = _ids(spark, 0, 500)
    est = kmv_estimate(kmv_states(df, ["k"], "v", k=1024), ["k"], k=1024)
    assert est.collect()[0]["approx_distinct"] == 500.0


def test_estimate_above_k(spark):
    n = 20000
    df = _ids(spark, 0, n)
    est = kmv_estimate(
        kmv_states(df, ["k"], "v", k=1024), ["k"], k=1024
    ).collect()[0]["approx_distinct"]
    assert est == pytest.approx(n, rel=0.12)  # ~3.5 sigma at k=1024


def test_duplicates_dont_count(spark):
    df = _ids(spark, 0, 300).union(_ids(spark, 0, 300)).union(
        _ids(spark, 100, 400)
    )
    est = kmv_estimate(kmv_states(df, ["k"], "v", k=1024), ["k"], k=1024)
    assert est.collect()[0]["approx_distinct"] == 400.0


def test_merge_is_single_pass_identity(spark):
    a = _ids(spark, 0, 3000)
    b = _ids(spark, 2000, 6000)
    merged = merge_kmv(
        kmv_states(a, ["k"], "v", k=512),
        kmv_states(b, ["k"], "v", k=512),
        keys=["k"],
        k=512,
    )
    single = kmv_states(a.union(b), ["k"], "v", k=512)
    assert (
        merged.collect()[0]["kmv"] == single.collect()[0]["kmv"]
    ), "merged k-min set must equal the single-pass k-min set"


def test_intersection_exact_below_k(spark):
    a = kmv_states(_ids(spark, 0, 400), ["k"], "v", k=1024)
    b = kmv_states(_ids(spark, 300, 700), ["k"], "v", k=1024)
    got = kmv_intersection(a, b, ["k"], k=1024).collect()[0][
        "approx_intersection"
    ]
    assert got == 100.0


def test_intersection_estimate_above_k(spark):
    a = kmv_states(_ids(spark, 0, 10000), ["k"], "v", k=1024)
    b = kmv_states(_ids(spark, 5000, 15000), ["k"], "v", k=1024)
    got = kmv_intersection(a, b, ["k"], k=1024).collect()[0][
        "approx_intersection"
    ]
    assert got == pytest.approx(5000, rel=0.25)


def test_per_key_states(spark):
    df = _ids(spark, 0, 100, "a").union(_ids(spark, 0, 250, "b"))
    est = {
        r["k"]: r["approx_distinct"]
        for r in kmv_estimate(
            kmv_states(df, ["k"], "v", k=1024), ["k"], k=1024
        ).collect()
    }
    assert est == {"a": 100.0, "b": 250.0}


def test_prefilter_fires_and_preserves_estimate(spark):
    """Low margin + low trigger: the hash-space prefilter engages
    (buffers bounded) and the estimate stays within tolerance; the
    k-min set equals the unfiltered computation's."""
    n = 30000
    df = _ids(spark, 0, n)
    guarded = kmv_states(
        df, ["k"], "v", k=256, salts=4, prefilter_margin=4.0
    )
    unfiltered = kmv_states(
        df, ["k"], "v", k=256, salts=4, prefilter_margin=1e12
    )
    a = guarded.collect()[0]["kmv"]
    b = unfiltered.collect()[0]["kmv"]
    assert a == b, "prefilter must not change the k-min set"
    est = kmv_estimate(guarded, ["k"], k=256).collect()[0]["approx_distinct"]
    assert est == pytest.approx(n, rel=0.25)
