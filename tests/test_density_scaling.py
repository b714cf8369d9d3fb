"""Tests: DBSCAN density clustering, item-item similarity, rolling
z-score outliers, and per-group feature scaling."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pipeline_dataengineer_spark.operators.graph import item_similarity
from pipeline_dataengineer_spark.operators.scaling import scale_features
from pipeline_dataengineer_spark.operators.spatial import dbscan
from pipeline_dataengineer_spark.operators.timeseries import (
    rolling_zscore_outliers,
)


# ------------------------------------------------------------------ dbscan
def test_dbscan_two_blobs_and_noise(spark):
    # blob A around (0,0), blob B around (10,10), lone noise point
    rows = [
        (1, 0.0, 0.0), (2, 0.5, 0.0), (3, 0.0, 0.5), (4, 0.4, 0.4),
        (10, 10.0, 10.0), (11, 10.5, 10.0), (12, 10.0, 10.5),
        (99, 5.0, 5.0),
    ]
    pts = spark.createDataFrame(rows, "pid long, x double, y double")
    out = {
        r["pid"]: (r["cluster"], r["role"])
        for r in dbscan(pts, "pid", ("x", "y"), eps=1.0, min_pts=3).collect()
    }
    assert len(out) == 8  # total over input
    assert {out[i] for i in (1, 2, 3, 4)} == {(1, "core")}
    assert {out[i] for i in (10, 11, 12)} == {(10, "core")}
    assert out[99] == (None, "noise")


def test_dbscan_border_point(spark):
    # chain: 3 mutual core points + one point only reachable from one
    # core (degree 2 incl. self < min_pts=3 → border, inherits cluster)
    rows = [(1, 0.0, 0.0), (2, 0.5, 0.0), (3, 0.25, 0.4), (4, 1.4, 0.0)]
    pts = spark.createDataFrame(rows, "pid long, x double, y double")
    out = {
        r["pid"]: (r["cluster"], r["role"])
        for r in dbscan(pts, "pid", ("x", "y"), eps=1.0, min_pts=3).collect()
    }
    assert out[1] == (1, "core") and out[2] == (1, "core") and out[3] == (1, "core")
    assert out[4] == (1, "border")


def test_dbscan_singleton_core_cluster(spark):
    # min_pts=1: every point is core; isolated point forms its own
    # singleton cluster via the self-loop union
    pts = spark.createDataFrame(
        [(7, 0.0, 0.0), (8, 50.0, 50.0)], "pid long, x double, y double"
    )
    out = {
        r["pid"]: (r["cluster"], r["role"])
        for r in dbscan(pts, "pid", ("x", "y"), eps=1.0, min_pts=1).collect()
    }
    assert out == {7: (7, "core"), 8: (8, "core")}


# --------------------------------------------------------- item similarity
def test_item_similarity_cosine(spark):
    # baskets: {a,b}, {a,b}, {a,c} → n_a=3, n_b=2, n_c=1
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c")]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = {
        (r["item_a"], r["item_b"]): (r["n_baskets"], r["sim"])
        for r in item_similarity(df, "basket", "item").collect()
    }
    assert got[("a", "b")] == (2, round(2 / math.sqrt(3 * 2), 6))
    assert got[("a", "c")] == (1, round(1 / math.sqrt(3 * 1), 6))
    assert ("b", "c") not in got


# ----------------------------------------------------------- rolling z
def test_rolling_zscore_flags_spike_not_history(spark):
    vals = [10.0, 11.0, 9.0, 10.0, 11.0, 9.0, 10.0, 100.0, 10.0]
    rows = [(1, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, t long, v double")
    out = {
        r["t"]: (r["zscore"], r["is_outlier"])
        for r in rolling_zscore_outliers(
            df, ["k"], "t", "v", window=20, threshold=3.0, min_history=5
        ).collect()
    }
    # rows 0-4: insufficient history → NULL z, not outliers
    for t in range(5):
        assert out[t] == (None, False)
    assert out[7][1] is True  # the spike
    assert out[5][1] is False and out[6][1] is False
    # the spike must not poison its own score (excluded from own frame)
    import statistics

    hist = vals[:7]
    expect = (100.0 - statistics.mean(hist)) / statistics.stdev(hist)
    assert abs(out[7][0] - round(expect, 4)) < 1e-9
    # zero-variance history → NULL z
    df2 = spark.createDataFrame(
        [(1, i, 5.0) for i in range(8)], "k long, t long, v double"
    )
    out2 = rolling_zscore_outliers(df2, ["k"], "t", "v", min_history=3).collect()
    assert all(r["zscore"] is None and r["is_outlier"] is False for r in out2)


# --------------------------------------------------------------- scaling
def test_scale_features_zscore_and_minmax(spark):
    df = spark.createDataFrame(
        [("g", 1.0, 5.0), ("g", 2.0, 5.0), ("g", 3.0, 5.0),
         ("h", 10.0, 1.0), ("h", 30.0, 2.0)],
        "g string, a double, b double",
    )
    z = {
        (r["g"], r["a"]): (r["a_scaled"], r["b_scaled"])
        for r in scale_features(df, ["a", "b"], ["g"], "zscore").collect()
    }
    assert z[("g", 2.0)][0] == 0.0
    assert z[("g", 3.0)][0] == 1.0  # (3-2)/1
    assert z[("g", 1.0)][1] is None  # constant column → NULL
    mm = {
        (r["g"], r["a"]): r["a_scaled"]
        for r in scale_features(df, ["a"], ["g"], "minmax").collect()
    }
    assert mm[("g", 1.0)] == 0.0 and mm[("g", 3.0)] == 1.0 and mm[("g", 2.0)] == 0.5
    assert mm[("h", 10.0)] == 0.0 and mm[("h", 30.0)] == 1.0
    # ungrouped path
    g = {
        r["a"]: r["a_scaled"]
        for r in scale_features(df, ["a"], None, "minmax").collect()
    }
    assert g[1.0] == 0.0 and g[30.0] == 1.0


def test_quantile_normalize_aligns_groups(spark):
    """Two differently-scaled groups end up with the same empirical
    distribution after mapping through the global grid."""
    import numpy as np

    from pipeline_dataengineer_spark.operators.scaling import (
        quantile_normalize,
    )

    rng = np.random.default_rng(2)
    rows = [("a", float(v)) for v in rng.normal(0, 1, 500)] + [
        ("b", float(v)) for v in rng.normal(50, 10, 500)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = quantile_normalize(df, ["g"], "v", grid=201).toPandas()
    qa = np.quantile(out[out.g == "a"]["v_qnorm"], [0.1, 0.5, 0.9])
    qb = np.quantile(out[out.g == "b"]["v_qnorm"], [0.1, 0.5, 0.9])
    assert np.allclose(qa, qb, atol=0.5)
    # order preserved within group
    sub = out[out.g == "a"].sort_values("v")
    assert (np.diff(sub["v_qnorm"]) >= -1e-12).all()


def test_quantile_normalize_approx_switch_fires(spark):
    from pipeline_dataengineer_spark.operators.scaling import (
        quantile_normalize,
    )

    df = spark.range(0, 5000).selectExpr(
        "CAST(id % 3 AS STRING) g", "CAST(id AS DOUBLE) v"
    )
    exact = quantile_normalize(df, ["g"], "v", grid=101)
    approx = quantile_normalize(
        df, ["g"], "v", grid=101, max_exact_rows=100
    )
    a = exact.agg(F.round(F.avg("v_qnorm"), 0)).collect()[0][0]
    b = approx.agg(F.round(F.avg("v_qnorm"), 0)).collect()[0][0]
    assert abs(a - b) <= 50  # sketch grid stays close to exact
