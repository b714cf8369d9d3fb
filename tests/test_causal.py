"""Causal estimators (operators/causal.py): matching picks the true
nearest control, caliper drops far pairs, DiD recovers a planted
effect."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_propensity_match_nearest_and_caliper(spark):
    from pipeline_dataengineer_spark.operators.causal import (
        propensity_match_att,
    )

    # controls at scores .1/.2/.4 with outcomes 10/20/40; treated at
    # .19 (nearest .2) and .31 (nearest .4 at distance .09)
    rows = [
        (0, 10.0, 0.10), (0, 20.0, 0.20), (0, 40.0, 0.40),
        (1, 25.0, 0.19), (1, 50.0, 0.31),
    ]
    df = spark.createDataFrame(rows, "tr int, y double, s double")
    out = propensity_match_att(df, "tr", "y", "s").collect()[0]
    assert out["n_treated"] == 2 and out["n_controls"] == 3
    assert out["n_matched"] == 2
    # ATT = mean( (25-20), (50-40) ) = 7.5
    assert out["att"] == pytest.approx(7.5)
    # tight caliper drops the .09-distance pair, keeps the .01 one
    tight = propensity_match_att(
        df, "tr", "y", "s", caliper=0.05
    ).collect()[0]
    assert tight["n_matched"] == 1
    assert tight["att"] == pytest.approx(5.0)


def test_propensity_match_ties_prefer_below_and_no_controls(spark):
    from pipeline_dataengineer_spark.operators.causal import (
        propensity_match_att,
    )

    # equidistant controls: below wins (documented d_below <= d_above).
    # scores are powers of two so both distances are EXACTLY 0.25 —
    # 0.1/0.2/0.3 would leave d_above one ulp short and flip the pick
    rows = [(0, 10.0, 0.25), (0, 30.0, 0.75), (1, 99.0, 0.50)]
    df = spark.createDataFrame(rows, "tr int, y double, s double")
    out = propensity_match_att(df, "tr", "y", "s").collect()[0]
    assert out["att"] == pytest.approx(99.0 - 10.0)

    only_treated = spark.createDataFrame(
        [(1, 5.0, 0.5)], "tr int, y double, s double"
    )
    empty = propensity_match_att(
        only_treated, "tr", "y", "s"
    ).collect()[0]
    assert empty["n_matched"] == 0 and empty["att"] is None


def test_diff_in_diff_recovers_planted_effect(spark):
    from pipeline_dataengineer_spark.operators.causal import diff_in_diff

    # common trend +2 post; treatment adds +5 on top for treated-post
    rows = []
    for i in range(50):
        base = 10.0 + (i % 5) / 10.0
        rows += [
            (0, 0, base), (0, 1, base + 2.0),
            (1, 0, base + 1.0), (1, 1, base + 1.0 + 2.0 + 5.0),
        ]
    df = spark.createDataFrame(rows, "tr int, post int, y double")
    out = diff_in_diff(df, "tr", "post", "y").collect()[0]
    assert out["did"] == pytest.approx(5.0)
    assert out["n_treat"] == 100 and out["n_ctrl"] == 100
    # planted effect is exact, so z is huge
    assert out["z"] > 50


def test_diff_in_diff_empty_cell_degrades_to_null(spark):
    """A design with an empty cell (no control-pre rows) must return
    NULL did/se/z, not raise DIVIDE_BY_ZERO on the 0-count cell."""
    from pipeline_dataengineer_spark.operators.causal import diff_in_diff

    rows = [
        (1, 0, 1.0), (1, 0, 2.0), (1, 1, 5.0), (1, 1, 6.0),
        (0, 1, 2.0), (0, 1, 3.0),  # no (0, 0) rows at all
    ]
    df = spark.createDataFrame(rows, "tr int, post int, y double")
    out = diff_in_diff(df, "tr", "post", "y").collect()[0]
    assert out["did"] is None and out["se"] is None


def test_aipw_recovers_effect_under_confounding(spark):
    """Treatment assignment depends on x; naive difference-in-means
    is biased, AIPW lands near the planted effect; both arms
    required."""
    import pytest
    from pyspark.sql import functions as F

    from pipeline_dataengineer_spark.operators.causal import aipw_ate

    n = 4000
    base = spark.range(n).select(
        (F.col("id") % 100 / 100.0).alias("x"),
        ((F.col("id") % 100 + F.col("id") % 7) % 2 == 0)
        .cast("int")
        .alias("t"),
    )
    df = base.select(
        "x",
        "t",
        (F.col("x") * 3.0 + F.col("t") * 1.5
         + (F.col("x") * 100).cast("long") % 5 / 10.0).alias("y"),
    )
    r = aipw_ate(df, "t", "y", ["x"]).collect()[0]
    assert abs(r["ate_aipw"] - 1.5) < 0.15
    assert r["n"] == n and 0 < r["n_treat"] < n

    one_arm = df.filter(F.col("t") == 1)
    with pytest.raises(ValueError, match="both treatment arms"):
        aipw_ate(one_arm, "t", "y", ["x"])
