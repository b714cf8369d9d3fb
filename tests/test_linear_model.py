"""Distributed logistic GD (operators/linear_model.py): learns a
separable rule, loss decreases with iterations, predict matches the
trained coefficients."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _toy(spark, n=400):
    # y = 1 iff x1 + x2 > 1 (plus a margin): cleanly learnable
    return spark.range(n).select(
        ((F.col("id") % 20) / 10.0).alias("x1"),
        ((F.floor(F.col("id") / 20) % 20) / 10.0).alias("x2"),
    ).withColumn(
        "y", ((F.col("x1") + F.col("x2")) > 2.0).cast("double")
    )


def test_logistic_gd_learns_separable_rule(spark):
    from pipeline_dataengineer_spark.operators.linear_model import (
        logistic_gd,
        logistic_predict,
    )

    df = _toy(spark)
    few = logistic_gd(df, ["x1", "x2"], "y", lr=1.0, iterations=3)
    many = logistic_gd(df, ["x1", "x2"], "y", lr=1.0, iterations=60)
    r3, r60 = few.collect()[0], many.collect()[0]
    assert r60["log_loss"] < r3["log_loss"]  # training progresses
    assert r60["log_loss"] < 0.35
    # decision direction learned: both weights positive, bias negative
    assert r60["w_x1"] > 0 and r60["w_x2"] > 0 and r60["bias"] < 0
    # predict reproduces sigmoid(b + w.x) for the trained row
    scored = logistic_predict(
        df, {"x1": r60["w_x1"], "x2": r60["w_x2"]}, r60["bias"]
    )
    row = scored.filter(
        (F.col("x1") == 1.9) & (F.col("x2") == 1.9)
    ).first()
    z = r60["bias"] + r60["w_x1"] * 1.9 + r60["w_x2"] * 1.9
    assert row["score"] == pytest.approx(
        1.0 / (1.0 + math.exp(-z)), abs=1e-6
    )
    # accuracy at 0.5 threshold beats 90% on the clean rule
    acc = scored.select(
        F.avg(
            ((F.col("score") > 0.5).cast("double") == F.col("y"))
            .cast("double")
        ).alias("a")
    ).collect()[0]["a"]
    assert acc > 0.9


def test_logistic_gd_l2_shrinks_weights(spark):
    from pipeline_dataengineer_spark.operators.linear_model import (
        logistic_gd,
    )

    df = _toy(spark)
    free = logistic_gd(df, ["x1", "x2"], "y", lr=1.0, iterations=40)
    reg = logistic_gd(
        df, ["x1", "x2"], "y", lr=1.0, l2=0.5, iterations=40
    )
    f, r = free.collect()[0], reg.collect()[0]
    assert abs(r["w_x1"]) < abs(f["w_x1"])
    assert abs(r["w_x2"]) < abs(f["w_x2"])


def test_logistic_gd_empty_features_raises(spark):
    from pipeline_dataengineer_spark.operators.linear_model import (
        logistic_gd,
    )

    with pytest.raises(ValueError, match="non-empty"):
        logistic_gd(_toy(spark), [], "y")


def test_quantile_regression_fits_conditional_quantiles(spark):
    """On y = x + noise-free spread, tau=0.9 fit sits above tau=0.1
    fit; pinball loss at tau=0.5 approaches the MAE/2 of the median
    line."""
    from pipeline_dataengineer_spark.operators.linear_model import (
        quantile_regression_gd,
    )

    # three y levels per x: x, x+1, x+2 (deterministic spread)
    df = spark.range(300).select(
        ((F.col("id") % 100) / 10.0).alias("x1"),
        (((F.col("id") % 100) / 10.0) + (F.col("id") % 3)).alias("y"),
    )
    lo = quantile_regression_gd(
        df, ["x1"], "y", tau=0.1, lr=0.3, iterations=200
    ).collect()[0]
    hi = quantile_regression_gd(
        df, ["x1"], "y", tau=0.9, lr=0.3, iterations=200
    ).collect()[0]
    # both slopes near 1; intercepts ordered by tau
    assert abs(lo["w_x1"] - 1.0) < 0.3
    assert abs(hi["w_x1"] - 1.0) < 0.3
    assert hi["bias"] > lo["bias"] + 0.5


def test_poisson_gd_recovers_log_link(spark):
    """y generated as exp(0.5 + 1.0*x) (deterministic): coefficients
    converge toward (1.0, 0.5) and deviance toward 0."""
    from pipeline_dataengineer_spark.operators.linear_model import (
        poisson_gd,
    )

    df = spark.range(200).select(
        ((F.col("id") % 50) / 50.0).alias("x1")
    ).withColumn("y", F.exp(0.5 + 1.0 * F.col("x1")))
    out = poisson_gd(
        df, ["x1"], "y", lr=0.3, iterations=400
    ).collect()[0]
    assert abs(out["w_x1"] - 1.0) < 0.05
    assert abs(out["bias"] - 0.5) < 0.05
    assert out["deviance"] < 0.01
