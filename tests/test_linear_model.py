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
