"""Conversion attribution models."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline_dataengineer_spark.operators.attribution import (
    linear_attribution,
    touch_attribution,
)

ROWS = [
    # user A: view, click, PURCHASE, view, PURCHASE, PURCHASE
    ("A", 1, "view"), ("A", 2, "click"), ("A", 3, "purchase"),
    ("A", 4, "view"), ("A", 5, "purchase"), ("A", 6, "purchase"),
    # user B: touches but no conversion
    ("B", 1, "view"), ("B", 2, "click"),
    # user C: conversion with no preceding touch
    ("C", 1, "purchase"),
]


def _df(spark):
    return spark.createDataFrame(ROWS, ["u", "t", "ch"])


def test_first_last_touch(spark):
    out = touch_attribution(
        _df(spark), ["u"], "t", "ch", F.col("ch") == "purchase"
    ).collect()
    got = {(r["u"], r["t"]): (r["first_touch"], r["last_touch"]) for r in out}
    assert got == {
        ("A", 3): ("view", "click"),
        ("A", 5): ("view", "view"),   # journey 2's view is most recent
        ("A", 6): ("view", "view"),
        ("C", 1): (None, None),       # nothing to credit
    }


def test_linear_attribution_splits_per_journey(spark):
    out = linear_attribution(
        _df(spark), ["u"], "t", "ch", F.col("ch") == "purchase"
    ).collect()
    got = {r["ch"]: r["credit"] for r in out}
    # journey 1 (view, click -> purchase): 0.5 each
    # journey 2 (view -> purchase): 1.0 to view
    # journey 3 (no touches -> purchase): dropped
    # user B never converts: nothing
    assert got == {"view": 1.5, "click": 0.5}


def test_position_attribution_u_shape(spark):
    from pipeline_dataengineer_spark.operators.attribution import (
        position_attribution,
    )

    # one user, one journey: touches A B C D then conversion
    rows = [(1, i + 1, ch) for i, ch in enumerate("ABCD")] + [(1, 5, "CONV")]
    df = spark.createDataFrame(rows, "u long, ord long, ch string")
    out = {
        r["ch"]: r["credit"]
        for r in position_attribution(
            df, ["u"], "ord", "ch", F.col("ch") == "CONV"
        ).collect()
    }
    assert out == {"A": 0.4, "B": 0.1, "C": 0.1, "D": 0.4}
    # one-touch journey: full credit; two-touch: renormalized halves
    df1 = spark.createDataFrame(
        [(2, 1, "X"), (2, 2, "CONV"), (3, 1, "Y"), (3, 2, "Z"), (3, 3, "CONV")],
        "u long, ord long, ch string",
    )
    out1 = {
        r["ch"]: r["credit"]
        for r in position_attribution(
            df1, ["u"], "ord", "ch", F.col("ch") == "CONV"
        ).collect()
    }
    assert out1 == {"X": 1.0, "Y": 0.5, "Z": 0.5}


def test_time_decay_attribution_recency_bias(spark):
    from pipeline_dataengineer_spark.operators.attribution import (
        time_decay_attribution,
    )

    # touches at t=0 and t=100, conversion at t=200, half-life 100:
    # weights 0.5^2 : 0.5^1 = 0.25 : 0.5 -> credits 1/3 : 2/3
    df = spark.createDataFrame(
        [(1, 0, "old"), (1, 100, "recent"), (1, 200, "CONV")],
        "u long, t long, ch string",
    )
    out = {
        r["ch"]: r["credit"]
        for r in time_decay_attribution(
            df, ["u"], "t", "ch", F.col("ch") == "CONV",
            half_life_seconds=100.0,
        ).collect()
    }
    assert out == {"old": round(1 / 3, 4), "recent": round(2 / 3, 4)}
    # journeys pay out exactly 1.0 total
    assert round(sum(out.values()), 4) == 1.0


def test_markov_attribution_removal_effects(spark):
    from pipeline_dataengineer_spark.operators.attribution import (
        markov_attribution,
    )

    # 2 converting journeys through A, 1 through B, 1 B journey drops:
    # removing A kills 2/3 of conversions; removing B kills 1/3 of
    # the converting mass but B also carries a drop
    rows = [
        (1, 1, "A"), (1, 2, "CONV"),
        (2, 1, "A"), (2, 2, "CONV"),
        (3, 1, "B"), (3, 2, "CONV"),
        (4, 1, "B"),                      # never converts
    ]
    df = spark.createDataFrame(rows, "u long, o long, ch string")
    out = {
        r["ch"]: (r["removal_effect"], r["credit"])
        for r in markov_attribution(
            df, ["u"], "o", "ch", F.col("ch") == "CONV"
        ).collect()
    }
    # base conv prob = 3/4. Remove A -> only B path: P(conv) = (2/4)*(1/2) = 1/4
    # effect_A = 1 - (1/4)/(3/4) = 2/3. Remove B -> (2/4)*1 = 1/2; effect_B = 1/3
    assert out["A"][0] == round(2 / 3, 4)
    assert out["B"][0] == round(1 / 3, 4)
    # credits normalize to total conversions (3)
    assert round(out["A"][1] + out["B"][1], 3) == 3.0
    assert out["A"][1] == 2.0 and out["B"][1] == 1.0


def test_shapley_attribution_properties(spark):
    import pytest

    from pipeline_dataengineer_spark.operators.attribution import (
        shapley_attribution,
    )

    # u1: A only -> converts; u2: B only -> converts; u3: A+B ->
    # converts; u4: A only, no conversion; u5: converts with no touch
    rows = (
        [(1, "A"), (1, "buy"), (2, "B"), (2, "buy")]
        + [(3, "A"), (3, "B"), (3, "buy")]
        + [(4, "A")]
        + [(5, "buy")]
    )
    df = spark.createDataFrame(rows, "u long, ch string")
    got = {
        r["ch"]: r["shapley"]
        for r in shapley_attribution(df, "u", "ch", "buy").collect()
    }
    # v({A})=1(+v∅), v({B})=1(+v∅), v({A,B})=3(+v∅), v(∅)=1
    # φ_A = ½(v(A)−v(∅)) + ½(v(AB)−v(B)) = ½(1) + ½(2) = 1.5 = φ_B
    assert got["A"] == pytest.approx(1.5)
    assert got["B"] == pytest.approx(1.5)
    # efficiency: credit sums to v(C) − v(∅) = 4 − 1
    assert sum(got.values()) == pytest.approx(3.0)

    with pytest.raises(ValueError):
        shapley_attribution(df, "u", "ch", "buy", max_channels=1)
    only_conv = spark.createDataFrame([(1, "buy")], "u long, ch string")
    with pytest.raises(ValueError):
        shapley_attribution(only_conv, "u", "ch", "buy")
