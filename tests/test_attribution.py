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
