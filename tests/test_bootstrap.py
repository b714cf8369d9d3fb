"""Deterministic Poisson bootstrap CIs."""

from __future__ import annotations

import math

from pipeline_dataengineer_spark.operators.bootstrap import (
    POISSON1_CDF,
    bootstrap_mean_ci,
)


def test_poisson_cdf_ladder_is_poisson1():
    # thresholds must be the partial sums of e^-1/k!
    acc = 0.0
    for k, c in enumerate(POISSON1_CDF):
        acc += math.exp(-1) / math.factorial(k)
        assert abs(c - acc) < 1e-15


def test_ci_brackets_mean_and_narrows_with_n(spark):
    rows = [("g", i, 100.0 + (i % 21) - 10) for i in range(400)]
    df = spark.createDataFrame(rows, ["g", "id", "v"])
    r = bootstrap_mean_ci(df, ["g"], "id", "v", n_replicates=100).collect()[0]
    assert r["ci_lo"] <= r["mean"] <= r["ci_hi"]
    # sd ~ 6.06/sqrt(400) ≈ 0.30 → 95% CI halfwidth ≈ 0.6, assert sane
    assert r["ci_hi"] - r["ci_lo"] < 2.5
    assert r["n_replicates_used"] == 100

    small = spark.createDataFrame(rows[:25], ["g", "id", "v"])
    rs = bootstrap_mean_ci(small, ["g"], "id", "v", n_replicates=100).collect()[0]
    assert (rs["ci_hi"] - rs["ci_lo"]) > (r["ci_hi"] - r["ci_lo"])


def test_deterministic_across_runs(spark):
    rows = [("a", i, float(i)) for i in range(50)] + [
        ("b", i, float(i * 2)) for i in range(50, 90)
    ]
    df = spark.createDataFrame(rows, ["g", "id", "v"])
    r1 = sorted(map(tuple, bootstrap_mean_ci(df, ["g"], "id", "v", 50).collect()))
    r2 = sorted(map(tuple, bootstrap_mean_ci(df, ["g"], "id", "v", 50).collect()))
    assert r1 == r2


def test_single_row_group_zero_weight_replicates_degrade(spark):
    """A 1-row group zeroes ~37% of replicates' Poisson weights; those
    replicates must yield the documented NULL mean (excluded from the
    percentile and from n_replicates_used), not DIVIDE_BY_ZERO."""
    df = spark.createDataFrame([("g", 1, 5.0)], ["g", "id", "v"])
    r = bootstrap_mean_ci(df, ["g"], "id", "v", n_replicates=60).collect()[0]
    assert r["mean"] == 5.0
    assert 0 < r["n_replicates_used"] < 60  # some replicates dropped
    assert r["ci_lo"] == r["ci_hi"] == 5.0  # only one value exists
