"""Regression tests for the round-5 ADVICE findings: tinyint/smallint
Count-Min keys (simpleString spelling regression), deterministic
propensity tie-break on equal control scores, try_divide in
lift_gains for zero-positive inputs, and ewma's documented
ignore_na=True NaN semantics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------------
# ADVICE #1 — Count-Min accepts tinyint/smallint key columns
# (Spark simpleString is "tinyint"/"smallint", not "byte"/"short")
# ------------------------------------------------------------------


@pytest.mark.parametrize("sql_type", ["tinyint", "smallint"])
def test_cm_small_integral_keys_sketchable(spark, sql_type):
    from pipeline_dataengineer_spark.functions.sketches import (
        cm_estimate,
        cm_states,
    )

    df = spark.createDataFrame(
        [(1,)] * 4 + [(2,)] * 2, "v int"
    ).select(F.col("v").cast(sql_type).alias("v"))
    assert df.schema["v"].dataType.simpleString() == sql_type
    state = cm_states(df, [], "v", depth=4, width=1 << 12)
    est = {
        r["v"]: r["est_count"]
        for r in cm_estimate(
            state, df.select("v").distinct(), "v", depth=4, width=1 << 12
        ).collect()
    }
    assert est == {1: 4, 2: 2}


# ------------------------------------------------------------------
# ADVICE #2 — propensity_match_att deterministic on tied scores
# ------------------------------------------------------------------


def test_propensity_tie_break_deterministic(spark):
    """Two controls share the nearest score; the struct(score,
    outcome) ordering picks max outcome on the below side and min
    outcome on the above side — every run, every partitioning."""
    from pipeline_dataengineer_spark.operators.causal import (
        propensity_match_att,
    )

    rows = [
        # (treat, outcome, score)
        (0, 5.0, 1.0),
        (0, 3.0, 1.0),  # tied below pair -> max outcome 5.0 wins
        (1, 9.0, 1.2),  # below gap .2 < above gap .8 -> matches 5.0
        (1, 6.0, 1.8),  # above gap .2 < below gap .8 -> matches 2.0
        (0, 7.0, 2.0),
        (0, 2.0, 2.0),  # tied above pair -> min outcome 2.0 wins
    ]
    df = spark.createDataFrame(rows, "t int, y double, s double")
    for reps in range(3):  # rerun: result must be identical
        out = propensity_match_att(
            df.repartition(4 + reps), "t", "y", "s"
        ).collect()[0]
        assert out["n_treated"] == 2
        assert out["n_matched"] == 2
        assert out["n_controls"] == 4
        # (9.0 - 5.0 + 6.0 - 2.0) / 2 = 4.0
        assert out["att"] == pytest.approx(4.0)
        assert out["mean_abs_score_gap"] == pytest.approx(0.2)


# ------------------------------------------------------------------
# ADVICE #3 — lift_gains degrades to NULL on zero positives
# ------------------------------------------------------------------


def test_lift_gains_zero_positives_null_not_error(spark):
    from pipeline_dataengineer_spark.operators.calibration import lift_gains

    df = spark.createDataFrame(
        [(i, float(i) / 10.0, 0) for i in range(20)],
        "id bigint, score double, label int",
    )
    rows = lift_gains(df, "score", "label", "id", n_buckets=4).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["pos"] == 0
        assert r["gain"] is None  # 0/0 -> NULL, not DIVIDE_BY_ZERO
        assert r["lift"] is None
        assert r["cum_rate"] == 0.0  # cum_n >= 1, well-defined


# ------------------------------------------------------------------
# ADVICE #4 — ewma NaN semantics: ignore_na=True, documented
# ------------------------------------------------------------------


def test_ewma_nan_ignore_na_true(spark):
    """NaN emits NaN and carries state unchanged — pandas
    ewm(adjust=False, ignore_na=True), NOT the renormalizing
    ignore_na=False default (1.5 here, not 5/3)."""
    from pipeline_dataengineer_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [("k", 0, 1.0), ("k", 1, float("nan")), ("k", 2, 2.0)],
        "key string, t int, v double",
    )
    out = {
        r["t"]: r["ewma"]
        for r in ewma(df, ["key"], "t", "v", alpha=0.5).collect()
    }
    assert out[0] == pytest.approx(1.0)
    # Arrow maps NaN -> null crossing the batch boundary; either
    # spelling marks the gap — the semantics under test is out[2]
    assert out[1] is None or math.isnan(out[1])
    assert out[2] == pytest.approx(1.5)  # 0.5*2 + 0.5*1, gap ignored

    import pandas as pd

    ref = (
        pd.Series([1.0, float("nan"), 2.0])
        .ewm(alpha=0.5, adjust=False, ignore_na=True)
        .mean()
    )
    assert out[2] == pytest.approx(ref.iloc[2])
    ref_renorm = (
        pd.Series([1.0, float("nan"), 2.0])
        .ewm(alpha=0.5, adjust=False, ignore_na=False)
        .mean()
    )
    assert out[2] != pytest.approx(ref_renorm.iloc[2])


# ------------------------------------------------------------------
# round-5 VERDICT item 7 — adamic_adar audited max_degree hub cap
# ------------------------------------------------------------------


def test_adamic_adar_max_degree_cap_fires(spark):
    from pipeline_dataengineer_spark.operators.graph import adamic_adar

    # star hub 0 <-> {1..8} plus a path 1-9-2 (middle 9, degree 2)
    edges = [(0, i) for i in range(1, 9)] + [(1, 9), (9, 2)]
    df = spark.createDataFrame(edges, "src int, dst int")

    full = adamic_adar(df, min_common=1)
    uncapped = {(r["u"], r["v"]): r["score"] for r in full.collect()}
    assert full.aa_audit == {
        "dropped_middles": 0,
        "max_dropped_degree": 0,
    }

    capped_df = adamic_adar(df, min_common=1, max_degree=4)
    capped = {
        (r["u"], r["v"]): r["score"] for r in capped_df.collect()
    }
    assert capped_df.aa_audit == {
        "dropped_middles": 1,  # the hub (degree 8)
        "max_dropped_degree": 8,
    }
    # wedges through the hub are gone; the degree-2 middle survives
    # with its ORIGINAL degree-based term (deg computed pre-cap)
    import math

    assert (1, 2) in capped
    assert capped[(1, 2)] == round(1.0 / math.log(2.0), 6)
    # hub-only pairs like (3, 4) disappear under the cap
    assert (3, 4) in uncapped and (3, 4) not in capped


# ------------------------------------------------------------------
# round-7 defensive sweep: the lorenz/bleu empty-input bug class
# (float(None)/arith(None) after a driver-side collect on empty or
# all-NULL input) audited across every collect()[0] site
# ------------------------------------------------------------------


def test_chi2_empty_input_degrades(spark):
    from pipeline_dataengineer_spark.operators.stats_tests import (
        chi2_association,
    )

    empty = spark.createDataFrame([], "a string, b string")
    row = chi2_association(empty, "a", "b").collect()[0]
    assert row["n"] == 0 and row["chi2"] is None


def test_histogram_empty_and_allnull_input(spark):
    from pipeline_dataengineer_spark.operators.profiling import histogram

    empty = spark.createDataFrame([], "v double")
    assert histogram(empty, "v", bins=4).collect() == []
    nulls = spark.createDataFrame([(None,), (None,)], "v double")
    got = histogram(nulls, "v", bins=4).collect()
    # all rows land in the NULL bin (-1); no TypeError on the bounds
    assert [(r["bin"], r["n"]) for r in got] == [(-1, 2)]


def test_gradient_fits_empty_input_raise_clearly(spark):
    import pytest

    from pipeline_dataengineer_spark.operators.linear_model import (
        logistic_gd,
        poisson_gd,
        quantile_regression_gd,
    )

    empty = spark.createDataFrame([], "x double, y double")
    with pytest.raises(ValueError, match="empty input"):
        logistic_gd(empty, ["x"], "y", iterations=1)
    with pytest.raises(ValueError, match="empty input"):
        quantile_regression_gd(empty, ["x"], "y", iterations=1)
    with pytest.raises(ValueError, match="empty input"):
        poisson_gd(empty, ["x"], "y", iterations=1)


def test_cox_ph_empty_input_raises_clearly(spark):
    import pytest

    from pipeline_dataengineer_spark.operators.survival import cox_ph

    empty = spark.createDataFrame([], "t double, e int, x double")
    with pytest.raises(ValueError, match="empty input"):
        cox_ph(empty, "t", "e", ["x"], iterations=1)
