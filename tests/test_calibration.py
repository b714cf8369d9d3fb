"""Isotonic regression (operators/calibration.py): monotonicity,
mean preservation, exactness on monotone input, pooling law vs an
independent O(n^2) reference implementation, tie handling."""

import random

import numpy as np
import pytest

from pipeline_dataengineer_spark.operators.calibration import (
    isotonic_regression,
)


def _ref_pav(y, w):
    """Independent quadratic reference: repeatedly merge any adjacent
    violating blocks until monotone."""
    blocks = [[wi, wi * yi, [i]] for i, (yi, wi) in enumerate(zip(y, w))]
    changed = True
    while changed:
        changed = False
        for i in range(len(blocks) - 1):
            if blocks[i][1] / blocks[i][0] > blocks[i + 1][1] / blocks[i + 1][0] + 1e-15:
                a, b = blocks[i], blocks[i + 1]
                blocks[i : i + 2] = [[a[0] + b[0], a[1] + b[1], a[2] + b[2]]]
                changed = True
                break
    out = np.empty(len(y))
    for bw, bwy, idx in blocks:
        out[idx] = bwy / bw
    return out


def test_isotonic_matches_reference(spark):
    rng = random.Random(17)
    rows = [
        ("g", float(i), rng.uniform(0, 1) + 0.02 * i) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = (
        isotonic_regression(df, ["k"], "x", "y")
        .orderBy("x")
        .toPandas()
    )
    want = _ref_pav(got["y"].to_numpy(), np.ones(len(got)))
    assert np.allclose(got["fitted"].to_numpy(), want, atol=1e-12)
    f = got["fitted"].to_numpy()
    assert (np.diff(f) >= -1e-12).all()
    assert np.average(f) == pytest.approx(np.average(got["y"]), rel=1e-12)


def test_isotonic_exact_on_monotone(spark):
    rows = [("g", float(i), float(i * 2)) for i in range(20)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = isotonic_regression(df, ["k"], "x", "y").collect()
    assert all(r["fitted"] == r["y"] for r in got)


def test_isotonic_ties_pool_first(spark):
    rows = [("g", 1.0, 0.0), ("g", 1.0, 10.0), ("g", 2.0, 4.0)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = sorted(
        (r["x"], r["y"], r["fitted"])
        for r in isotonic_regression(df, ["k"], "x", "y").collect()
    )
    # x=1 ties pool to mean 5; then 5 > 4 violates -> all pool to 14/3
    assert got[0][2] == pytest.approx(14 / 3)
    assert got[1][2] == pytest.approx(14 / 3)
    assert got[2][2] == pytest.approx(14 / 3)


def test_isotonic_weighted(spark):
    rows = [("g", 1.0, 0.0, 3.0), ("g", 2.0, -3.0, 1.0)]
    df = spark.createDataFrame(rows, "k string, x double, y double, w double")
    got = {
        r["x"]: r["fitted"]
        for r in isotonic_regression(df, ["k"], "x", "y", "w").collect()
    }
    # pooled weighted mean = (3*0 + 1*(-3)) / 4
    assert got[1.0] == pytest.approx(-0.75) and got[2.0] == pytest.approx(-0.75)


def test_isotonic_per_group_independent(spark):
    rows = [("a", 1.0, 5.0), ("a", 2.0, 1.0), ("b", 1.0, 0.0), ("b", 2.0, 9.0)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = {
        (r["k"], r["x"]): r["fitted"]
        for r in isotonic_regression(df, ["k"], "x", "y").collect()
    }
    assert got[("a", 1.0)] == pytest.approx(3.0)
    assert got[("a", 2.0)] == pytest.approx(3.0)
    assert got[("b", 1.0)] == 0.0 and got[("b", 2.0)] == 9.0


def test_ece_perfect_and_miscalibrated(spark):
    from pipeline_dataengineer_spark.operators.calibration import (
        expected_calibration_error,
    )

    # perfectly calibrated bins: within each bin acc == conf
    rows = []
    for b in range(10):
        conf = b / 10 + 0.05
        pos = round(conf * 100)
        rows += [(conf, 1)] * pos + [(conf, 0)] * (100 - pos)
    df = spark.createDataFrame(rows, "score double, label int")
    out = expected_calibration_error(df, "score", "label").collect()
    ece = out[0]["ece"]
    assert ece < 0.01  # rounding of pos only
    assert len(out) == 10

    # grossly overconfident: high scores, coin-flip labels
    bad = spark.createDataFrame(
        [(0.95, i % 2) for i in range(200)], "score double, label int"
    )
    bece = expected_calibration_error(bad, "score", "label").collect()
    assert bece[0]["ece"] == 0.45  # |0.5 - 0.95|
    assert bece[0]["bin"] == 9
    # score exactly 1.0 clamps into the last bin, not bin 10
    edge = spark.createDataFrame([(1.0, 1)], "score double, label int")
    assert expected_calibration_error(edge, "score", "label").collect()[0]["bin"] == 9


def test_brier_decomposition_identity(spark):
    import pytest

    from pipeline_dataengineer_spark.operators.calibration import (
        brier_decomposition,
    )

    # scores exactly at bin centers: the Murphy identity is exact
    rows = []
    for b in range(10):
        conf = b / 10 + 0.05
        pos = round(conf * 100)
        rows += [(conf, 1)] * pos + [(conf, 0)] * (100 - pos)
    df = spark.createDataFrame(rows, "score double, label int")
    r = brier_decomposition(df, "score", "label").collect()[0]
    assert r["identity_gap"] == pytest.approx(0.0, abs=1e-9)
    assert r["brier"] == pytest.approx(
        r["reliability"] - r["resolution"] + r["uncertainty"], abs=1e-9
    )
    assert r["reliability"] < 0.001      # calibrated by construction
    assert r["resolution"] > 0.05        # bins genuinely discriminate
    # a constant base-rate forecaster: resolution exactly 0, brier=UNC
    base = spark.createDataFrame(
        [(0.55, i % 2) for i in range(100)], "score double, label int"
    )
    rb = brier_decomposition(base, "score", "label").collect()[0]
    assert rb["resolution"] == 0.0
    assert rb["brier"] == pytest.approx(
        rb["uncertainty"] + rb["reliability"], abs=1e-9
    )


def test_roc_auc_and_ap(spark):
    import pytest

    from pipeline_dataengineer_spark.operators.calibration import (
        average_precision,
        roc_auc,
    )

    # perfect separation
    perfect = spark.createDataFrame(
        [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)], "s double, y int"
    )
    r = roc_auc(perfect, "s", "y").collect()[0]
    assert r["auc"] == 1.0 and r["gini"] == 1.0
    assert average_precision(perfect, "s", "y").collect()[0]["ap"] == 1.0

    # known mixed case: scores .9(+) .8(-) .7(+) .6(-)
    mixed = spark.createDataFrame(
        [(0.9, 1), (0.8, 0), (0.7, 1), (0.6, 0)], "s double, y int"
    )
    rm = roc_auc(mixed, "s", "y").collect()[0]
    assert rm["auc"] == 0.75  # 3 of 4 pos-neg pairs correctly ordered
    ap = average_precision(mixed, "s", "y").collect()[0]["ap"]
    assert ap == pytest.approx(round((1.0 + 2 / 3) / 2, 6))

    # all-tied scores: AUC exactly 0.5 via average ranks
    tied = spark.createDataFrame(
        [(0.5, 1)] * 3 + [(0.5, 0)] * 5, "s double, y int"
    )
    assert roc_auc(tied, "s", "y").collect()[0]["auc"] == 0.5
    # single-class input: NULL metrics, no division error
    ones = spark.createDataFrame([(0.5, 1)] * 3, "s double, y int")
    assert roc_auc(ones, "s", "y").collect()[0]["auc"] is None


def test_lift_gains_basic(spark):
    """20 rows, scores 19..0, positives = the top 5 scorers. With 4
    buckets of 5 rows, bucket 0 captures ALL positives: gain 1.0 and
    lift = (5/5)/(5/20) = 4; later buckets dilute toward lift 1."""
    from pipeline_dataengineer_spark.operators.calibration import lift_gains

    rows = [(i, float(100 - i), 1 if i < 5 else 0) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, s double, y int")
    out = {
        r["bucket"]: r
        for r in lift_gains(df, "s", "y", "id", n_buckets=4).collect()
    }
    assert len(out) == 4
    assert out[0]["n"] == 5 and out[0]["pos"] == 5
    assert out[0]["gain"] == 1.0 and out[0]["lift"] == 4.0
    assert out[3]["cum_n"] == 20 and out[3]["cum_pos"] == 5
    assert out[3]["gain"] == 1.0 and out[3]["lift"] == 1.0


def test_lift_gains_tie_break_deterministic(spark):
    """All-equal scores: the id tie-break makes bucket assignment (and
    the whole table) deterministic across runs."""
    from pipeline_dataengineer_spark.operators.calibration import lift_gains

    rows = [(i, 1.0, i % 2) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, s double, y int")
    a = lift_gains(df, "s", "y", "id", n_buckets=3).collect()
    b = lift_gains(df, "s", "y", "id", n_buckets=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # ids 0..9 land in bucket 0 -> 5 positives (odd ids 1,3,5,7,9)
    first = [r for r in a if r["bucket"] == 0][0]
    assert first["n"] == 10 and first["pos"] == 5


def test_split_conformal_coverage(spark):
    """Marginal coverage on the test half must be >= 1 - alpha up to
    finite-sample slack; interval endpoints are mu +/- qhat."""
    from pipeline_dataengineer_spark.operators.calibration import (
        split_conformal,
    )

    rng = random.Random(7)
    rows = [
        (
            i,
            "g" + str((i // 2) % 2),
            10.0 * ((i // 2) % 2) + rng.gauss(0, 1.0),
        )
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "id long, g string, y double")
    out = split_conformal(df, ["g"], "y", "id", alpha=0.1).collect()
    assert len(out) == 1000
    cov = sum(r["covered"] for r in out) / len(out)
    assert cov >= 0.88, cov
    for r in out[:20]:
        assert r["lo"] <= r["pred"] <= r["hi"]


def test_split_conformal_tiny_calibration_unbounded(spark):
    """When ceil((n_cal+1)(1-alpha)) > n_cal the conformal interval is
    unbounded: NULL endpoints, covered = 1 by convention."""
    from pipeline_dataengineer_spark.operators.calibration import (
        split_conformal,
    )

    rows = [(0, "g", 1.0), (2, "g", 2.0), (1, "g", 5.0), (3, "g", 9.0)]
    df = spark.createDataFrame(rows, "id long, g string, y double")
    out = split_conformal(df, ["g"], "y", "id", alpha=0.1).collect()
    assert len(out) == 2
    assert all(r["lo"] is None and r["hi"] is None for r in out)
    assert all(r["covered"] == 1 for r in out)
