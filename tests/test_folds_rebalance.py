"""time_series_folds (no-future-leakage expanding CV) and
rebalance_classes (deterministic oversampling) unit properties."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pipeline_dataengineer_spark.operators.sampling import (
    rebalance_classes,
    time_series_folds,
)


def _ts_df(spark, n_days=8, rows_per_day=3):
    rows = [
        (d * rows_per_day + r, dt.date(2024, 1, 1) + dt.timedelta(days=d))
        for d in range(n_days)
        for r in range(rows_per_day)
    ]
    return spark.createDataFrame(rows, "id long, day date")


def test_folds_never_train_on_future(spark):
    """In every fold, max(train day) < min(test day) — the property
    the operator exists for."""
    out = time_series_folds(_ts_df(spark), "day", n_folds=3).collect()
    by_fold = {}
    for r in out:
        by_fold.setdefault(r["fold"], {"train": [], "test": []})[
            r["role"]
        ].append(r["day"])
    assert set(by_fold) == {1, 2, 3}
    for f, sides in by_fold.items():
        assert sides["train"] and sides["test"], f
        assert max(sides["train"]) < min(sides["test"]), f


def test_folds_expand_and_nest(spark):
    """Fold k+1's train set contains fold k's entire train+test —
    expanding windows, not sliding."""
    out = time_series_folds(_ts_df(spark), "day", n_folds=3).collect()
    by_fold = {}
    for r in out:
        by_fold.setdefault(r["fold"], {"train": set(), "test": set()})[
            r["role"]
        ].add((r["id"], r["day"]))
    for k in (1, 2):
        prev = by_fold[k]["train"] | by_fold[k]["test"]
        assert prev == by_fold[k + 1]["train"]


def test_folds_rows_of_a_day_stay_together(spark):
    """All rows of one time unit share fold/role — unit-level cuts,
    no row-level leakage inside a day."""
    out = time_series_folds(_ts_df(spark), "day", n_folds=2).collect()
    roles = {}
    for r in out:
        key = (r["day"], r["fold"])
        roles.setdefault(key, set()).add(r["role"])
    for key, rs in roles.items():
        assert len(rs) == 1, key


def test_rebalance_exact_target_counts(spark):
    df = spark.createDataFrame(
        [(i, "maj") for i in range(90)]
        + [(100 + i, "mid") for i in range(40)]
        + [(200 + i, "min") for i in range(7)],
        "id long, cls string",
    )
    out = rebalance_classes(df, "cls", order_key="id")
    counts = {
        r["cls"]: r["n"]
        for r in out.groupBy("cls").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"maj": 90, "mid": 90, "min": 90}
    # every original row survives; no synthetic rows
    uniq = {
        r["cls"]: r["n"]
        for r in out.groupBy("cls")
        .agg(F.countDistinct("id").alias("n"))
        .collect()
    }
    assert uniq == {"maj": 90, "mid": 40, "min": 7}


def test_rebalance_copy_spread_is_even(spark):
    """No row is repeated twice more than any other in its class:
    copies differ by at most 1 (90 = 12*7 + 6 -> six rows get 13,
    one gets 12)."""
    df = spark.createDataFrame(
        [(i, "a") for i in range(90)] + [(200 + i, "b") for i in range(7)],
        "id long, cls string",
    )
    out = rebalance_classes(df, "cls", order_key="id")
    per_row = (
        out.filter(F.col("cls") == "b")
        .groupBy("id")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    cs = sorted(r["c"] for r in per_row)
    assert cs == [12, 13, 13, 13, 13, 13, 13]


def test_rebalance_explicit_target_and_oversized_class(spark):
    """Explicit target: smaller classes rise to it, larger classes
    pass through untouched."""
    df = spark.createDataFrame(
        [(i, "big") for i in range(50)] + [(100 + i, "small") for i in range(5)],
        "id long, cls string",
    )
    out = rebalance_classes(df, "cls", target=20, order_key="id")
    counts = {
        r["cls"]: r["n"]
        for r in out.groupBy("cls").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"big": 50, "small": 20}


def test_rebalance_deterministic_across_runs(spark):
    df = spark.createDataFrame(
        [(i, "a") for i in range(30)] + [(200 + i, "b") for i in range(11)],
        "id long, cls string",
    ).repartition(7)
    a = sorted(
        (r["id"], r["cls"])
        for r in rebalance_classes(df, "cls", order_key="id").collect()
    )
    b = sorted(
        (r["id"], r["cls"])
        for r in rebalance_classes(
            df.repartition(3), "cls", order_key="id"
        ).collect()
    )
    assert a == b


def test_rebalance_null_class_rows_pass_through(spark):
    """NULL-class rows are returned untouched (an equi-join would
    silently drop them) and do not participate in balancing."""
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, None), (5, None)],
        "id long, cls string",
    )
    out = rebalance_classes(df, "cls", order_key="id").collect()
    nulls = sorted(r["id"] for r in out if r["cls"] is None)
    assert nulls == [4, 5]
    counts = {}
    for r in out:
        counts[r["cls"]] = counts.get(r["cls"], 0) + 1
    assert counts["a"] == 2 and counts["b"] == 2  # b oversampled to 2
