"""k-anonymity, table diff, CUSUM, readability, point-in-polygon,
frequent sequences — the round-4 second batch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_k_anonymize_suppresses_small_classes(spark):
    from pipeline_dataengineer_spark.operators.privacy import (
        anonymity_audit,
        k_anonymize,
        l_diverse_classes,
    )

    rows = (
        [("10001", "M", "flu")] * 3
        + [("10001", "F", "flu"), ("10001", "F", "cold")]
        + [("94107", "M", "flu")]  # singleton class
        + [(None, "F", "covid"), (None, "F", "flu")]  # NULL class of 2
    )
    df = spark.createDataFrame(rows, "zip string, sex string, dx string")

    kept = k_anonymize(df, ["zip", "sex"], k=2)
    classes = {
        (r["zip"], r["sex"]) for r in kept.select("zip", "sex").distinct().collect()
    }
    assert ("94107", "M") not in classes  # size-1 suppressed
    assert ("10001", "M") in classes and (None, "F") in classes
    assert kept.count() == 7

    tagged = k_anonymize(df, ["zip", "sex"], k=2, out_col="cls_n")
    assert tagged.count() == 8  # annotate mode drops nothing
    assert {
        r["cls_n"] for r in tagged.filter(F.col("zip") == "94107").collect()
    } == {1}

    audit = anonymity_audit(df, ["zip", "sex"], "dx").collect()
    by_cls = {(r["zip"], r["sex"]): (r["class_size"], r["n_sensitive"]) for r in audit}
    assert by_cls[("10001", "M")] == (3, 1)
    assert by_cls[("10001", "F")] == (2, 2)
    assert min(s for s, _ in by_cls.values()) == 1  # table is 1-anonymous

    div = l_diverse_classes(df, ["zip", "sex"], "dx", l=2)
    got = {(r["zip"], r["sex"]) for r in div.collect()}
    assert got == {("10001", "F"), (None, "F")}

    with pytest.raises(ValueError):
        k_anonymize(df, ["zip"], k=0)


def test_diff_tables_statuses_and_null_safety(spark):
    from pipeline_dataengineer_spark.operators.maintenance import diff_tables

    a = spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", None), (3, "carol", 30.0), (4, "dan", 40.0)],
        "id long, name string, bal double",
    )
    b = spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", None), (3, "carol", 99.0), (5, "eve", 50.0)],
        "id long, name string, bal double",
    )
    out = {r["id"]: r for r in diff_tables(a, b, ["id"]).collect()}
    assert out[1]["status"] == "unchanged" and out[1]["changed_cols"] == []
    assert out[2]["status"] == "unchanged"  # NULL == NULL under eqNullSafe
    assert out[3]["status"] == "changed" and out[3]["changed_cols"] == ["bal"]
    assert out[3]["bal_a"] == 30.0 and out[3]["bal_b"] == 99.0
    assert out[4]["status"] == "removed" and out[4]["changed_cols"] == []
    assert out[5]["status"] == "added" and out[5]["name_b"] == "eve"

    # value -> NULL is a change, and compare_cols restricts the scan
    b2 = spark.createDataFrame([(4, "dan", None)], "id long, name string, bal double")
    r4 = diff_tables(a, b2, ["id"], compare_cols=["bal"]).filter("id = 4").first()
    assert r4["status"] == "changed" and r4["changed_cols"] == ["bal"]

    with pytest.raises(ValueError):
        diff_tables(a, a.drop("bal"), ["id"])


def test_cusum_detects_shift_and_resets(spark):
    import numpy as np

    from pipeline_dataengineer_spark.operators.timeseries import (
        cusum_control_chart,
    )

    # target 10, allowance 0.5, threshold 4: stable at 10 then jumps to 12
    vals = [10.0, 10.2, 9.8, 10.1] + [12.0] * 6 + [10.0] * 3
    rows = [("s1", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, t long, x double")
    out = (
        cusum_control_chart(df, ["key"], "t", "x", target=10.0, k=0.5, h=4.0)
        .orderBy("t")
        .collect()
    )

    # replay by hand
    hi = lo = 0.0
    expect = []
    for v in vals:
        hi = max(0.0, hi + (v - 10.0) - 0.5)
        lo = max(0.0, lo - (v - 10.0) - 0.5)
        a = "up" if hi > 4.0 else ("down" if lo > 4.0 else None)
        expect.append((hi, lo, a))
        if hi > 4.0:
            hi = 0.0
        if lo > 4.0:
            lo = 0.0
    for r, (ehi, elo, ea) in zip(out, expect):
        assert abs(r["cusum_hi"] - ehi) < 1e-12
        assert abs(r["cusum_lo"] - elo) < 1e-12
        assert r["alarm"] == ea
    alarms = [r["t"] for r in out if r["alarm"] == "up"]
    # 3 high samples x 1.5 excess cross h=4 at t=6; after the reset
    # the remaining three high samples cross again at t=9
    assert alarms == [6, 9]
    # post-alarm the statistic restarted from 0
    assert out[7]["cusum_hi"] == pytest.approx(1.5)


def test_readability_flesch_counts(spark):
    from pipeline_dataengineer_spark.functions.textstats import readability

    df = spark.createDataFrame(
        [
            ("The cat sat on the mat. It was happy!",),
            ("   ",),
            ("word",),
        ],
        "text string",
    )
    rows = df.select(readability("text").alias("r")).collect()
    r0 = rows[0]["r"]
    assert r0["n_words"] == 9
    assert r0["n_sentences"] == 2
    # vowel groups: the-1 cat-1 sat-1 on-1 the-1 mat-1 it-1 was-1 happy-2
    assert r0["n_syllables"] == 10
    expected = 206.835 - 1.015 * (9 / 2) - 84.6 * (10 / 9)
    assert abs(r0["flesch"] - round(expected, 4)) < 1e-9
    assert rows[1]["r"] is None  # whitespace-only -> NULL
    assert rows[2]["r"]["n_sentences"] == 1  # fragment floor


def test_point_in_polygon_concave_and_left(spark):
    from pipeline_dataengineer_spark.operators.spatial import (
        point_in_polygon_join,
    )

    square = ("sq", [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)])
    # concave "C": notch on the right side between y=1..3, x>2
    cshape = (
        "c",
        [
            (10.0, 0.0), (14.0, 0.0), (14.0, 1.0), (12.0, 1.0),
            (12.0, 3.0), (14.0, 3.0), (14.0, 4.0), (10.0, 4.0),
        ],
    )
    pts = spark.createDataFrame(
        [
            (1, 2.0, 2.0),    # inside square
            (2, 5.0, 2.0),    # outside all
            (3, 11.0, 2.0),   # inside C body
            (4, 13.0, 2.0),   # in the notch: bbox hit, ray-cast miss
            (5, 13.0, 0.5),   # inside C lower arm
        ],
        "pid long, x double, y double",
    )
    out = point_in_polygon_join(pts, "x", "y", [square, cshape])
    got = {(r["pid"], r["zone"]) for r in out.collect()}
    assert got == {(1, "sq"), (3, "c"), (5, "c")}

    left = point_in_polygon_join(pts, "x", "y", [square, cshape], how="left")
    zones = {r["pid"]: r["zone"] for r in left.collect()}
    assert zones[2] is None and zones[4] is None and len(zones) == 5

    with pytest.raises(ValueError):
        point_in_polygon_join(pts, "x", "y", [("bad", [(0, 0), (1, 1)])])


def test_frequent_sequences_counts_and_support(spark):
    from pipeline_dataengineer_spark.operators.events import (
        frequent_sequences,
    )

    rows = []
    for u in (1, 2, 3):
        for i, e in enumerate(["view", "cart", "buy"]):
            rows.append((u, i, e))
    rows += [(4, 0, "view"), (4, 1, "view"), (4, 2, "cart"), (4, 3, "buy")]
    df = spark.createDataFrame(rows, "user long, t long, ev string")

    out = {
        tuple(r["seq"]): (r["n_occurrences"], r["n_users"])
        for r in frequent_sequences(df, "user", "t", "ev", n=3, min_support=2).collect()
    }
    assert out[("view", "cart", "buy")] == (4, 4)
    assert ("view", "view", "cart") not in out  # support 1 < 2

    bigrams = {
        tuple(r["seq"]): r["n_occurrences"]
        for r in frequent_sequences(df, "user", "t", "ev", n=2, min_support=1).collect()
    }
    assert bigrams[("view", "cart")] == 4
    assert bigrams[("view", "view")] == 1
    # tail windows with missing leads were dropped, not null-padded
    assert all(None not in s for s in bigrams)


def test_cusum_null_values_pass_through(spark):
    """NULL samples carry no deviation: state is held, not poisoned
    (a NaN would otherwise stick in the accumulators forever)."""
    from pipeline_dataengineer_spark.operators.timeseries import (
        cusum_control_chart,
    )

    rows = [
        ("s", 0, 13.0),   # hi = 2.5
        ("s", 1, None),   # held
        ("s", 2, 13.0),   # hi = 5.0 -> alarm (h=4), reset
        ("s", 3, 10.0),   # hi = 0.0
    ]
    df = spark.createDataFrame(rows, "key string, t long, x double")
    out = (
        cusum_control_chart(df, ["key"], "t", "x", target=10.0, k=0.5, h=4.0)
        .orderBy("t")
        .collect()
    )
    assert [r["cusum_hi"] for r in out] == [2.5, 2.5, 5.0, 0.0]
    assert [r["alarm"] for r in out] == [None, None, "up", None]


def test_generalize_dates_ladder(spark):
    import datetime as dt

    import pytest

    from pipeline_dataengineer_spark.operators.privacy import (
        generalize_dates_to_k,
    )

    # 4 rows per exact day -> k=3 satisfied at day level; k=5 needs
    # month (each week has one day here, weeks don't help)
    rows = []
    for day in (1, 8, 15):  # three Mondays of Jan 2024
        for i in range(4):
            rows.append((dt.date(2024, 1, day), "seg"))
    df = spark.createDataFrame(rows, "d date, seg string")

    g, lvl = generalize_dates_to_k(df, "d", ["seg"], k=3)
    assert lvl == "day"
    g2, lvl2 = generalize_dates_to_k(df, "d", ["seg"], k=5)
    assert lvl2 == "month"
    assert {r["d"] for r in g2.collect()} == {dt.date(2024, 1, 1)}
    with pytest.raises(ValueError):
        generalize_dates_to_k(df, "d", ["seg"], k=13)


def test_entropy_l_diversity_flags_skewed_class(spark):
    """A class with l distinct values but one dominant value passes
    distinct-l but FAILS entropy-l: entropy < ln(2) when one value
    holds 90% of the class."""
    import math

    from pipeline_dataengineer_spark.operators.privacy import (
        entropy_l_diversity,
    )

    rows = (
        [("a", "flu")] * 18
        + [("a", "hiv")] * 2
        + [("b", "flu")] * 10
        + [("b", "hiv")] * 10
    )
    df = spark.createDataFrame(rows, "zip string, dx string")
    out = {r["zip"]: r for r in entropy_l_diversity(df, ["zip"], "dx", l=2).collect()}
    assert out["a"]["n_sensitive"] == 2  # distinct-l would pass
    assert out["a"]["entropy_ok"] == 0  # entropy-l fails
    assert out["b"]["entropy_ok"] == 1
    assert abs(out["b"]["entropy"] - math.log(2)) < 1e-6
    assert out["a"]["class_size"] == 20
