"""Haversine grid join (operators/spatial.py:haversine_join)."""

import math
import random

from pyspark.sql import functions as F

from pipeline_dataengineer_spark.operators.spatial import (
    haversine_join,
    haversine_km,
)


def _hav(lat1, lon1, lat2, lon2):
    r = 6371.0088
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dphi = p2 - p1
    dlmb = math.radians(lon2) - math.radians(lon1)
    a = (
        math.sin(dphi / 2) ** 2
        + math.cos(p1) * math.cos(p2) * math.sin(dlmb / 2) ** 2
    )
    return 2 * r * math.asin(math.sqrt(a))


def _pts(spark, rows, p):
    return spark.createDataFrame(
        rows, f"{p}id long, {p}lat double, {p}lon double"
    )


def test_haversine_km_matches_python(spark):
    df = spark.createDataFrame(
        [(48.8566, 2.3522, 51.5074, -0.1278)], "a double, b double, c double, d double"
    )
    got = df.select(
        haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("d")
    ).collect()[0]["d"]
    assert abs(got - _hav(48.8566, 2.3522, 51.5074, -0.1278)) < 1e-9
    assert abs(got - 343.556) < 0.5  # Paris-London ~ 343.5 km


def test_haversine_join_matches_bruteforce(spark):
    rng = random.Random(11)
    lrows = [
        (i, rng.uniform(40, 60), rng.uniform(-5, 15)) for i in range(70)
    ]
    rrows = [
        (i, rng.uniform(40, 60), rng.uniform(-5, 15)) for i in range(70)
    ]
    radius = 120.0
    got = {
        (r["lid"], r["rid"])
        for r in haversine_join(
            _pts(spark, lrows, "l"),
            _pts(spark, rrows, "r"),
            ("llat", "llon"),
            ("rlat", "rlon"),
            radius_km=radius,
            max_abs_lat=60.0,
        ).collect()
    }
    want = {
        (li, ri)
        for (li, la, lo) in lrows
        for (ri, ra, ro) in rrows
        if _hav(la, lo, ra, ro) <= radius
    }
    assert got == want and len(want) > 30


def test_haversine_join_high_latitude(spark):
    """Near max_abs_lat the longitude cells shrink correctly: a pair
    65 degrees north separated mostly in longitude is still found."""
    left = _pts(spark, [(1, 65.0, 10.0)], "l")
    # ~1 deg lon at 65N is ~47 km
    right = _pts(spark, [(2, 65.0, 11.0)], "r")
    d = _hav(65.0, 10.0, 65.0, 11.0)
    out = haversine_join(
        left,
        right,
        ("llat", "llon"),
        ("rlat", "rlon"),
        radius_km=d + 1.0,
        max_abs_lat=66.0,
    ).collect()
    assert [(r["lid"], r["rid"]) for r in out] == [(1, 2)]


def test_haversine_join_no_bnlj(spark):
    left = _pts(spark, [(1, 45.0, 5.0)], "l")
    right = _pts(spark, [(2, 45.1, 5.1)], "r")
    plan = (
        haversine_join(
            left, right, ("llat", "llon"), ("rlat", "rlon"), 50.0
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan
