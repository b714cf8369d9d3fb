"""Skyline (Pareto frontier) operator."""

from __future__ import annotations

from pipeline_dataengineer_spark.operators.skyline import skyline_2d


def _brute(rows):
    out = []
    for a in rows:
        dominated = any(
            b[1] >= a[1] and b[2] <= a[2] and (b[1] > a[1] or b[2] < a[2])
            for b in rows
            if b[0] == a[0]
        )
        if not dominated:
            out.append(a)
    return sorted(out)


def test_skyline_matches_brute_force(spark):
    import random

    rng = random.Random(7)
    rows = [
        (f"g{rng.randrange(3)}", rng.randrange(20), rng.randrange(20))
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, ["grp", "score", "cost"])
    got = sorted(
        (r["grp"], r["score"], r["cost"])
        for r in skyline_2d(df, "score", "cost", ["grp"]).collect()
    )
    assert got == _brute(rows)


def test_skyline_keeps_full_duplicates_and_ties(spark):
    # two identical best rows: mutually non-dominating, both survive;
    # (5, 9) is dominated by (5, 1); (4, 1) dominated by (5, 1).
    rows = [("g", 5, 1), ("g", 5, 1), ("g", 5, 9), ("g", 4, 1), ("g", 3, 0)]
    df = spark.createDataFrame(rows, ["grp", "score", "cost"])
    got = sorted(
        (r["score"], r["cost"])
        for r in skyline_2d(df, "score", "cost", ["grp"]).collect()
    )
    assert got == [(3, 0), (5, 1), (5, 1)]


def test_skyline_global_no_groups(spark):
    rows = [(10, 5), (9, 3), (8, 1), (7, 2), (10, 6)]
    df = spark.createDataFrame(rows, ["score", "cost"])
    got = sorted(
        (r["score"], r["cost"]) for r in skyline_2d(df, "score", "cost").collect()
    )
    assert got == [(8, 1), (9, 3), (10, 5)]
