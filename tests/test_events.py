"""Unit tests: funnel and cohort retention."""

from __future__ import annotations

from pipeline_dataengineer_spark.operators.events import cohort_retention, funnel


def test_funnel_order_matters(spark):
    rows = [
        # u1: full in-order funnel
        ("u1", "view", 1), ("u1", "click", 2), ("u1", "purchase", 3),
        # u2: clicked before first view -> breaks at click
        ("u2", "click", 1), ("u2", "view", 2), ("u2", "purchase", 3),
        # u3: view+click only
        ("u3", "view", 5), ("u3", "click", 9),
        # u4: never viewed
        ("u4", "purchase", 1),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "event_id"])
    got = {
        r["step"]: r["n_entities"]
        for r in funnel(df, "user_id", "event_type", "event_id",
                        ["view", "click", "purchase"]).collect()
    }
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_cohort_retention_triangle(spark):
    rows = [
        # cohort week of 2024-01-01 (Monday): u1 active weeks 0 and 1
        ("u1", "2024-01-02 10:00:00"), ("u1", "2024-01-09 10:00:00"),
        # u2 only week 0
        ("u2", "2024-01-03 10:00:00"),
        # cohort week of 2024-01-08: u3 active weeks 0 and 2
        ("u3", "2024-01-10 10:00:00"), ("u3", "2024-01-22 10:00:00"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts_str"]).selectExpr(
        "user_id", "CAST(ts_str AS TIMESTAMP) AS ts"
    )
    got = {
        (r["cohort"], r["period_n"]): r["n_active"]
        for r in cohort_retention(df, "user_id", "ts").collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 2): 1,
    }


def test_cohort_retention_month_periods_are_month_numbers(spark):
    import pytest

    rows = [
        # u1 first active Jan, returns Mar -> period_n 0 and 2
        ("u1", "2024-01-15 10:00:00"), ("u1", "2024-03-02 10:00:00"),
        # u2 Feb only -> its own cohort, period 0
        ("u2", "2024-02-28 23:00:00"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts_str"]).selectExpr(
        "user_id", "CAST(ts_str AS TIMESTAMP) AS ts"
    )
    got = {
        (r["cohort"], r["period_n"]): r["n_active"]
        for r in cohort_retention(df, "user_id", "ts", period="month").collect()
    }
    # datediff/1 would have produced day offsets like 47; months_between
    # gives true month numbers.
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-02-01", 0): 1,
    }
    with pytest.raises(ValueError, match="period"):
        cohort_retention(df, "user_id", "ts", period="quarter")


def test_funnel_windowed_enforces_span(spark):
    from pipeline_dataengineer_spark.operators.events import funnel_windowed

    rows = [
        # u1 completes inside the window (span 10)
        (1, "a", 0), (1, "b", 3), (1, "c", 8),
        # u2: step c lands past the span from step a -> stops at b
        (2, "a", 0), (2, "b", 5), (2, "c", 50),
        # u3: b out of window entirely
        (3, "a", 0), (3, "b", 30),
    ]
    df = spark.createDataFrame(rows, "u long, t string, o long")
    got = {
        r["step"]: r["n_entities"]
        for r in funnel_windowed(
            df, "u", "t", "o", ["a", "b", "c"], max_span=10
        ).collect()
    }
    assert got == {"a": 3, "b": 2, "c": 1}


def test_funnel_step_times_gaps(spark):
    from pipeline_dataengineer_spark.operators.events import funnel_step_times

    rows = [
        (1, "a", 0), (1, "b", 10), (1, "c", 30),   # gaps 10, 20
        (2, "a", 0), (2, "b", 20),                 # gap 20, no c
        (3, "b", 5),                               # never starts
    ]
    df = spark.createDataFrame(rows, "u long, t string, o long")
    got = {
        r["transition"]: (r["n_entities"], r["p50_gap"], r["p90_gap"])
        for r in funnel_step_times(df, "u", "t", "o", ["a", "b", "c"]).collect()
    }
    assert got["a->b"][0] == 2 and got["a->b"][1] == 15.0  # median of {10,20}
    assert got["b->c"] == (1, 20.0, 20.0)


def test_top_paths_orders_and_filters(spark):
    from pyspark.sql import functions as F

    from pipeline_dataengineer_spark.operators.events import top_paths

    rows = [
        (1, 1, "A"), (1, 2, "B"), (1, 3, "CONV"),
        (2, 1, "A"), (2, 2, "B"), (2, 3, "CONV"),
        (3, 1, "B"), (3, 2, "CONV"),
        (4, 1, "Z"),                      # non-converting: excluded
    ]
    df = spark.createDataFrame(rows, "u long, o long, ch string")
    got = [
        (r["path"], r["n_journeys"])
        for r in top_paths(df, ["u"], "o", "ch", F.col("ch") == "CONV").collect()
    ]
    assert got == [("A>B", 2), ("B", 1)]


def test_cohort_ltv_curves(spark):
    import datetime as dt

    from pipeline_dataengineer_spark.operators.events import cohort_ltv

    rows = [
        # cohort day 2024-01-01: two users
        (1, dt.datetime(2024, 1, 1), 10.0),
        (2, dt.datetime(2024, 1, 1), 20.0),
        (1, dt.datetime(2024, 1, 2), 5.0),
        # cohort day 2024-01-03: one user
        (3, dt.datetime(2024, 1, 3), 100.0),
        (3, dt.datetime(2024, 1, 5), 50.0),
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, v double")
    out = {
        (str(r["cohort"]), r["age"]): r
        for r in cohort_ltv(df, "u", "ts", "v", period="day").collect()
    }
    c1 = "2024-01-01"
    assert out[(c1, 0)]["n_users"] == 2
    assert out[(c1, 0)]["period_value"] == 30.0
    assert out[(c1, 1)]["cum_value"] == 35.0
    assert out[(c1, 1)]["ltv_per_user"] == 17.5
    c2 = "2024-01-03"
    assert out[(c2, 2)]["cum_value"] == 150.0
    assert out[(c2, 2)]["ltv_per_user"] == 150.0

    import pytest

    with pytest.raises(ValueError):
        cohort_ltv(df, "u", "ts", "v", period="hour")
