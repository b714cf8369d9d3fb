"""Unit tests: deterministic sampling / hash splits / daily resample."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from pipeline_dataengineer_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
    portable_bucket,
)
from pipeline_dataengineer_spark.operators.timeseries import resample_daily


def test_sample_deterministic_and_layout_independent(spark):
    df = spark.range(0, 20_000).withColumnRenamed("id", "k")
    a = {r.k for r in deterministic_sample(df, "k", 0.2).collect()}
    b = {
        r.k
        for r in deterministic_sample(df.repartition(13), "k", 0.2).collect()
    }
    assert a == b  # membership survives repartitioning
    assert 0.15 < len(a) / 20_000 < 0.25  # ratio near the target


def test_sample_is_subset_at_larger_fraction(spark):
    df = spark.range(0, 5_000).withColumnRenamed("id", "k")
    small = {r.k for r in deterministic_sample(df, "k", 0.1).collect()}
    big = {r.k for r in deterministic_sample(df, "k", 0.3).collect()}
    assert small <= big  # fractions nest: growing a sample keeps prior rows


def test_sample_plan_has_no_shuffle(spark):
    df = spark.range(0, 100).withColumnRenamed("id", "k")
    plan = deterministic_sample(df, "k", 0.5)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_hash_split_partitions_every_row_once(spark):
    df = spark.range(0, 10_000).withColumnRenamed("id", "k")
    out = hash_split(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.cnt for r in out.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    assert sum(counts.values()) == 10_000
    assert 0.75 < counts["train"] / 10_000 < 0.85
    # splits are disjoint by construction (single CASE) — and stable:
    again = hash_split(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.exceptAll(again).count() == 0


def test_bucket_matches_duckdb_formula(spark):
    import duckdb

    from pipeline_dataengineer_spark.operators.sampling import bucket_sql

    got = {
        r.k: r.b
        for r in spark.range(0, 1000)
        .select(F.col("id").alias("k"), portable_bucket("id", 97).alias("b"))
        .collect()
    }
    want = dict(
        duckdb.connect()
        .execute(
            f"SELECT k, {bucket_sql('k', 97)} FROM range(0, 1000) t(k)"
        )
        .fetchall()
    )
    assert got == want


def test_bucket_matches_duckdb_formula_negative_keys(spark):
    # DuckDB's % is sign-preserving; Spark's pmod is not. bucket_sql
    # must wrap to a pmod-equivalent so NEGATIVE keys agree too.
    import duckdb

    from pipeline_dataengineer_spark.operators.sampling import bucket_sql

    got = {
        r.k: r.b
        for r in spark.range(-500, 500)
        .select(F.col("id").alias("k"), portable_bucket("id", 97).alias("b"))
        .collect()
    }
    want = dict(
        duckdb.connect()
        .execute(f"SELECT k, {bucket_sql('k', 97)} FROM range(-500, 500) t(k)")
        .fetchall()
    )
    assert got == want
    assert all(0 <= b < 97 for b in got.values())


def test_resample_fills_gaps_with_zero(spark):
    rows = [
        ("a", dt.date(2024, 1, 1), 10.0),
        ("a", dt.date(2024, 1, 4), 5.0),  # gap: Jan 2, Jan 3
        ("b", dt.date(2024, 2, 1), 1.0),
    ]
    df = spark.createDataFrame(rows, "g string, day date, v double")
    out = resample_daily(
        df, "day", ["g"], aggs={"s": F.sum("v")}, fill={"s": 0.0}
    )
    got = {(r.g, str(r.day)): r.s for r in out.collect()}
    assert got == {
        ("a", "2024-01-01"): 10.0,
        ("a", "2024-01-02"): 0.0,
        ("a", "2024-01-03"): 0.0,
        ("a", "2024-01-04"): 5.0,
        ("b", "2024-02-01"): 1.0,  # per-group spine: b has one day only
    }


def test_forward_fill_carries_last_non_null(spark):
    from pipeline_dataengineer_spark.operators.timeseries import forward_fill

    df = spark.createDataFrame(
        [("u", 1, None), ("u", 2, 5.0), ("u", 3, None), ("u", 4, None),
         ("u", 5, 7.0), ("v", 1, None)],
        "k: string, o: long, v: double",
    )
    got = {(r["k"], r["o"]): r["v"]
           for r in forward_fill(df, ["k"], "o", ["v"]).collect()}
    assert got == {("u", 1): None, ("u", 2): 5.0, ("u", 3): 5.0,
                   ("u", 4): 5.0, ("u", 5): 7.0, ("v", 1): None}


def test_ewma_matches_pandas(spark):
    import pandas as pd

    from pipeline_dataengineer_spark.operators.timeseries import ewma

    vals = [1.0, 4.0, 2.0, 8.0, 5.0]
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)], ["k", "o", "v"]
    )
    got = [
        r["ewma"]
        for r in ewma(df, ["k"], "o", "v", alpha=0.5)
        .orderBy("o")
        .collect()
    ]
    expect = pd.Series(vals).ewm(alpha=0.5, adjust=False).mean().tolist()
    assert all(abs(a - b) < 1e-9 for a, b in zip(got, expect))


def test_pack_sequences_offsets_and_determinism(spark):
    from pipeline_dataengineer_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(i, 100) for i in range(50)], ["doc_id", "n_tokens"]
    )
    out = pack_sequences(df, "doc_id", "n_tokens", context_len=250, buckets=1)
    rows = {r["doc_id"]: (r["seq_id"], r["seq_offset"])
            for r in out.collect()}
    # bucket 0, ordered by doc_id: doc k starts at 100k tokens
    for k in range(50):
        assert rows[k] == (100 * k // 250, 100 * k % 250)
    # layout independence
    out2 = pack_sequences(
        df.repartition(7), "doc_id", "n_tokens", context_len=250, buckets=1
    )
    rows2 = {r["doc_id"]: (r["seq_id"], r["seq_offset"]) for r in out2.collect()}
    assert rows == rows2


def test_weighted_sample_proportions_and_determinism(spark):
    from pipeline_dataengineer_spark.operators.sampling import weighted_sample

    n = 20_000
    df = spark.range(n).select(
        F.col("id"),
        # half the rows weight 1, half weight 3
        F.when(F.pmod("id", F.lit(2)) == 0, 1.0).otherwise(3.0).alias("w"),
    )
    kept = weighted_sample(df, "id", "w", target_frac=0.2)
    rows = kept.groupBy("w").count().collect()
    by_w = {r["w"]: r["count"] for r in rows}
    # mean weight = 2 -> keep prob 0.1 for w=1, 0.3 for w=3
    assert abs(by_w[1.0] / (n / 2) - 0.1) < 0.02
    assert abs(by_w[3.0] / (n / 2) - 0.3) < 0.02
    # deterministic and layout-independent
    a = {r["id"] for r in kept.collect()}
    b = {r["id"] for r in weighted_sample(df.repartition(13), "id", "w", 0.2).collect()}
    assert a == b
    # weight > mean/frac saturates at keep-everything
    allkeep = weighted_sample(df, "id", "w", target_frac=1.0, ref_weight=0.5)
    assert allkeep.count() == n
    # zero/NULL weights never sample
    z = spark.createDataFrame([(1, 0.0), (2, None), (3, 5.0)], ["id", "w"])
    assert [r["id"] for r in weighted_sample(z, "id", "w", 1.0, ref_weight=5.0).collect()] == [3]


def test_holt_linear_tracks_linear_series_exactly(spark):
    from pipeline_dataengineer_spark.operators.timeseries import holt_linear

    # on a perfect line l_t converges with trend == slope; with the
    # b0 = x1 - x0 seed the recursion is exact from the start
    rows = [("k", t, 10.0 + 2.0 * t) for t in range(20)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    out = holt_linear(df, ["k"], "t", "v", alpha=0.3, beta=0.1, horizon=5)
    last = sorted(out.collect(), key=lambda r: r["t"])[-1]
    assert abs(last["trend"] - 2.0) < 1e-9
    assert abs(last["level"] - (10.0 + 2.0 * 19)) < 1e-9
    assert abs(last["forecast"] - (10.0 + 2.0 * 24)) < 1e-9


def test_holt_linear_singleton_key(spark):
    from pipeline_dataengineer_spark.operators.timeseries import holt_linear

    df = spark.createDataFrame([("k", 1, 7.5)], ["k", "t", "v"])
    r = holt_linear(df, ["k"], "t", "v").collect()[0]
    assert (r["level"], r["trend"], r["forecast"]) == (7.5, 0.0, 7.5)


def test_clamped_running_sum_saturates_both_ends(spark):
    from pipeline_dataengineer_spark.operators.timeseries import (
        clamped_running_sum,
    )

    rows = [("k", 1, 60.0), ("k", 2, 60.0), ("k", 3, -150.0), ("k", 4, 30.0)]
    df = spark.createDataFrame(rows, ["k", "t", "d"])
    got = {
        r["t"]: r["balance"]
        for r in clamped_running_sum(df, ["k"], "t", "d", 0.0, 100.0).collect()
    }
    # 60 -> cap 100 -> floor 0 -> 30; the cap/floor LOSE the overshoot
    assert got == {1: 60.0, 2: 100.0, 3: 0.0, 4: 30.0}


def test_clamped_running_sum_unbounded_top(spark):
    from pipeline_dataengineer_spark.operators.timeseries import (
        clamped_running_sum,
    )

    rows = [("k", 1, 50.0), ("k", 2, 500.0), ("k", 3, -10.0)]
    df = spark.createDataFrame(rows, ["k", "t", "d"])
    got = {
        r["t"]: r["balance"]
        for r in clamped_running_sum(df, ["k"], "t", "d", lo=0.0).collect()
    }
    assert got == {1: 50.0, 2: 550.0, 3: 540.0}


def test_interpolate_linear_fills_gaps(spark):
    from pipeline_dataengineer_spark.operators.timeseries import (
        interpolate_linear,
    )

    rows = [
        ("a", 0, 10.0),
        ("a", 1, None),
        ("a", 2, None),
        ("a", 3, 40.0),
        ("a", 5, None),  # trailing gap stays NULL
    ]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    got = {
        r["t"]: r["v_f"]
        for r in interpolate_linear(df, ["k"], "t", "v", "v_f").collect()
    }
    assert got[0] == 10.0 and got[3] == 40.0
    assert got[1] == pytest.approx(20.0) and got[2] == pytest.approx(30.0)
    assert got[5] is None


def test_interpolate_linear_uneven_spacing(spark):
    from pipeline_dataengineer_spark.operators.timeseries import (
        interpolate_linear,
    )

    rows = [("a", 0, 0.0), ("a", 10, None), ("a", 40, 80.0)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    got = {
        r["t"]: r["vf"]
        for r in interpolate_linear(df, ["k"], "t", "v", "vf").collect()
    }
    assert got[10] == pytest.approx(20.0)  # 10/40 of the way


def test_interpolate_leading_null_stays(spark):
    from pipeline_dataengineer_spark.operators.timeseries import (
        interpolate_linear,
    )

    rows = [("a", 0, None), ("a", 1, 5.0)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    got = {
        r["t"]: r["vf"]
        for r in interpolate_linear(df, ["k"], "t", "v", "vf").collect()
    }
    assert got[0] is None and got[1] == 5.0


def test_debounce_thins_bursts(spark):
    from pipeline_dataengineer_spark.operators.events import debounce

    rows = [("u", t) for t in [0, 1, 2, 10, 11, 20]]
    df = spark.createDataFrame(rows, "k string, t long")
    kept = sorted(
        r["t"] for r in debounce(df, ["k"], "t", tolerance=3.0).collect()
    )
    # 1, 2 within 3 of predecessor; 11 within 3 of 10
    assert kept == [0, 10, 20]


def test_debounce_keys_independent(spark):
    from pipeline_dataengineer_spark.operators.events import debounce

    rows = [("a", 0), ("b", 1)]
    df = spark.createDataFrame(rows, "k string, t long")
    assert debounce(df, ["k"], "t", tolerance=5.0).count() == 2


def test_cross_correlation_finds_planted_lag(spark):
    """y is x shifted by +2 steps: the lag=+2 correlation is ~1."""
    import math

    from pipeline_dataengineer_spark.operators.timeseries import (
        cross_correlation,
    )

    rows = []
    for t in range(60):
        x = math.sin(t / 5.0) + 0.1 * ((t * 37) % 11)
        rows.append(("a", t, x))
    base = spark.createDataFrame(rows, "k string, t long, x double")
    w = {r["t"]: r["x"] for r in base.collect()}
    df = spark.createDataFrame(
        [("a", t, w[t], w.get(t + 2)) for t in range(60)],
        "k string, t long, x double, y double",
    )
    out = {
        r["lag"]: r["xcorr"]
        for r in cross_correlation(df, ["k"], "t", "x", "y", max_lag=3).collect()
    }
    # y_t == x_{t+2}  ->  corr(x_t, y_{t+lag}) peaks where y_{t+lag}
    # == x_t, i.e. lag = -2
    assert out[-2] == pytest.approx(1.0, abs=1e-9)
    assert abs(out[0]) < 0.999


def test_cusum_detects_planted_shift(spark):
    from pipeline_dataengineer_spark.operators.timeseries import (
        cusum_changepoints,
    )

    rows = []
    for t in range(80):
        base = 100.0 + (t % 5)  # small periodic noise
        v = base + (20.0 if t >= 70 else 0.0)  # late shift at t=70
        rows.append(("a", t, v))
    df = spark.createDataFrame(rows, "k string, t long, v double")
    out = cusum_changepoints(df, ["k"], "t", "v", slack=0.5, threshold=5.0)
    # retrospective standardization centers on the whole series, so
    # the UPWARD shift shows on the positive accumulator; the short
    # shifted tail keeps pre-period z's inside the slack band
    pos = sorted(
        r["t"] for r in out.filter("cusum_pos > 5.0").collect()
    )
    assert pos and min(pos) >= 70, "no positive alarm before the shift"
    assert min(pos) <= 76, "shift detected within a few steps"


def test_cusum_stationary_stays_quiet(spark):
    from pipeline_dataengineer_spark.operators.timeseries import (
        cusum_changepoints,
    )

    rows = [("a", t, 10.0 + (t * 37 % 7)) for t in range(60)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    out = cusum_changepoints(df, ["k"], "t", "v", threshold=5.0)
    assert out.filter("is_change").count() == 0


def test_time_weighted_avg_hand_computed(spark):
    import datetime as dt

    from pipeline_dataengineer_spark.operators.timeseries import (
        time_weighted_avg,
    )

    rows = [
        # 10 days of Jan at 100, then 20 days spanning Jan->Feb at 400:
        # Jan 22..31 (10d) + Feb 1..10 (10d)
        ("k", dt.date(2024, 1, 1), dt.date(2024, 1, 11), 100.0),
        ("k", dt.date(2024, 1, 22), dt.date(2024, 2, 11), 400.0),
        # degenerate and empty intervals vanish
        ("k", dt.date(2024, 3, 5), dt.date(2024, 3, 5), 999.0),
    ]
    df = spark.createDataFrame(rows, "k string, s date, e date, v double")
    out = {
        (r["k"], str(r["month"])): (r["covered_days"], r["tw_avg"])
        for r in time_weighted_avg(df, ["k"], "s", "e", "v").collect()
    }
    # Jan: 10d@100 + 10d@400 -> 250.0 over 20 covered days
    assert out[("k", "2024-01-01")] == (20, 250.0)
    # Feb: 10d@400
    assert out[("k", "2024-02-01")] == (10, 400.0)
    assert len(out) == 2  # no March row


def test_time_weighted_avg_end_on_month_boundary(spark):
    import datetime as dt

    from pipeline_dataengineer_spark.operators.timeseries import (
        time_weighted_avg,
    )

    # end exclusive ON the boundary: no spill into February
    df = spark.createDataFrame(
        [("k", dt.date(2024, 1, 20), dt.date(2024, 2, 1), 50.0)],
        "k string, s date, e date, v double",
    )
    out = {
        str(r["month"]): r["covered_days"]
        for r in time_weighted_avg(df, ["k"], "s", "e", "v").collect()
    }
    assert out == {"2024-01-01": 12}


def test_grouped_ols_recovers_planted_lines(spark):
    from pipeline_dataengineer_spark.operators.timeseries import grouped_ols

    rows = []
    for i in range(50):
        rows.append(("a", float(i), 2.0 * i + 5.0))        # exact line
        rows.append(("b", float(i), -0.5 * i + 100.0))
    rows += [("deg", 1.0, 7.0)]                             # n=1
    rows += [("novar", 1.0, 3.0), ("novar", 1.0, 9.0)]      # zero x-var
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = {r["k"]: r for r in grouped_ols(df, ["k"], "x", "y").collect()}
    assert got["a"]["slope"] == 2.0 and got["a"]["intercept"] == 5.0
    assert got["a"]["r2"] == 1.0
    assert got["b"]["slope"] == -0.5 and got["b"]["r2"] == 1.0
    assert got["deg"]["slope"] is None and got["deg"]["n"] == 1
    assert got["novar"]["slope"] is None
