"""Skew operators: salted results must equal unsalted results."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline_dataengineer_spark.operators.skew import salted_groupby_sum, salted_join


def test_salted_agg_equals_plain(spark):
    # 90% of rows share one hot key
    rows = [("hot" if i % 10 else f"k{i}", float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "k string, v double")
    plain = {
        (r["k"]): (round(r["s"], 6), r["c"])
        for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count("*").alias("c")).collect()
    }
    salted = {
        (r["k"]): (round(r["s"], 6), r["c"])
        for r in salted_groupby_sum(df, ["k"], {"s": "v"}, counts="c", salt=8).collect()
    }
    assert plain == salted


def test_salted_join_equals_plain(spark):
    big = spark.createDataFrame(
        [("hot" if i % 5 else f"k{i}", i) for i in range(500)], "k string, v long"
    )
    small = spark.createDataFrame(
        [("hot", "H"), ("k5", "A"), ("k10", "B")], "k string, tag string"
    )
    plain = sorted(map(tuple, big.join(small, "k").collect()))
    salted = sorted(map(tuple, salted_join(big, small, on="k", salt=4).select("k", "v", "tag").collect()))
    assert plain == salted


def test_broadcast_if_small_uses_plan_stats(spark):
    from pipeline_dataengineer_spark.operators.joins import broadcast_if_small

    nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    # file-backed plan => sizeInBytes estimate available, no count job
    small = broadcast_if_small(nation)
    plan = orders.join(
        small, orders.o_orderkey % 25 == small.n_nationkey
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # a 1-byte budget must refuse to broadcast via the stats path
    not_small = broadcast_if_small(nation, max_bytes=1)
    plan2 = orders.join(
        not_small, orders.o_orderkey % 25 == not_small.n_nationkey
    )._jdf.queryExecution().executedPlan().toString()
    # hint absent -> Catalyst may still pick broadcast on its own
    # threshold, so assert on the HINT, not the strategy: re-check via
    # the logical plan string.
    assert "ResolvedHint" not in not_small._jdf.queryExecution().logical().toString()


def test_auto_skew_join_equals_plain_join_on_skewed_data(spark):
    from pipeline_dataengineer_spark.operators.skew import auto_skew_join

    # one pathological key (0) with 2000 rows, 50 cold keys
    big = spark.createDataFrame(
        [(0, i) for i in range(2000)] + [(k, k) for k in range(1, 51)],
        ["k", "v"],
    )
    small = spark.createDataFrame([(k, f"dim{k}") for k in range(60)], ["k", "name"])
    hybrid = auto_skew_join(big, small, "k", hot_key_threshold=100, salt=4)
    plain = big.join(small, "k")
    assert sorted(map(tuple, hybrid.select("k", "v", "name").collect())) == \
        sorted(map(tuple, plain.select("k", "v", "name").collect()))


def test_auto_skew_join_no_hot_keys_degenerates_cleanly(spark):
    from pipeline_dataengineer_spark.operators.skew import auto_skew_join

    big = spark.createDataFrame([(k, k) for k in range(20)], ["k", "v"])
    small = spark.createDataFrame([(k, f"d{k}") for k in range(20)], ["k", "name"])
    out = auto_skew_join(big, small, "k", hot_key_threshold=5)
    assert out.count() == 20


def test_salted_join_rejects_outer_joins(spark):
    import pytest

    from pipeline_dataengineer_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, 1)], ["k", "v"])
    small = spark.createDataFrame([(1, "d")], ["k", "name"])
    with pytest.raises(ValueError, match="full outer"):
        salted_join(big, small, "k", how="full")
