"""Count-Min sketch properties (functions/sketches.py:cm_states /
merge_cm / cm_estimate): the one-sided overestimate guarantee, the
merge monoid law, the weighted build, and the error bound in the
collision-free configuration."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline_dataengineer_spark.functions.sketches import (
    cm_estimate,
    cm_states,
    merge_cm,
)


def _skewed_df(spark, n=3000, mod=97):
    # Zipf-ish: key k appears roughly n/(k+1) times via modulo folding
    return spark.range(n).select(
        (F.col("id") % mod).alias("v"), F.lit(1).alias("w")
    )


def test_cm_estimate_never_underestimates(spark):
    """The CM invariant: every estimate >= the true count, for every
    item, at a width small enough that collisions certainly occur."""
    df = _skewed_df(spark)
    true = {r["v"]: r["cnt"] for r in df.groupBy("v").agg(
        F.count("*").alias("cnt")).collect()}
    state = cm_states(df, [], "v", depth=4, width=32)
    items = df.select("v").distinct()
    est = {r["v"]: r["est_count"] for r in cm_estimate(
        state, items, "v", depth=4, width=32).collect()}
    assert set(est) == set(true)
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)


def test_cm_exact_when_width_dominates_domain(spark):
    """With width far above the distinct-value count the affine hashes
    are collision-free over this domain and every estimate is exact —
    the lossless configuration backing the q_countmin oracle."""
    df = _skewed_df(spark, n=2000, mod=53)
    true = {r["v"]: r["cnt"] for r in df.groupBy("v").agg(
        F.count("*").alias("cnt")).collect()}
    state = cm_states(df, [], "v", depth=4, width=1 << 16)
    est = {r["v"]: r["est_count"] for r in cm_estimate(
        state, df.select("v").distinct(), "v", depth=4, width=1 << 16
    ).collect()}
    assert est == true


def test_cm_merge_equals_single_build(spark):
    """Monoid law: build on two halves then merge == build once on the
    union — the incremental-maintenance contract."""
    df = _skewed_df(spark)
    a = df.filter(F.col("v") % 2 == 0)
    b = df.filter(F.col("v") % 2 == 1)
    merged = merge_cm(
        cm_states(a, [], "v", depth=3, width=64),
        cm_states(b, [], "v", depth=3, width=64),
        keys=[],
    )
    direct = cm_states(df, [], "v", depth=3, width=64)
    ms = {(r["d"], r["bucket"]): r["cnt"] for r in merged.collect()}
    ds = {(r["d"], r["bucket"]): r["cnt"] for r in direct.collect()}
    assert ms == ds


def test_cm_weighted_build(spark):
    """weight_col turns the sketch into a weighted-frequency table:
    estimates bound sum(weight) per item from above."""
    df = _skewed_df(spark)
    true = {r["v"]: r["s"] for r in df.groupBy("v").agg(
        F.sum("w").alias("s")).collect()}
    state = cm_states(df, [], "v", depth=4, width=1 << 16, weight_col="w")
    est = {r["v"]: r["est_count"] for r in cm_estimate(
        state, df.select("v").distinct(), "v", depth=4, width=1 << 16
    ).collect()}
    assert est == true  # collision-free width -> exact weighted sums


def test_cm_absent_item_estimates_bounded_not_negative(spark):
    """Items never inserted get a small non-negative estimate (0 when
    their buckets are empty) — the left-join coalesce path."""
    df = _skewed_df(spark, n=500, mod=7)
    state = cm_states(df, [], "v", depth=4, width=1 << 14)
    items = spark.range(1_000_000, 1_000_005).select(
        F.col("id").alias("v"))
    est = cm_estimate(state, items, "v", depth=4, width=1 << 14).collect()
    assert len(est) == 5
    for r in est:
        assert r["est_count"] >= 0


def test_cm_grouped_keys(spark):
    """Per-group sketches: keys partition the state; estimates are
    per (key, item)."""
    df = spark.range(1000).select(
        (F.col("id") % 2).alias("g"), (F.col("id") % 11).alias("v")
    )
    state = cm_states(df, ["g"], "v", depth=3, width=1 << 12)
    items = df.select("g", "v").distinct()
    est = cm_estimate(state, items, "v", keys=["g"], depth=3, width=1 << 12)
    true = df.groupBy("g", "v").agg(F.count("*").alias("c"))
    j = est.join(true, ["g", "v"]).collect()
    assert len(j) == 22
    for r in j:
        assert r["est_count"] == r["c"]


def test_maintain_sketch_view_cm_incremental(spark, tmp_path):
    """Count-Min rides the incremental sketch-view machinery: two
    source batches folded by the counter monoid give the same
    estimates as a one-shot build over the union (exact here — the
    width dominates the tiny domain)."""
    from pipeline_dataengineer_spark.operators.snapshots import (
        append_snapshot,
        maintain_sketch_view,
        read_snapshot,
        write_snapshot,
    )

    src = str(tmp_path / "cmsrc")
    view = str(tmp_path / "cmview")
    b1 = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("b", 5)], "g string, v int"
    )
    b2 = spark.createDataFrame(
        [("a", 1), ("b", 5), ("b", 6)], "g string, v int"
    )
    write_snapshot(b1, src)
    m = maintain_sketch_view(spark, src, view, ["g"], "v", family="cm")
    assert m["sketch_family"] == "cm"
    append_snapshot(b2, src)
    maintain_sketch_view(spark, src, view, ["g"], "v", family="cm")
    state = read_snapshot(spark, view)
    items = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 5), ("b", 6)], "g string, v int"
    )
    est = {
        (r["g"], r["v"]): r["est_count"]
        for r in cm_estimate(state, items, "v", keys=["g"]).collect()
    }
    assert est == {("a", 1): 3, ("a", 2): 1, ("b", 5): 2, ("b", 6): 1}
