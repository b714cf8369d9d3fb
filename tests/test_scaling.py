

def test_boxcox_recovers_generating_lambda(spark):
    """Data generated as exp(normal-ish) prefers lambda=0 (log); data
    already symmetric prefers lambda=1 (identity); the transform
    de-skews: |skewness| shrinks under the chosen lambda."""
    from pyspark.sql import functions as F

    from pipeline_dataengineer_spark.operators.scaling import (
        boxcox_lambda,
        boxcox_transform,
    )

    # lognormal-ish via exp of a symmetric triangular-ish variable
    base = spark.range(2000).select(
        (
            F.exp(
                ((F.col("id") % 100) / 100.0)
                + (F.floor(F.col("id") / 100) % 10) / 10.0
            )
        ).alias("x")
    )
    tab = {r["lam"]: r for r in boxcox_lambda(base, "x").collect()}
    best = [lam for lam, r in tab.items() if r["best"]]
    assert best == [0.0]  # log is the MLE for exponentiated data

    ident = spark.range(2000).select(
        (10.0 + (F.col("id") % 100) / 10.0).alias("x")
    )
    tab2 = {r["lam"]: r for r in boxcox_lambda(ident, "x").collect()}
    best2 = [lam for lam, r in tab2.items() if r["best"]]
    assert 0.0 not in best2  # uniform data does NOT want the log

    # transform at the chosen lambda reduces skewness
    sk = base.select(F.skewness("x").alias("s")).collect()[0]["s"]
    t = boxcox_transform(base, "x", 0.0, out_col="y")
    sk_t = t.select(F.skewness("y").alias("s")).collect()[0]["s"]
    assert abs(sk_t) < abs(sk)

    # non-positive rows excluded / NULL out
    mixed = spark.createDataFrame(
        [(1.0,), (-2.0,), (None,), (4.0,)], "x double"
    )
    out = boxcox_transform(mixed, "x", 0.5, out_col="y").collect()
    got = {r["x"]: r["y"] for r in out}
    assert got[-2.0] is None and got[None] is None
    assert got[4.0] is not None
