"""PCA / covariance (operators/decomposition.py).

Laws checked against an independent driver-side numpy PCA on the
collected data: covariance parity, component orthonormality,
eigenvalue ordering, projection parity, and reconstruction-error
dominance of the top-k subspace.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pipeline_dataengineer_spark.operators.decomposition import (
    covariance_matrix,
    pca,
)


def _toy(spark, n=200, d=6, seed=7):
    rng = np.random.default_rng(seed)
    # anisotropic: variance concentrated in two directions
    basis = np.linalg.qr(rng.normal(size=(d, d)))[0]
    scales = np.array([10.0, 5.0, 1.0, 0.5, 0.2, 0.1])
    x = rng.normal(size=(n, d)) * scales @ basis.T + rng.normal(size=d)
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id: long, embedding: array<double>"),
        x,
    )


def test_covariance_matches_numpy(spark):
    df, x = _toy(spark)
    got = {(r["i"], r["j"]): r["cov"] for r in covariance_matrix(df).collect()}
    want = np.cov(x, rowvar=False, ddof=1)
    assert len(got) == x.shape[1] ** 2
    for (i, j), v in got.items():
        assert v == pytest.approx(want[i, j], rel=1e-9, abs=1e-12)


def test_covariance_dim_slice(spark):
    df, x = _toy(spark)
    got = covariance_matrix(df, dim=3).collect()
    assert len(got) == 9
    want = np.cov(x[:, :3], rowvar=False, ddof=1)
    for r in got:
        assert r["cov"] == pytest.approx(want[r["i"], r["j"]], rel=1e-9)


def test_pca_matches_numpy(spark):
    df, x = _toy(spark)
    k = 3
    proj_df, comps, evr = pca(df, k=k)
    # orthonormal components
    assert np.allclose(comps @ comps.T, np.eye(k), atol=1e-9)
    # eigenvalues descending and matching numpy's top-k
    w = np.sort(np.linalg.eigvalsh(np.cov(x, rowvar=False, ddof=1)))[::-1]
    assert np.allclose(evr, w[:k], rtol=1e-9)
    # projection parity (numpy PCA with the same sign canon)
    mu = x.mean(axis=0)
    wv, vv = np.linalg.eigh(np.cov(x, rowvar=False, ddof=1))
    ref = vv[:, np.argsort(wv)[::-1][:k]].T
    for row in ref:
        jmax = int(np.argmax(np.abs(row)))
        if row[jmax] < 0:
            row *= -1.0
    want = (x - mu) @ ref.T
    got = (
        proj_df.orderBy("vec_id")
        .select("pca")
        .toPandas()["pca"]
        .to_numpy()
    )
    got = np.stack(got)
    assert got.shape == (len(x), k)
    assert np.allclose(got, want, atol=1e-8)


def test_pca_variance_capture(spark):
    """Top-2 subspace of the anisotropic cloud captures ~ (100+25) /
    total of the variance; reconstruction error from k=2 is below
    10% of total variance."""
    df, x = _toy(spark)
    proj_df, comps, evr = pca(df, k=2)
    total = np.trace(np.cov(x, rowvar=False, ddof=1))
    assert evr.sum() / total > 0.9
    p = np.stack(
        proj_df.orderBy("vec_id").select("pca").toPandas()["pca"].to_numpy()
    )
    recon = p @ comps + x.mean(axis=0)
    err = ((x - recon) ** 2).sum() / ((x - x.mean(axis=0)) ** 2).sum()
    assert err < 0.1


def test_pca_keeps_other_columns(spark):
    df, _ = _toy(spark)
    out, _, _ = pca(df.withColumn("tag", F.col("vec_id") % 3), k=2)
    assert set(out.columns) == {"vec_id", "tag", "pca"}
    assert out.count() == df.count()


def test_mahalanobis_outliers_correlation_aware(spark):
    import numpy as np

    from pipeline_dataengineer_spark.operators.decomposition import (
        mahalanobis_outliers,
    )

    # points along y ~= x; the outlier is INSIDE both marginals but
    # off the correlation axis — per-column z-scores would miss it
    rng = np.random.default_rng(3)
    xs = rng.normal(0, 1.0, 400)
    pts = [(int(i), [float(x), float(x + rng.normal(0, 0.05))])
           for i, x in enumerate(xs)]
    pts.append((999, [1.0, -1.0]))  # anti-correlated point
    df = spark.createDataFrame(pts, "vid long, embedding array<double>")
    out = mahalanobis_outliers(df, "embedding", id_cols=["vid"]).collect()
    scores = {r["vid"]: r["maha_sq"] for r in out}
    top = max(scores, key=scores.get)
    assert top == 999
    # the planted point dominates by an order of magnitude
    rest = max(v for k, v in scores.items() if k != 999)
    assert scores[999] > 10 * rest
    # threshold wiring
    flagged = mahalanobis_outliers(
        df, "embedding", id_cols=["vid"], threshold=scores[999] / 2
    ).filter("is_outlier").collect()
    assert [r["vid"] for r in flagged] == [999]
