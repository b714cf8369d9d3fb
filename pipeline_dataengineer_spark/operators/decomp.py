"""PCA over an embedding column — the dimensionality-reduction /
whitening step of an embedding pipeline (before clustering, ANN
bucketing, or near-dup thresholds).

Scale shape (the only sane one for tall-skinny data, X: n×d with
n ≫ d): the d×d Gram/covariance matrix is a COMBINABLE per-partition
aggregate — each partition reduces its rows to one d² vector with
numpy, partials sum to d² doubles on the driver, and the eigen
decomposition of the d×d result is a driver-side numpy call (d is
the embedding width, 16–4096; d² doubles is KBs–MBs). The projection
back over the rows is pure JVM array algebra (zip_with/aggregate dot
products against broadcast literal components) — no Python in the
row-scale path.

Determinism: eigenvectors are sign-fixed (largest-|coordinate| entry
made positive, first-index tie-break) so repeated fits emit identical
components; eigh itself is deterministic for a fixed matrix.

Reference impls for parity: sklearn.decomposition.PCA(svd_solver=
"full") up to component sign.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pca_fit(
    df: DataFrame, vec_col: str, k: int
) -> tuple[list[list[float]], list[float], list[float]]:
    """Fit PCA on ``vec_col`` (array<numeric>, fixed width d).
    Returns (components, explained_variance, mean): ``components``
    is k rows of d floats (descending eigenvalue order, sign-fixed),
    ``explained_variance`` the k sample eigenvalues."""
    first = df.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("pca_fit: empty input")
    d = int(first["d"])

    part_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
            T.StructField("ss", T.ArrayType(T.DoubleType())),
        ]
    )

    def partial(batches):
        import pandas as pd

        n, s, ss = 0, np.zeros(d), np.zeros((d, d))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            n += x.shape[0]
            s += x.sum(axis=0)
            ss += x.T @ x
        if n:
            yield pd.DataFrame(
                [
                    {
                        "n": n,
                        "s": s.tolist(),
                        "ss": ss.reshape(-1).tolist(),
                    }
                ]
            )

    parts = df.select(vec_col).mapInPandas(partial, part_schema).collect()
    n = sum(r["n"] for r in parts)
    if n < 2:
        raise ValueError("pca_fit: need at least 2 rows")
    s = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
    ss = np.sum(
        [np.asarray(r["ss"]).reshape(d, d) for r in parts], axis=0
    )
    mu = s / n
    cov = (ss - n * np.outer(mu, mu)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = []
    for j in order:
        v = evecs[:, j]
        # sign fix: the largest-|coordinate| entry is made positive
        # (ties broken by lowest index via argmax's first-hit rule)
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append([float(x) for x in v])
    return (
        comps,
        [float(evals[j]) for j in order],
        [float(x) for x in mu],
    )


def pca_project(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    round_to: int | None = None,
) -> DataFrame:
    """Fit on ``df`` and project every row: (id, pc_1 .. pc_k) with
    pc_j = (x − μ)·component_j. The projection is JVM-side array
    algebra over broadcast literal components — one narrow map over
    the rows, no Python, no shuffle."""
    comps, _, mu = pca_fit(df, vec_col, k)
    mu_lit = F.array(*[F.lit(m) for m in mu])
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        mu_lit,
        lambda x, m: x - m,
    )
    cols = []
    for j, c in enumerate(comps):
        c_lit = F.array(*[F.lit(x) for x in c])
        dot = F.aggregate(
            F.zip_with(centered, c_lit, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        if round_to is not None:
            dot = F.round(dot, round_to)
        cols.append(dot.alias(f"pc_{j + 1}"))
    return df.select(F.col(id_col), *cols)
