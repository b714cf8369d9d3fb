"""PCA / covariance decomposition over embedding columns.

The 100-TB shape: the covariance matrix of an n x d embedding table
is a MONOID — per-partition partials (n, sum vector, sum of outer
products) merge by plain addition — so one Arrow pass over the data
reduces everything to d + d^2 numbers, and only those reach the
driver (same bounded-driver-traffic contract as clustering.kmeans's
k*d centroid pull). The corpus is never shuffled and never collected;
the eigendecomposition runs on the d x d matrix driver-side (d is a
model constant, 64 here), and the projection back over the corpus is
a broadcast matmul in one vectorized Arrow batch pass.

The naive relational alternative (explode + self-join on row id to
form (i, j, xi*xj) pairs) multiplies the corpus by d^2 before
aggregating — 4096x row blowup at d=64 — which is exactly what the
partial-aggregate formulation avoids.

Reference parity: the reference engine has no decomposition ops; this
belongs to the LLM-data-pipeline surface (embedding whitening /
dimensionality reduction before ANN and clustering).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_PARTIAL_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s", ArrayType(DoubleType())),  # sum vector, d
        StructField("ss", ArrayType(DoubleType())),  # outer-product sums, d*d
    ]
)


def _partial_moments(vec_col: str, dim: int):
    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if dim is not None:
                x = x[:, :dim]
            yield pd.DataFrame(
                {
                    "n": [len(x)],
                    "s": [x.sum(axis=0)],
                    "ss": [(x.T @ x).ravel()],
                }
            )

    return gen


def covariance_matrix(
    df: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> DataFrame:
    """Long-form sample covariance: one row per (i, j) with
    ``cov = (ss_ij - s_i*s_j/n) / (n-1)``.

    One Arrow pass emits a (n, sum, outer-sum) partial per batch; the
    partials merge RELATIONALLY (posexplode to (idx, val) and a
    combinable groupBy-sum — never a driver collect), so the result
    is itself a small lazy DataFrame usable inside larger plans.
    """
    partials = df.select(vec_col).mapInPandas(
        _partial_moments(vec_col, dim), schema=_PARTIAL_SCHEMA
    )
    # merge: total n broadcast-joined onto the exploded per-index sums
    totals = partials.groupBy().agg(F.sum("n").alias("n"))
    s_long = (
        partials.select(F.posexplode("s").alias("i", "v"))
        .groupBy("i")
        .agg(F.sum("v").alias("s"))
    )
    ss_long = (
        partials.select(F.posexplode("ss").alias("k", "v"))
        .groupBy("k")
        .agg(F.sum("v").alias("ss"))
    )
    d_expr = F.round(F.sqrt(F.max("k") + 1)).cast("int")
    d = ss_long.agg(d_expr.alias("d"))
    ss_ij = ss_long.crossJoin(F.broadcast(d)).select(
        F.floor(F.col("k") / F.col("d")).cast("int").alias("i"),
        F.pmod("k", F.col("d")).cast("int").alias("j"),
        "ss",
    )
    si = s_long.select(F.col("i"), F.col("s").alias("s_i"))
    sj = s_long.select(F.col("i").alias("j"), F.col("s").alias("s_j"))
    return (
        ss_ij.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .crossJoin(F.broadcast(totals))
        .select(
            "i",
            "j",
            (
                (F.col("ss") - F.col("s_i") * F.col("s_j") / F.col("n"))
                / (F.col("n") - 1)
            ).alias("cov"),
        )
    )


def pca(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    out_col: str = "pca",
    center: bool = True,
) -> tuple[DataFrame, np.ndarray, np.ndarray]:
    """Project ``vec_col`` onto its top-k principal components.

    Returns ``(projected df, components (k, d), explained_variance (k,))``.
    The covariance collect is d^2 doubles (bounded by the model dim,
    not the data); the projection is a broadcast matmul Arrow pass —
    the corpus itself is never shuffled.

    Determinism: numpy ``eigh`` on the same d x d matrix is
    reproducible; the sign of each component is canonicalized so the
    largest-|coefficient| entry is positive (eigenvector sign is
    otherwise arbitrary).
    """
    cov_rows = covariance_matrix(df, vec_col).collect()  # d^2 doubles
    d = max(r["i"] for r in cov_rows) + 1
    cov = np.zeros((d, d))
    for r in cov_rows:
        cov[r["i"], r["j"]] = r["cov"]
    mean_rows = (
        df.select(F.posexplode(vec_col).alias("i", "v"))
        .groupBy("i")
        .agg(F.avg("v").alias("m"))
        .collect()
    )  # d doubles
    mu = np.zeros(d)
    for r in mean_rows:
        mu[r["i"]] = r["m"]
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T  # (k, d)
    # canonical sign: largest-magnitude coefficient positive
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    evr = w[order]
    comps_c = comps.copy()
    mu_c = mu if center else np.zeros(d)

    def project(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            p = (x - mu_c) @ comps_c.T
            out = pdf.drop(columns=[vec_col])
            out[out_col] = list(p)
            yield out

    out_schema = StructType(
        [f for f in df.schema.fields if f.name != vec_col]
        + [StructField(out_col, ArrayType(DoubleType()))]
    )
    return df.mapInPandas(project, schema=out_schema), comps, evr


def mahalanobis_outliers(
    df: DataFrame,
    vec_col: str = "embedding",
    threshold: float | None = None,
    id_cols: list[str] | None = None,
    ridge: float = 1e-6,
    round_to: int = 4,
) -> DataFrame:
    """Multivariate outlier scoring: squared Mahalanobis distance
    ``(x−μ)ᵀ Σ⁻¹ (x−μ)`` of every vector from the corpus centroid
    under the corpus covariance — the classic correlated-features
    outlier test (a point can be unremarkable per-dimension yet far
    off the data's correlation structure; per-column z-scores miss
    it). Adds ``maha_sq`` and, with ``threshold`` (compare to a
    chi-square(d) quantile), ``is_outlier``.

    Scale shape: mean and covariance come from the ONE-pass monoid
    partials above (d + d² numbers to the driver — a model-constant
    cost); Σ⁻¹ inverts driver-side with a ridge for near-singular
    corpora; the scoring pass is a single vectorized Arrow map with
    (x−μ) @ Σ⁻¹ as one numpy matmul per batch — the corpus is never
    shuffled and never collected."""
    cov_rows = covariance_matrix(df, vec_col).collect()
    d = max(r["i"] for r in cov_rows) + 1
    cov = np.zeros((d, d))
    for r in cov_rows:
        cov[r["i"], r["j"]] = r["cov"]
    # mean from one combinable aggregate (element-wise sum / n)
    sums = (
        df.select(F.posexplode(vec_col).alias("i", "v"))
        .groupBy("i")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        .collect()
    )
    mu = np.zeros(d)
    n = 0
    for r in sums:
        mu[r["i"]] = r["s"] / r["n"]
        n = r["n"]
    prec = np.linalg.inv(cov + ridge * np.eye(d))

    import pyarrow as pa

    out_fields = (id_cols or []) + ["maha_sq"]

    def score(batches):
        for batch in batches:
            tbl = batch.to_pydict()
            X = np.asarray(tbl[vec_col], dtype=np.float64)
            delta = X - mu
            m = np.einsum("bi,ij,bj->b", delta, prec, delta)
            arrays = [
                pa.array(tbl[c]) for c in (id_cols or [])
            ] + [pa.array(np.round(m, round_to))]
            yield pa.RecordBatch.from_arrays(arrays, names=out_fields)

    from pyspark.sql import types as T

    schema = T.StructType(
        [df.schema[c] for c in (id_cols or [])]
        + [T.StructField("maha_sq", T.DoubleType())]
    )
    scored = df.select(*(id_cols or []), vec_col).mapInArrow(score, schema)
    if threshold is not None:
        scored = scored.withColumn(
            "is_outlier", F.col("maha_sq") > threshold
        )
    return scored


def pca_fit(
    df: DataFrame, vec_col: str, k: int
) -> tuple[list[list[float]], list[float], list[float]]:
    """Fit-only companion to ``pca``: returns (components,
    explained_variance, mean) as plain Python lists, computed from
    the same relational covariance/mean collects (d + d² doubles of
    driver traffic). Components are sign-canonicalized identically
    to ``pca``."""
    cov_rows = covariance_matrix(df, vec_col).collect()
    d = max(r["i"] for r in cov_rows) + 1
    cov = np.zeros((d, d))
    for r in cov_rows:
        cov[r["i"], r["j"]] = r["cov"]
    mean_rows = (
        df.select(F.posexplode(vec_col).alias("i", "v"))
        .groupBy("i")
        .agg(F.avg("v").alias("m"))
        .collect()
    )
    mu = np.zeros(d)
    for r in mean_rows:
        mu[r["i"]] = r["m"]
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = []
    for j in order:
        vec = v[:, j]
        pivot = int(np.argmax(np.abs(vec)))
        if vec[pivot] < 0:
            vec = -vec
        comps.append([float(x) for x in vec])
    return (
        comps,
        [float(w[j]) for j in order],
        [float(x) for x in mu],
    )


def pca_project(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    round_to: int | None = None,
) -> DataFrame:
    """Fit on ``df`` and project every row to SCALAR columns
    (id, pc_1 .. pc_k) with pc_j = (x − μ)·component_j — the
    zero-Python variant of ``pca``'s Arrow matmul: components are
    broadcast as literal arrays and each score is a JVM
    zip_with/aggregate dot product riding the scan (one narrow map,
    no shuffle, no Python worker in the row-scale path). Use this
    when k is small and downstream wants plain columns (bucketing,
    filters); use ``pca`` when downstream wants the projected vector
    itself."""
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
