"""Distributed k-means over embedding columns (Lloyd's algorithm).

Semantic dedup / corpus curation clusters embeddings (then prunes or
rebalances per cluster); this is the iterative-algorithm counterpart
to ``operators/graph.py``. Division of labor per iteration:

- **assignment** (the O(N·k·d) part) is a vectorized Arrow batch UDF —
  one numpy ``(batch, d) @ (d, k)`` matmul per Arrow batch with the
  centroid matrix shipped in the closure (k·d doubles — broadcast-
  small by construction);
- **centroid update** is relational: ``posexplode`` the vector and
  average per (cluster, dim) — a map-side-combined aggregate whose
  output is k·d rows, the only thing that ever reaches the driver.

The driver never sees data rows, only the k×d centroid matrix — the
same contract as Spark MLlib's own KMeans (treeAggregate to driver),
so the pattern holds at 100 TB with 1000 executors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType


def _make_assign_udf(centroids: np.ndarray):
    cents = centroids.astype(np.float64)  # (k, d)
    sq = (cents * cents).sum(axis=1)  # ||c||² per centroid

    @pandas_udf(IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        x = np.stack(vecs.to_numpy()).astype(np.float64)  # (b, d)
        # argmin ||x-c||² = argmin ||c||² - 2·x·c  (||x||² constant per row)
        d2 = sq[None, :] - 2.0 * (x @ cents.T)
        return pd.Series(np.argmin(d2, axis=1).astype(np.int32))

    return assign


def kmeans(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    max_iterations: int = 20,
    tol: float = 1e-6,
) -> DataFrame:
    """Cluster rows; returns the input plus an int ``cluster`` column.

    Deterministic: initial centroids are the k smallest-id vectors
    (not a random sample), ties in assignment break to the lowest
    cluster index (np.argmin), so reruns agree bit-for-bit given the
    same data.
    """
    first = (
        df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )  # k rows — driver-side by design, same as any k-means init
    cents = np.array([list(r[vec_col]) for r in first], dtype=np.float64)
    for _ in range(max_iterations):
        assign = _make_assign_udf(cents)
        assigned = df.withColumn("cluster", assign(F.col(vec_col)))
        new_rows = (
            assigned.select("cluster", F.posexplode(vec_col).alias("dim", "v"))
            .groupBy("cluster", "dim")
            .agg(F.avg("v").alias("m"))
            .collect()
        )  # k·d rows — the only driver traffic per iteration
        new_cents = cents.copy()  # empty clusters keep their centroid
        for r in new_rows:
            new_cents[r.cluster, r.dim] = r.m
        shift = float(np.abs(new_cents - cents).max())
        cents = new_cents
        if shift < tol:
            break
    final_assign = _make_assign_udf(cents)
    return df.withColumn("cluster", final_assign(F.col(vec_col)))


def cluster_sizes(df: DataFrame, vec_col: str = "embedding", **kw) -> DataFrame:
    """(cluster, cnt) summary — the shape a curation pipeline reads to
    decide per-cluster sampling rates."""
    return (
        kmeans(df, vec_col=vec_col, **kw)
        .groupBy("cluster")
        .agg(F.count("*").alias("cnt"))
    )
