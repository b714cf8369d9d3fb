"""ALS matrix factorization — the collaborative-filtering recommender
as alternating relational least squares.

Each half-iteration is the same two-step plan: join the ratings table
to the OTHER side's current factors on that side's id (an ordinary
equi-join — the only shuffle), then solve one rank x rank ridge
system per entity in a grouped Arrow map. Factors live in DataFrames
throughout; per-iteration driver traffic is zero (``localCheckpoint``
bounds the plan, not a collect). This is the standard large-scale ALS
decomposition (join + per-key solve), expressed on DataFrames instead
of the block-matrix RDD formulation MLlib uses internally.

Scale notes:

- work per half-iteration is O(|ratings| * rank) join traffic plus a
  rank^3 solve per entity — rank is a small model constant (8-64);
- a pathological entity (a user with millions of ratings) buffers its
  whole rating vector in one grouped-map task, the same hot-key story
  as any groupBy; precondition with ``sampling.group_sample`` to cap
  per-entity degree when the degree distribution is unbounded (the
  industry fix — rating caps change the loss negligibly);
- determinism: factor init is the non-linear scramble of (id, dim) — no RNG,
  stable across layouts — and each solve sorts its group by the other
  side's id so float summation order is fixed. Two runs agree
  bit-for-bit.

Reference parity: no recommender in the reference (a ~470-LoC ETL
script); this extends the LLM-data-pipeline surface (embedding-style
factor tables for retrieval/ranking) like clustering and PQ.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StructField,
    StructType,
)

from pipeline_dataengineer_spark.operators.sampling import portable_scramble

_B = 1_000_003


def _init_factors(ids: DataFrame, id_col: str, rank: int) -> DataFrame:
    """Deterministic small init in [-0.5, 0.5) / rank per dim from
    the NON-LINEAR scramble of (id * 31 + dim) — layout-independent.
    The scramble, not the affine Lehmer bucket: under the affine map
    adjacent ids' init vectors were coordinate-wise translated copies
    of each other (constant stride per id step), a correlated init
    the iterations then had to wash out."""
    dims = [
        (
            (
                F.pmod(
                    portable_scramble(
                        F.col(id_col).cast("long") * 31 + F.lit(j)
                    ),
                    F.lit(_B),
                )
                / F.lit(float(_B))
                - 0.5
            )
            / F.lit(float(rank))
        ).cast("double")
        for j in range(rank)
    ]
    return ids.select(id_col, F.array(*dims).alias("factors"))


def _solve_side(
    ratings: DataFrame,
    other_factors: DataFrame,
    solve_col: str,
    other_col: str,
    rating_col: str,
    rank: int,
    reg: float,
) -> DataFrame:
    """One half-iteration: re-solve ``solve_col``'s factors against
    fixed ``other_col`` factors. Ridge normal equations per entity
    with the standard weighted-lambda (reg scaled by the entity's
    rating count)."""
    joined = ratings.join(
        other_factors.withColumnRenamed("factors", "__of").withColumnRenamed(
            other_factors.columns[0], other_col
        ),
        other_col,
    ).select(solve_col, other_col, rating_col, "__of")

    out_schema = StructType(
        [
            joined.schema[solve_col],
            StructField("factors", ArrayType(DoubleType())),
        ]
    )

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(other_col, kind="mergesort")
        m = np.stack(pdf["__of"].to_numpy()).astype(np.float64)
        r = pdf[rating_col].to_numpy(dtype=np.float64)
        a = m.T @ m + reg * len(pdf) * np.eye(rank)
        x = np.linalg.solve(a, m.T @ r)
        return pd.DataFrame(
            {solve_col: [pdf[solve_col].iloc[0]], "factors": [x]}
        )

    return joined.groupBy(solve_col).applyInPandas(solve, out_schema)


def als(
    ratings: DataFrame,
    user_col: str = "user_id",
    item_col: str = "item_id",
    rating_col: str = "rating",
    rank: int = 8,
    reg: float = 0.1,
    iterations: int = 10,
) -> tuple[DataFrame, DataFrame]:
    """Factor the (user, item, rating) table; returns
    ``(user_factors, item_factors)`` — each (id, factors array<double>).
    """
    r = ratings.select(user_col, item_col, rating_col)
    item_f = _init_factors(
        r.select(item_col).distinct(), item_col, rank
    ).localCheckpoint()
    user_f = None
    for _ in range(iterations):
        user_f = _solve_side(
            r, item_f, user_col, item_col, rating_col, rank, reg
        ).localCheckpoint()
        item_f = _solve_side(
            r, user_f, item_col, user_col, rating_col, rank, reg
        ).localCheckpoint()
    return user_f, item_f


def predict_ratings(
    pairs: DataFrame,
    user_factors: DataFrame,
    item_factors: DataFrame,
    user_col: str = "user_id",
    item_col: str = "item_id",
) -> DataFrame:
    """Score (user, item) pairs: the factor dot product, as a
    zip_with/aggregate codegen expression after two equi-joins — no
    Python in the scoring path."""
    uf = user_factors.withColumnRenamed("factors", "__uf")
    itf = item_factors.withColumnRenamed("factors", "__if")
    dot = F.aggregate(
        F.zip_with("__uf", "__if", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        pairs.join(uf, user_col)
        .join(itf, item_col)
        .withColumn("prediction", dot)
        .drop("__uf", "__if")
    )


def recommend_top_k(
    user_factors: DataFrame,
    item_factors: DataFrame,
    k: int = 10,
    user_col: str = "user_id",
    item_col: str = "item_id",
) -> DataFrame:
    """Top-k items per user by predicted score. Broadcast the item
    factors (catalog-sized) against the user table — users never
    shuffle; the per-user top-k is a bounded numpy partial sort
    inside one Arrow pass, the same corpus-unshuffled shape as
    similarity.cosine_topk."""
    items = item_factors.collect()  # catalog-sized: n_items x rank
    ids = np.array([row[0] for row in items])
    mat = np.stack([np.asarray(row["factors"]) for row in items])

    out_schema = StructType(
        [
            user_factors.schema[user_col],
            item_factors.schema[item_col],
            StructField("prediction", DoubleType()),
            StructField("rank", DoubleType()),
        ]
    )

    def topk(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            u = np.stack(pdf["factors"].to_numpy()).astype(np.float64)
            scores = u @ mat.T  # (b, n_items)
            kk = min(k, scores.shape[1])
            idx = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
            rows = []
            for bi in range(len(pdf)):
                order = idx[bi][np.argsort(-scores[bi, idx[bi]], kind="stable")]
                for rnk, ii in enumerate(order, 1):
                    rows.append(
                        (
                            pdf.iloc[bi, pdf.columns.get_loc(user_col)],
                            ids[ii],
                            float(scores[bi, ii]),
                            float(rnk),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[user_col, item_col, "prediction", "rank"]
            )

    return user_factors.mapInPandas(topk, out_schema)


def negative_samples(
    interactions: DataFrame,
    items: DataFrame,
    user_col: str = "user_id",
    item_col: str = "item_id",
    k: int = 4,
    oversample: int = 3,
    seed: int = 17,
) -> DataFrame:
    """Deterministic negative sampling for implicit-feedback training
    (the word2vec/BPR data-prep step): for every user in
    ``interactions``, up to ``k`` items they did NOT interact with,
    drawn pseudo-randomly from the ``items`` catalog.

    Fully relational and engine-portable: candidate i for a user is
    the catalog item at scramble(user * 131 + i * 7 + seed) mod n
    (dense catalog indices from one catalog-sized row_number window);
    candidates explode k*oversample wide (a constant), the user's
    true interactions are removed with ONE anti-join on (user, item),
    and the first k survivors per user (by draw order, dupes dropped
    keeping the earliest draw) are kept via a per-user rank window
    over the ~k*oversample survivors. No RNG, stable under layout —
    the same determinism contract as sampling.py. Oversampling
    bounds the miss probability (a user interacting with most of the
    catalog may receive fewer than k; callers needing exactness use
    a higher oversample, the group_sample guard pattern)."""
    from pyspark.sql import Window


    n_items_row = items.agg(F.count("*").alias("n"))
    idx = items.select(
        F.col(item_col),
        (
            F.row_number().over(Window.orderBy(item_col)) - 1
        ).alias("__idx"),
    )
    users = interactions.select(user_col).distinct()
    m = int(k) * int(oversample)
    cands = (
        users.crossJoin(F.broadcast(n_items_row))
        .select(
            user_col,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(m - 1)),
                    lambda i: F.pmod(
                        portable_scramble(
                            F.col(user_col).cast("long") * 131
                            + i * 7
                            + F.lit(seed)
                        ),
                        F.lit(1_000_000),
                    )
                    % F.col("n"),
                )
            ).alias("__draw", "__idx"),
        )
    )
    with_items = cands.join(F.broadcast(idx), "__idx")
    fresh = with_items.join(
        interactions.select(user_col, item_col).distinct(),
        [user_col, item_col],
        "left_anti",
    )
    w_dup = Window.partitionBy(user_col, item_col).orderBy("__draw")
    w_rank = Window.partitionBy(user_col).orderBy("__draw")
    return (
        fresh.withColumn("__dup", F.row_number().over(w_dup))
        .filter(F.col("__dup") == 1)
        .withColumn("__rk", F.row_number().over(w_rank))
        .filter(F.col("__rk") <= k)
        .select(user_col, item_col, (F.col("__rk") - 1).alias("neg_rank"))
    )
