"""Offline ranking-quality evaluation: recall@k and NDCG@k.

The missing loop-closer for the retrieval/recommender stack (BM25,
cosine/IVF/PQ ANN, item similarity): given each query's ranked
candidate list and a relevance set, score the ranking — the metrics
every retrieval change is judged by before it ships.

    recall@k = |top-k ∩ relevant| / |relevant|
    NDCG@k   = DCG@k / IDCG@k,  DCG = Σ rel_i / log2(rank_i + 1)

Spark shape: one join of the top-k lists (k·queries rows — tiny by
construction) against the relevance pairs on (query, item), then a
per-query combinable aggregate; IDCG is a closed-form sum over
min(k, |relevant|) computed from the relevance counts — no second
ranking pass. Everything is exact arithmetic, so the whole
evaluation hash-checks against a SQL replay.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ranking_metrics(
    ranked: DataFrame,
    relevant: DataFrame,
    query_col: str,
    item_col: str,
    rank_col: str,
    k: int = 10,
    round_to: int = 4,
) -> DataFrame:
    """Per-query binary-relevance metrics.

    ``ranked``: (query, item, rank) with rank 1-based — rows beyond
    ``k`` are ignored. ``relevant``: (query, item) ground-truth
    pairs. Returns (query, n_relevant, n_hits, recall_at_k,
    ndcg_at_k). Queries with no relevant items are dropped (their
    metrics are undefined, not zero)."""
    r = ranked.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("__q"),
        F.col(item_col).alias("__i"),
        F.col(rank_col).alias("__r"),
    )
    rel = relevant.select(
        F.col(query_col).alias("__q"), F.col(item_col).alias("__i")
    ).distinct()
    n_rel = rel.groupBy("__q").agg(F.count("*").alias("n_relevant"))
    hits = r.join(rel, ["__q", "__i"])
    per_q = hits.groupBy("__q").agg(
        F.count("*").alias("n_hits"),
        F.sum(1.0 / F.log2(F.col("__r") + 1)).alias("__dcg"),
    )
    # IDCG@k for binary relevance depends only on min(k, n_relevant):
    # precompute the harmonic-ish prefix sums as a broadcast literal
    prefix = [0.0]
    for i in range(1, k + 1):
        prefix.append(prefix[-1] + 1.0 / math.log2(i + 1))
    idcg = F.element_at(
        F.array(*[F.lit(p) for p in prefix]),
        F.least(F.lit(k), F.col("n_relevant")).cast("int") + 1,
    )
    return (
        n_rel.join(per_q, "__q", "left")
        .select(
            F.col("__q").alias(query_col),
            "n_relevant",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.round(
                F.coalesce("n_hits", F.lit(0)) / F.col("n_relevant"),
                round_to,
            ).alias("recall_at_k"),
            F.round(
                F.coalesce("__dcg", F.lit(0.0)) / idcg, round_to
            ).alias("ndcg_at_k"),
        )
    )


def rank_biased_overlap(
    df: DataFrame,
    list_a: str,
    list_b: str,
    p: float = 0.9,
    out_col: str = "rbo",
    round_to: int = 6,
) -> DataFrame:
    """Rank-Biased Overlap (Webber, Moffat & Zobel 2010) between two
    ranked lists per row — the standard top-weighted similarity for
    comparing rankers (old model vs new model, engine A vs engine B):
    RBO@p = (1−p)·Σ_d p^(d−1)·|A_d ∩ B_d|/d over evaluated depths,
    extrapolated to depth min(|A|,|B|) (the truncated 'RBO_min' cut —
    deterministic, no infinite tail assumption).

    Pure Column algebra: one ``transform`` over depths with
    ``array_intersect`` of prefix slices — no UDF, no shuffle, rides
    the scan. Lists are compared as SETS per depth (standard RBO
    treats rankings as deduped); duplicate items upstream should be
    deduped first."""
    a, b = F.col(list_a), F.col(list_b)
    depth = F.least(F.size(a), F.size(b))
    terms = F.transform(
        F.sequence(F.lit(1), depth),
        lambda d: F.pow(F.lit(p), d.cast("double") - 1.0)
        * F.size(F.array_intersect(F.slice(a, 1, d), F.slice(b, 1, d)))
        / d.cast("double"),
    )
    rbo = F.lit(1.0 - p) * F.aggregate(
        terms, F.lit(0.0), lambda acc, x: acc + x
    )
    return df.withColumn(
        out_col,
        F.when(depth > 0, F.round(rbo, round_to)).otherwise(
            F.lit(None).cast("double")
        ),
    )
