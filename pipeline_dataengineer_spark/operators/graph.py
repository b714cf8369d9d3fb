"""Iterative graph operators for dedup clustering.

Near-duplicate detection yields PAIRS; acting on them (keep one doc
per duplicate group) needs CLUSTERS — i.e. connected components over
the pair graph. Implemented as iterative min-label propagation:
every node repeatedly adopts the smallest label among itself and its
neighbors until a fixpoint. Each iteration is one join + one
aggregate (two shuffles on node id); iterations = graph diameter
(small for dedup graphs, which are near-cliques). This is the
standard Spark CC shape — driver only checks a one-row convergence
count per iteration, no data ever collects."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(src, dst) edge list → (node, component) with component = min
    node id reachable. Deterministic for any input edge set."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    # localCheckpoint, not persist: persist caches DATA but Catalyst
    # still re-analyzes the full recursive plan each iteration — plan
    # depth doubles per round and analysis time grows exponentially
    # (measured: iteration 10 of a 10-node chain never finished).
    # localCheckpoint truncates the logical plan to the materialized
    # result, keeping every iteration O(1) to plan.
    edges = edges.localCheckpoint()
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    prev_checksum = None
    for _ in range(max_iterations):
        # candidate label for each node: min over neighbors' labels
        neighbor_labels = (
            edges.join(labels, edges.b == labels.node)
            .select(F.col("a").alias("node"), "component")
        )
        labels = (
            labels.select("node", "component")
            .union(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()  # eager: materializes + truncates plan
        )
        # Convergence via a monotone checksum: labels only ever
        # decrease, so sum(component) is strictly decreasing until
        # the fixpoint. One cheap aggregate over the checkpointed
        # result; no join needed.
        checksum = labels.agg(F.sum("component")).collect()[0][0]
        if checksum == prev_checksum:
            break
        prev_checksum = checksum
    return labels.select("node", "component")


def dedup_keep_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Collapse near-duplicate clusters: keep only the canonical
    (min-id) member of each connected component; rows not in any pair
    pass through. The end-to-end LLM-corpus dedup step: LSH pairs →
    components → one survivor per cluster."""
    comps = connected_components(pairs, src, dst)
    non_canonical = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(non_canonical, on=id_col, how="left_anti")


def pagerank(
    edges_df: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iterations: int = 20,
    tol: float = 1e-6,
) -> DataFrame:
    """PageRank over a directed edge list → (node, rank), ranks
    summing to ~1. The canonical importance prior for web-corpus
    curation (rank-weighted sampling, per-domain quality priors).

    Power iteration in pure relational form: contributions =
    rank/out_degree joined through the edge list, summed per dst —
    one join + one map-side-combinable aggregate (two shuffles) per
    iteration, the same bounded-plan shape as connected_components
    (localCheckpoint per round keeps planning O(1); at 100 TB,
    pre-partition edges by src so the join never reshuffles the edge
    table — it is loop-invariant).

    Dangling nodes (no out-edges) redistribute their mass uniformly —
    the standard stochastic-matrix completion — so total rank is
    conserved and results match NetworkX's pagerank for the same
    damping/tolerance. Convergence = L1 delta < tol, checked with a
    one-row aggregate per round (no data collects to the driver).
    """
    edges = (
        edges_df.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    out_deg = edges.groupBy("src").agg(F.count("*").alias("__deg"))
    # Loop-invariant: (src, dst, 1/deg) — checkpoint once, reuse.
    weighted_edges = (
        edges.join(out_deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("__deg")).alias("__w"))
        .localCheckpoint()
    )
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0)).select("node", "rank")
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint()
    base = (1.0 - damping) / n
    for _ in range(max_iterations):
        contribs = (
            weighted_edges.join(ranks, weighted_edges.src == ranks.node)
            .select("dst", (F.col("rank") * F.col("__w")).alias("__c"))
            .groupBy("dst")
            .agg(F.sum("__c").alias("__in"))
        )
        # Mass sitting on dangling nodes this round, spread uniformly.
        dangling = (
            ranks.join(out_deg, ranks.node == out_deg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        new_ranks = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("__in"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
        delta = (
            new_ranks.join(ranks.withColumnRenamed("rank", "__old"), "node")
            .agg(F.sum(F.abs(F.col("rank") - F.col("__old"))))
            .collect()[0][0]
        )
        ranks = new_ranks
        if delta is not None and delta < tol:
            break
    return ranks.select("node", "rank")


def resolve_entities(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_distance: int = 1,
) -> DataFrame:
    """Entity resolution: rows whose ``name_col`` values are within
    ``max_distance`` edits (transitively) share one ``entity_id``
    (the min id of the cluster). The full record-linkage composition
    of already-proven parts: FastSS deletion-neighborhood fuzzy
    self-join for candidate edges (sound AND complete blocking — no
    all-pairs), then connected components over the match graph;
    singletons keep their own id via a left join + coalesce, so the
    output is total over the input."""
    from pipeline_dataengineer_spark.operators.joins import fuzzy_join

    pairs = fuzzy_join(
        df.select(id_col, name_col),
        df.select(id_col, name_col),
        name_col,
        name_col,
        max_distance=max_distance,
        left_id=id_col,
        right_id=id_col,
    )
    edges = pairs.filter(F.col(id_col) < F.col(f"{id_col}_r")).select(
        F.col(id_col).alias("id_a"), F.col(f"{id_col}_r").alias("id_b")
    )
    comps = connected_components(edges)
    joined = df.join(
        comps.withColumnRenamed("node", id_col), id_col, "left"
    )
    return joined.withColumn(
        "entity_id", F.coalesce(F.col("component"), F.col(id_col))
    ).drop("component")
