"""Similarity search over embedding columns (north star).

Baseline: brute-force cosine top-k — a broadcast of the query
vector(s) and one pass over the corpus; exact, O(N·d), and the right
answer up to ~10⁸ vectors when d is small.

Scale path: IVF (inverted-file) bucketing — assign each vector to its
nearest of K centroids (a broadcastable constant), shuffle once on
the centroid id, and probe only `nprobe` buckets per query: the
classic recall/cost dial. Centroids here come from a deterministic
hash-seeded sample (k-means iterations are a straightforward
extension — each iteration is one groupBy(assignment).avg()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pipeline_dataengineer_spark.functions.vectors import cosine_similarity, dot, l2_norm


def cosine_topk_bruteforce(
    corpus: DataFrame,
    query: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 10,
    score_round: int = 6,
) -> DataFrame:
    """Exact top-k per query vector.

    `query` (small: id + vector) is broadcast; the corpus is scanned
    once with no shuffle of the vectors themselves — the only shuffle
    is the per-query top-k window over (query, score) pairs.
    """
    q = query.select(
        F.col(query_id_col).alias("__qid"), F.col(vec_col).alias("__qv")
    )
    scored = (
        corpus.select(F.col(id_col), F.col(vec_col).alias("__cv"))
        .crossJoin(F.broadcast(q))
        .select(
            F.col("__qid").alias(query_id_col),
            F.col(id_col),
            F.round(cosine_similarity("__cv", "__qv"), score_round).alias("score"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivf_build(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_centroids: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """Build an IVF index: (centroids, assigned corpus).

    Centroids: a deterministic hash-ORDERED sample (smallest id-hash
    values win — seed-free, reproducible across runs/cluster sizes,
    and guaranteed non-empty for any non-empty corpus). Assignment:
    argmax cosine against the broadcast centroid set; one corpus
    pass, then a single repartition on centroid id co-locates each
    bucket.
    """
    # Hash-ORDERED top-k, not a hash-threshold filter: the old
    # `pmod(hash) < 3k/997` prefilter kept ~0.3% of rows regardless
    # of corpus size, so a small corpus (or an unlucky shard) could
    # yield ZERO centroids and an empty index. orderBy+limit compiles
    # to TakeOrderedAndProject (map-side partial top-k — one narrow
    # pass, no full sort) and guarantees min(k, |corpus|) centroids
    # with the same deterministic, seed-free pseudo-randomness.
    centroids = (
        corpus.select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cvec"))
        .orderBy(
            F.pmod(F.xxhash64("centroid_id"), F.lit(997)).asc(),
            F.col("centroid_id").asc(),
        )
        .limit(num_centroids)
    )
    c = F.broadcast(centroids)
    scored = corpus.crossJoin(c).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("centroid_id"),
        cosine_similarity(vec_col, "cvec").alias("__sim"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__sim").desc(), F.col("centroid_id").asc()
    )
    assigned = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, vec_col, "centroid_id")
        .repartition("centroid_id")
    )
    return centroids, assigned


def ivf_search(
    centroids: DataFrame,
    assigned: DataFrame,
    query: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Approximate top-k: rank centroids per query, keep `nprobe`,
    equi-join queries to only those buckets, exact cosine within.
    The equi-join on centroid_id is the scalability win: each query
    touches nprobe/num_centroids of the corpus."""
    q = query.select(F.col(query_id_col).alias("__qid"), F.col(vec_col).alias("__qv"))
    qc = q.crossJoin(F.broadcast(centroids)).select(
        "__qid", "__qv", "centroid_id", cosine_similarity("__qv", "cvec").alias("__csim")
    )
    wq = Window.partitionBy("__qid").orderBy(
        F.col("__csim").desc(), F.col("centroid_id").asc()
    )
    probes = (
        qc.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("__qid", "__qv", "centroid_id")
    )
    cand = assigned.join(F.broadcast(probes), "centroid_id").select(
        F.col("__qid").alias(query_id_col),
        F.col(id_col),
        F.round(cosine_similarity(vec_col, "__qv"), 6).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return cand.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def mips_transform(
    corpus: DataFrame,
    vec_col: str = "embedding",
    out_col: str | None = None,
) -> DataFrame:
    """Reduce maximum-inner-product search to cosine/L2 search — the
    standard norm-augmentation trick (Bachrach et al., RecSys'14 /
    Shrivastava-Li asymmetric LSH): append one extra dimension
    sqrt(M^2 - ||x||^2) to every corpus vector, where M is the max
    corpus norm. Augmented corpus vectors all have norm exactly M, so
    for a QUERY padded with a 0 in that slot, cosine order ==
    inner-product order — which lets ALS factor tables (whose scores
    are dot products, see operators/recommender.py) ride the existing
    cosine_topk_bruteforce / IVF machinery unchanged.

    One aggregate pass finds M (a scalar), one fused codegen
    projection appends the dimension (F.aggregate for the norm,
    concat for the slot — no Python). Use ``pad_query`` for the
    query side."""
    out_col = out_col or vec_col
    sq = F.aggregate(
        F.transform(vec_col, lambda v: v * v),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    m2 = corpus.agg(F.max(sq).alias("__m2"))
    return (
        corpus.crossJoin(F.broadcast(m2))
        .withColumn(
            out_col,
            F.concat(
                F.col(vec_col).cast("array<double>"),
                F.array(F.sqrt(F.greatest(F.col("__m2") - sq, F.lit(0.0)))),
            ),
        )
        .drop("__m2")
    )


def pad_query(
    query: DataFrame, vec_col: str = "embedding", out_col: str | None = None
) -> DataFrame:
    """Append the 0 slot that pairs a query with a mips_transform'd
    corpus."""
    out_col = out_col or vec_col
    return query.withColumn(
        out_col,
        F.concat(
            F.col(vec_col).cast("array<double>"), F.array(F.lit(0.0))
        ),
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str,
    score_col: str = "score",
    partition_cols: list[str] | None = None,
    k: int = 60,
    round_to: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion of N retrieval lists — the standard
    hybrid-search combiner (lexical BM25 + embedding cosine, or any
    mix): fused(d) = Σ_lists 1/(k + rank_l(d)), a document absent
    from a list contributing nothing. Rank-based, so the lists'
    score scales never need calibrating against each other.

    Each input carries (partition_cols…, id_col, score_col); ranks
    are dense positions ordered by (score DESC, id ASC) — the id
    tie-break keeps fusion deterministic when scores tie (callers
    should pre-round scores so cross-engine float ulps cannot flip
    adjacent ranks). Output: (partition_cols…, id_col, n_lists,
    rrf_score).

    Scale shape: retrieval lists are top-k bounded BY CONSTRUCTION
    (each is the output of a ranker's cut), so the rank window is
    over at most k rows per (list, partition) — pass
    ``partition_cols`` (the query id) for multi-query fusion so no
    single window task ever sees more than one query's list. The
    fusion itself is one map-side-combinable aggregate on the doc
    key."""
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    parts = partition_cols or []
    # Tag each list with its index as a REAL column and rank the
    # union in ONE window partitioned by (__list, parts) — same ranks
    # as the old per-list constant-partition windows, but a single
    # Window operator that hash-partitions across lists instead of N
    # windows each warning "No Partition Defined" and funneling into
    # one task (round 10, guide §2.4).
    tagged = [
        r.select(
            F.lit(i).alias("__list"),
            *parts,
            F.col(id_col),
            F.col(score_col).cast("double").alias("__s"),
        )
        for i, r in enumerate(rankings)
    ]
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), tagged)
    w = Window.partitionBy("__list", *parts).orderBy(
        F.col("__s").desc(), F.col(id_col).asc()
    )
    u = u.withColumn("__rank", F.row_number().over(w))
    return (
        u.groupBy(*parts, id_col)
        .agg(
            F.count("*").alias("n_lists"),
            F.round(
                F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col("__rank"))),
                round_to,
            ).alias("rrf_score"),
        )
    )


def mmr_rerank(
    candidates: DataFrame,
    k: int = 10,
    lam: float = 0.5,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rel_col: str = "score",
    score_round: int = 6,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98): greedily pick k results trading relevance against
    redundancy —

        mmr(i) = lam * rel(i) - (1-lam) * max_{j in selected} cos(i, j)

    lam=1 is pure relevance (rank order == the input ranker's), lam→0
    maximizes diversity. The redundancy term needs pairwise cosines
    within the candidate list, which no windowed SQL expresses — but
    the input is a RANKER'S TOP-N CUT (cosine_topk_bruteforce /
    ivf_search output with vectors attached), so each greedy problem
    is O(N²·d) over a bounded N (≤ ~100s): one applyInPandas group
    per query, numpy inside, never the corpus. The expensive global
    work (scoring the corpus) already happened upstream; this is a
    per-query epilogue whose input size is capped by construction.

    Determinism: relevance and the running MMR objective are rounded
    to ``score_round`` before argmax; ties break on ``id_col`` ASC —
    the same discipline as the ranking cut it follows.

    Output: (query_id, id, mmr_rank 1..k, mmr_score rounded). Input
    rows per query beyond the greedy horizon are dropped.
    """
    import numpy as np
    import pandas as pd

    schema_by_name = {f.name: f.dataType.simpleString()
                      for f in candidates.schema.fields}
    out_schema = (
        f"{query_id_col} {schema_by_name[query_id_col]}, "
        f"{id_col} {schema_by_name[id_col]}, "
        "mmr_rank long, mmr_score double"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        # deterministic candidate order: rel desc, id asc
        pdf = pdf.sort_values(
            [rel_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        V = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0.0] = 1.0
        U = V / norms[:, None]
        rel = np.round(pdf[rel_col].to_numpy(np.float64), score_round)
        ids = pdf[id_col].to_numpy()
        n = len(pdf)
        chosen: list[int] = []
        scores: list[float] = []
        max_sim = np.zeros(n)  # max cosine to the selected set so far
        remaining = np.ones(n, dtype=bool)
        for _ in range(min(k, n)):
            obj = np.round(lam * rel - (1.0 - lam) * max_sim, score_round)
            obj[~remaining] = -np.inf
            best = np.lexsort((ids, -obj))[0]  # obj desc, id asc
            chosen.append(best)
            scores.append(float(obj[best]))
            remaining[best] = False
            sims = U @ U[best]
            np.maximum(max_sim, sims, out=max_sim)
        out = pdf.iloc[chosen][[query_id_col, id_col]].copy()
        out["mmr_rank"] = np.arange(1, len(chosen) + 1, dtype=np.int64)
        out["mmr_score"] = scores
        return out

    return candidates.groupBy(query_id_col).applyInPandas(fn, out_schema)


def local_outlier_factor(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bucket_col: str | None = None,
    dist_round: int = 4,
    round_to: int = 6,
) -> DataFrame:
    """Local Outlier Factor (Breunig et al. 2000) over an embedding
    column: LOF(a) = mean(lrd(b) for b in kNN(a)) / lrd(a), where
    lrd is the inverse mean reachability distance
    reach(a, b) = max(k_dist(b), d(a, b)). LOF ≈ 1 means inlier;
    ≫ 1 means the point is in a sparser region than its neighbors.
    Returns (id, k_dist, lrd, lof).

    Neighbor candidates come from an EQUI self-join on ``bucket_col``
    (IVF cell / LSH band / grid cell — the caller's bucketing, the
    standard approximate-LOF reduction; a point's neighbors are
    searched within its bucket only). With ``bucket_col=None`` the
    join key is a constant — exact all-pairs, documented for bounded
    inputs only. Euclidean distance is derived from one dot kernel
    (d² = |a|² + |b|² − 2a·b, norms computed once per row) and
    ROUNDED to ``dist_round`` before ranking with an id tie-break,
    so the kNN cut is identical across engines and runs (float32
    accumulation diverges at digit ~5).

    Ties at the k-th distance are cut at exactly k by (dist, id) —
    the deterministic simplification of the classic "all points at
    k-distance" set; the oracle replays the same rule.

    Shape: one equi join for pairs (bucket-sized, AQE-splittable),
    ranked windows PARTITIONED by point id, two combinable
    aggregates, and two more id-keyed hash joins — no cartesian, no
    Python, no driver state.
    """
    from pipeline_dataengineer_spark.functions.vectors import dot

    b = bucket_col
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        (F.col(b) if b else F.lit(0)).alias("bk"),
    ).withColumn("n2", dot("v", "v"))
    a_side = base.select(
        F.col("id").alias("ida"), F.col("v").alias("va"),
        F.col("n2").alias("n2a"), "bk",
    )
    b_side = base.select(
        F.col("id").alias("idb"), F.col("v").alias("vb"),
        F.col("n2").alias("n2b"), "bk",
    )
    d2 = F.greatest(
        F.col("n2a") + F.col("n2b") - 2.0 * dot("va", "vb"), F.lit(0.0)
    )
    pairs = (
        a_side.join(b_side, "bk")
        .filter(F.col("ida") != F.col("idb"))
        .select(
            "ida", "idb", F.round(F.sqrt(d2), dist_round).alias("d")
        )
    )
    w = Window.partitionBy("ida").orderBy("d", "idb")
    knn = pairs.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )
    kdist = knn.groupBy("ida").agg(F.max("d").alias("k_dist"))
    # reach(a, b) = max(k_dist(b), d(a, b)); lrd = 1 / mean(reach)
    reach = knn.join(
        kdist.select(
            F.col("ida").alias("idb"), F.col("k_dist").alias("kd_b")
        ),
        "idb",
    ).select(
        "ida", "idb", F.greatest(F.col("kd_b"), F.col("d")).alias("re")
    )
    # duplicate-cluster guard: all-zero reach distances make the
    # classic lrd infinite — surfaced as NULL via try_divide (ANSI
    # mode would otherwise throw DIVIDE_BY_ZERO)
    lrd = reach.groupBy("ida").agg(
        F.try_divide(F.lit(1.0), F.avg("re")).alias("lrd")
    )
    lof = (
        reach.join(
            lrd.select(
                F.col("ida").alias("idb"), F.col("lrd").alias("lrd_b")
            ),
            "idb",
        )
        .groupBy("ida")
        .agg(F.avg("lrd_b").alias("__mb"))
        .join(lrd, "ida")
        .join(kdist, "ida")
    )
    return lof.select(
        F.col("ida").alias("id"),
        "k_dist",
        F.round("lrd", round_to).alias("lrd"),
        F.round(
            F.try_divide(F.col("__mb"), F.col("lrd")), round_to
        ).alias("lof"),
    )


def hard_negatives(
    anchors: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    anchor_id: str = "anchor_id",
    anchor_vec: str = "anchor_vec",
    anchor_label: str = "anchor_label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    score_round: int = 4,
) -> DataFrame:
    """Hard-negative mining for contrastive / embedding training: per
    anchor, the ``k`` most cosine-similar corpus items that do NOT
    share the anchor's label (and are never the anchor itself) —
    the near-miss negatives that actually move a contrastive loss,
    where in-batch random negatives are mostly trivial.

    Returns (anchor_id, neg_id, cos_sim, rank), rank 1..k per anchor.
    Ranks are deterministic: the score is rounded BEFORE ranking and
    ties break on ascending corpus id, so the selected set is
    engine-reproducible (and SQL-oracle-checkable) rather than
    float-noise-dependent.

    Scale: the anchor set (the training batch / epoch seed set) is
    broadcast; the corpus is scanned once and its vectors are never
    shuffled — only (anchor, id, score) triples move, and the
    per-anchor top-k window partitions on the anchor key. For
    anchor sets too large to broadcast, run ivf_search per anchor
    shard instead and apply the same label anti-filter; this exact
    variant doubles as its recall oracle.
    """
    a = anchors.select(
        F.col(anchor_id).alias("__aid"),
        F.col(anchor_vec).alias("__av"),
        F.col(anchor_label).alias("__alab"),
    )
    scored = (
        corpus.select(
            F.col(id_col), F.col(vec_col).alias("__cv"), F.col(label_col)
        )
        .crossJoin(F.broadcast(a))
        .filter(
            (F.col(id_col) != F.col("__aid"))
            & (F.col(label_col) != F.col("__alab"))
        )
        .select(
            F.col("__aid").alias(anchor_id),
            F.col(id_col).alias("neg_id"),
            F.round(cosine_similarity("__cv", "__av"), score_round).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy(anchor_id).orderBy(
        F.col("cos_sim").desc(), F.col("neg_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
