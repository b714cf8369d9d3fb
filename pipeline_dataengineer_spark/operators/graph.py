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
    driver_finish_edges: int = 50_000,
) -> DataFrame:
    """(src, dst) edge list → (node, component) with component = min
    node id reachable. Deterministic for any input edge set.

    Hybrid finish: whenever the CURRENT (contracted) edge set fits
    under ``driver_finish_edges``, it is collected and closed with a
    driver-side union-find instead of more Spark rounds. Star
    contraction shrinks the active graph geometrically, so this
    bound is reached in O(log) rounds no matter the input size; 50k
    edges ≈ 2 MB — boundary/codebook-order driver state, and each
    avoided round saves ~10 scheduler round-trips (measured: the
    sf0.1 DBSCAN core graph, 33k edges, dropped from ~17 s of tiny
    jobs to one collect). Set 0 to force the fully distributed path.

    Star contraction (hook + compress + contract), the provably
    O(log n)-round MR formulation — NOT plain min-label propagation,
    whose round count is the component DIAMETER. Plain propagation
    silently split the sf0.1 q_dbscan giant cluster (spatial
    diameter ≈ 50 hops > the 20-round budget); the differential
    caught it, and percolation-shaped clusters are exactly what LSH
    dedup graphs look like at 100 TB, where a diameter-bound loop is
    unusable. Per round:

    1. hook: l(v) = min(v, neighbors(v)) on the CURRENT (contracted)
       edge set — every non-isolated supernode merges with at least
       one neighbor, so active nodes at least halve per round;
    2. compress: pointer-jump l until idempotent (inner loop over the
       node-sized label table, <= log(chain) cheap keyed self-joins)
       so every node points at its star root;
    3. apply l to the accumulated global mapping, then contract the
       edge set to (l(a), l(b)), dropping collapsed self-loops.

    Terminates when the contracted edge set is empty. Raises
    RuntimeError if ``max_iterations`` rounds were not enough (only
    possible for > 2**max_iterations nodes) rather than returning a
    silently split component set."""
    # localCheckpoint, not persist, throughout: persist caches DATA
    # but Catalyst still re-analyzes the full recursive plan each
    # iteration — plan depth doubles per round and analysis time
    # grows exponentially (measured: iteration 10 of a 10-node chain
    # never finished). localCheckpoint truncates the logical plan to
    # the materialized result, keeping every iteration O(1) to plan.
    # Both directions from ONE pass over the input via explode —
    # a union of (src,dst)/(dst,src) selects evaluates the whole
    # upstream edge pipeline twice (round 10, measured 2.1 s of the
    # q_dbscan CC's 4 s: the core-degree joins ran once per
    # direction; guide §2.4 duplicated-subtree rule).
    sym = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(src).alias("a"), F.col(dst).alias("b")
                    ),
                    F.struct(
                        F.col(dst).alias("a"), F.col(src).alias("b")
                    ),
                )
            ).alias("__e")
        )
        .select("__e.a", "__e.b")
        .distinct()
        .localCheckpoint()
    )
    # Global mapping keeps EVERY endpoint (self-loop seeds included —
    # dedup callers rely on singletons appearing in the output).
    mapping = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    edges = sym.filter(F.col("a") != F.col("b")).localCheckpoint()

    def _changed(new, old, new_col, old_col):
        # Exact change detector: one keyed join over two checkpointed
        # node-sized tables — works for any orderable label type
        # (numeric ids OR string keys; a sum-checksum would need a
        # cast and can overflow hashed ids under ANSI mode).
        return (
            new.join(old, "node")
            .filter(F.col(new_col) != F.col(old_col))
            .limit(1)
            .count()
        )

    for _ in range(max_iterations):
        n_edges = edges.count()
        if n_edges == 0:
            break
        if n_edges <= driver_finish_edges:
            # bounded remainder: close it out with union-find
            rows = edges.collect()
            parent: dict = {}

            def find(x):
                r = x
                while parent.get(r, r) != r:
                    r = parent[r]
                while parent.get(x, x) != x:
                    parent[x], x = r, parent[x]
                return r

            for row in rows:
                ra, rb = find(row["a"]), find(row["b"])
                if ra != rb:
                    # union by min so the root IS the component min
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo
            lab_rows = [(n, find(n)) for n in parent]
            lab = edges.sparkSession.createDataFrame(
                lab_rows, schema=edges.select(
                    F.col("a").alias("node"), F.col("b").alias("lab")
                ).schema,
            )
            mapping = (
                mapping.join(
                    lab.select(
                        F.col("node").alias("__n"),
                        F.col("lab").alias("__l"),
                    ),
                    mapping.component == F.col("__n"),
                    "left",
                )
                .select(
                    "node",
                    F.coalesce("__l", "component").alias("component"),
                )
                .localCheckpoint()
            )
            break
        # 1. hook: min over self + neighbors
        lab = (
            edges.groupBy("a")
            .agg(F.min("b").alias("__m"))
            .select(
                F.col("a").alias("node"),
                F.least("a", "__m").alias("lab"),
            )
            .localCheckpoint()
        )
        # 2. compress: follow lab pointers until idempotent. Hooking
        # yields a pseudo-forest, so chains are finite and each jump
        # at least halves their length.
        for _c in range(64):
            jumped = (
                lab.join(
                    lab.select(
                        F.col("node").alias("__c"),
                        F.col("lab").alias("__cc"),
                    ),
                    F.col("lab") == F.col("__c"),
                    "left",
                )
                .select(
                    "node", F.coalesce("__cc", "lab").alias("lab")
                )
                .localCheckpoint()
            )
            done = (
                _changed(
                    jumped,
                    lab.withColumnRenamed("lab", "__old"),
                    "lab",
                    "__old",
                )
                == 0
            )
            lab = jumped
            if done:
                break
        # 3a. fold this round's labels into the global mapping
        mapping = (
            mapping.join(
                lab.select(
                    F.col("node").alias("__n"), F.col("lab").alias("__l")
                ),
                mapping.component == F.col("__n"),
                "left",
            )
            .select(
                "node",
                F.coalesce("__l", "component").alias("component"),
            )
            .localCheckpoint()
        )
        # 3b. contract the edge set onto star roots
        edges = (
            edges.join(
                lab.select(
                    F.col("node").alias("a"), F.col("lab").alias("__la")
                ),
                "a",
            )
            .join(
                lab.select(
                    F.col("node").alias("b"), F.col("lab").alias("__lb")
                ),
                "b",
            )
            .select(F.col("__la").alias("a"), F.col("__lb").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint()
        )
    else:
        raise RuntimeError(
            f"connected_components did not converge within "
            f"{max_iterations} contraction rounds — raise "
            f"max_iterations"
        )
    return mapping.select("node", "component")


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
    (the min row id of the cluster). The record-linkage composition
    of already-proven parts — with the one extra move that makes it
    survive real data: the fuzzy self-join runs over DISTINCT names,
    not rows. Names repeat massively in practice ("John Smith" ×
    10⁵), and row-level fuzzy joining makes every same-name group a
    quadratic edge set — measured 311 s at 50k rows over 60 distinct
    names vs ~8 s after the distinct (the edge graph is
    name-cardinality-sized, unaffected by row duplication).

    Steps: distinct names → FastSS fuzzy self-join (sound+complete
    blocking, no all-pairs) → connected components over the NAME
    graph (min-label works on strings: lexicographic canonical) →
    rows join their name's component → min row id per component via
    one dimension-sized aggregate broadcast back. Rows with no fuzzy
    partner keep their name as its own component, so the output is
    total over the input. NULL names cannot match anything under
    edit distance, so those rows are split off up front and come
    back as singleton entities (``entity_id`` = their own id) —
    without the split they would vanish at the component equi-join,
    which never matches NULL keys."""
    from pipeline_dataengineer_spark.operators.joins import fuzzy_join

    null_rows = df.filter(F.col(name_col).isNull()).withColumn(
        "entity_id", F.col(id_col)
    )
    df = df.filter(F.col(name_col).isNotNull())
    names = (
        df.select(name_col)
        .distinct()
        .withColumn("__nid", F.col(name_col))
    )
    pairs = fuzzy_join(
        names,
        names,
        name_col,
        name_col,
        max_distance=max_distance,
        left_id="__nid",
        right_id="__nid",
    )
    edges = pairs.filter(F.col("__nid") < F.col("__nid_r")).select(
        F.col("__nid").alias("id_a"), F.col("__nid_r").alias("id_b")
    )
    comps = connected_components(edges)
    rowc = df.join(
        comps.withColumnRenamed("node", name_col), name_col, "left"
    ).withColumn("__comp", F.coalesce(F.col("component"), F.col(name_col)))
    ents = rowc.groupBy("__comp").agg(F.min(id_col).alias("entity_id"))
    resolved = (
        rowc.join(F.broadcast(ents), "__comp")
        .drop("__comp", "component")
        .select(*df.columns, "entity_id")
    )
    return resolved.unionByName(null_rows.select(*df.columns, "entity_id"))


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst"):
    """Global triangle count over an undirected graph — the relational
    formulation (no vertex programs): canonicalize each edge to
    (lo, hi), dedup, then count paths lo→mid→hi whose closing edge
    (lo, hi) exists. Each triangle {a<b<c} is counted exactly once as
    the join (a,b)+(b,c) closed by (a,c).

    Scale shape: two equi-joins on vertex keys. The classic skew bomb
    is a celebrity vertex (degree d → d² path candidates through it);
    production runs cut it with degree ordering — orienting every
    edge from the LOWER-degree endpoint bounds candidates by
    Σ min-degree² — which here falls out of the id-canonicalization
    when ids correlate with degree, and composes with AQE skew splits
    on the join keys otherwise."""
    from pyspark.sql import functions as F

    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))  # drop self-loops
        .distinct()
    )
    paths = e.alias("ab").join(
        e.alias("bc"), F.col("ab.hi") == F.col("bc.lo")
    ).select(
        F.col("ab.lo").alias("a"), F.col("ab.hi").alias("b"), F.col("bc.hi").alias("c")
    )
    closed = paths.join(
        e.alias("ac"),
        (F.col("a") == F.col("ac.lo")) & (F.col("c") == F.col("ac.hi")),
        "left_semi",
    )
    return closed.agg(F.count(F.lit(1)).alias("triangles"))


def co_occurrence(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_count: int = 1,
    max_basket_size: int | None = None,
):
    """Item co-occurrence counts (market-basket / co-click): pairs of
    distinct items sharing a basket, with support counts. Returns
    (item_a, item_b, n_baskets) with item_a < item_b.

    ONE self-equi-join on the basket key generates pairs, then a
    combinable groupBy counts them — never an all-pairs cross join.
    The quadratic bomb is a giant basket (a crawler session with 10^5
    items → 10^10 pairs): ``max_basket_size`` drops oversized baskets
    BEFORE pair expansion via a count + broadcast anti-join, same
    enforced-cap shape as the LSH bucket and tag-df caps."""
    from pyspark.sql import functions as F

    b = df.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    if max_basket_size is not None:
        big = (
            b.groupBy("__b").agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > max_basket_size)
            .select("__b")
        )
        b = b.join(F.broadcast(big), "__b", "left_anti")
    pairs = (
        b.alias("l")
        .join(b.alias("r"), "__b")
        .filter(F.col("l.__i") < F.col("r.__i"))
        .select(F.col("l.__i").alias("item_a"), F.col("r.__i").alias("item_b"))
    )
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
        .filter(F.col("n_baskets") >= min_count)
    )


def item_similarity(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_count: int = 1,
    max_basket_size: int | None = None,
) -> DataFrame:
    """Item-item cosine similarity from co-occurrence (the classic
    item-based collaborative-filtering kernel): for items a, b with
    basket sets A, B over binary incidence,

        sim(a, b) = |A ∩ B| / sqrt(|A| * |B|)

    Returns (item_a, item_b, n_baskets, sim) with item_a < item_b.

    Built on ``co_occurrence`` (one self-equi-join on the basket key +
    combinable count — never all-pairs), then the per-item basket
    counts — an item-cardinality-sized aggregate — are joined back to
    the pair table twice. Item counts are dimension-sized relative to
    the pair table, and the optimizer broadcasts them when small;
    either way the joins are on single item keys, AQE-splittable if a
    mega-popular item makes a hot key. Same giant-basket cap story as
    ``co_occurrence``.
    """
    from pyspark.sql import functions as F

    pairs = co_occurrence(
        df, basket_col, item_col, min_count=min_count,
        max_basket_size=max_basket_size,
    )
    counts = (
        df.select(
            F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
        )
        .distinct()
        .groupBy("__i")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    ca = counts.select(F.col("__i").alias("item_a"), F.col("__n").alias("__na"))
    cb = counts.select(F.col("__i").alias("item_b"), F.col("__n").alias("__nb"))
    return (
        pairs.join(ca, "item_a")
        .join(cb, "item_b")
        .select(
            "item_a",
            "item_b",
            "n_baskets",
            F.round(
                F.col("n_baskets")
                / F.sqrt(F.col("__na") * F.col("__nb")),
                6,
            ).alias("sim"),
        )
    )


def bfs_shortest_paths(
    edges_df: DataFrame,
    sources_df: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    max_depth: int = 30,
    directed: bool = True,
    strict: bool = True,
) -> DataFrame:
    """Multi-source BFS: minimum hop count from ANY source to every
    reachable node → (node, dist). ``strict`` (default) raises if
    unreached nodes remain past ``max_depth`` — a too-small budget
    must not silently report nodes unreachable; pass ``strict=False``
    for the "neighborhood within N hops" RADIUS reading, where the
    cut is the point. The relational fixpoint behind
    recursive-CTE workloads (org-chart rollups, BOM explosion, link
    distance from seed domains in a web crawl frontier).

    Level-synchronous frontier expansion — the standard distributed
    BFS (Pregel's default traversal) expressed purely relationally:
    each round joins the CURRENT frontier (nodes first reached last
    round) through the edge list, then LEFT ANTI joins against the
    settled set so only newly reached nodes survive. Work per round
    is frontier-edge-sized, not graph-sized; the edge table is
    loop-invariant (checkpointed once — at 100 TB pre-partition it
    by ``src`` so the per-round join reuses one shuffle layout and
    only the small frontier moves). Rounds = eccentricity of the
    source set, each a bounded O(1)-plan step via localCheckpoint
    (same plan-truncation discipline as connected_components above —
    without it, Catalyst re-analyzes a plan that doubles per round).

    Early exit on an empty frontier costs one one-row count per
    round; no row data ever reaches the driver. BFS distance is
    deterministic (min over arrival rounds) regardless of partition
    scheduling, unlike label-propagation intermediate states."""
    e = edges_df.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    if not directed:
        e = e.union(edges_df.select(F.col(dst).alias("s"), F.col(src).alias("d")))
    e = e.distinct().localCheckpoint()
    settled = (
        sources_df.select(F.col(node).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("int"))
        .localCheckpoint()
    )
    frontier = settled
    for depth in range(1, max_depth + 1):
        nxt = (
            e.join(frontier, e.s == frontier.node)
            .select(F.col("d").alias("node"))
            .distinct()
            .join(settled, "node", "left_anti")
            .withColumn("dist", F.lit(depth).cast("int"))
            .localCheckpoint()
        )
        if nxt.limit(1).count() == 0:
            break
        settled = settled.union(nxt).localCheckpoint()
        frontier = nxt
    else:
        # Same fail-loud rule as connected_components — but probe
        # first: a frontier on the LAST round is fine if nothing
        # unsettled lies beyond it (graph exactly max_depth deep).
        beyond = (
            e.join(frontier, e.s == frontier.node)
            .select(F.col("d").alias("node"))
            .distinct()
            .join(settled, "node", "left_anti")
            .limit(1)
            .count()
        )
        if beyond and strict:
            raise RuntimeError(
                f"bfs_shortest_paths frontier still active after "
                f"max_depth={max_depth} rounds — unreached nodes "
                f"would silently be reported unreachable; raise "
                f"max_depth"
            )
    return settled


def weighted_shortest_paths(
    edges_df: DataFrame,
    sources_df: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    node: str = "node",
    max_iterations: int = 30,
    strict: bool = True,
) -> DataFrame:
    """Single/multi-source weighted shortest paths (non-negative
    weights) → (node, dist). Distributed Bellman-Ford: each round
    relaxes every edge out of the nodes improved last round —
    dist'[v] = min(dist[v], min over improved u of dist[u] + w(u,v))
    — one frontier⨝edges join + one map-side-combinable min
    aggregate per round, the weighted generalization of
    bfs_shortest_paths above (same localCheckpoint plan bounding,
    same loop-invariant edge table; at 100 TB pre-partition edges by
    ``src`` and only frontier rows move per round).

    Delta-stepping discipline: only nodes whose distance IMPROVED
    join the next frontier, so rounds needed = longest shortest-path
    hop count, and work per round is frontier-edge-sized. Converges
    exactly (no float tolerance: improvement is strict <) and
    deterministically — min over candidate path lengths is
    order-independent for doubles only when sums are identical, so
    weights should be exact-in-binary (ints, or k/2^m) when
    cross-engine hash parity matters; the q_sssp_distance contract
    uses integer weights for that reason."""
    e = edges_df.select(
        F.col(src).alias("s"), F.col(dst).alias("d"), F.col(weight).alias("w")
    ).localCheckpoint()
    dist = (
        sources_df.select(F.col(node).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("double"))
        .localCheckpoint()
    )
    frontier = dist
    for _ in range(max_iterations):
        cand = (
            e.join(frontier, e.s == frontier.node)
            .select(F.col("d").alias("node"), (F.col("dist") + F.col("w")).alias("__nd"))
            .groupBy("node")
            .agg(F.min("__nd").alias("__nd"))
        )
        merged = (
            dist.join(cand, "node", "full_outer")
            .select(
                "node",
                F.least(
                    F.coalesce(F.col("dist"), F.lit(float("inf"))),
                    F.coalesce(F.col("__nd"), F.lit(float("inf"))),
                ).alias("dist"),
                (
                    F.col("dist").isNull()
                    | (F.col("__nd") < F.col("dist"))
                ).alias("__improved"),
            )
            .localCheckpoint()
        )
        frontier = (
            merged.filter("__improved").select("node", "dist").localCheckpoint()
        )
        dist = merged.select("node", "dist")
        if frontier.limit(1).count() == 0:
            break
    else:
        # Fail loud (the connected_components rule) — with a probe:
        # an improvement in the LAST round is fine if one more
        # relaxation would find nothing (converged exactly on the
        # budget).
        cand = (
            e.join(frontier, e.s == frontier.node)
            .select(
                F.col("d").alias("node"),
                (F.col("dist") + F.col("w")).alias("__nd"),
            )
            .groupBy("node")
            .agg(F.min("__nd").alias("__nd"))
        )
        improving = (
            cand.join(dist.withColumnRenamed("dist", "__cur"), "node", "left")
            .filter(
                F.col("__cur").isNull() | (F.col("__nd") < F.col("__cur"))
            )
            .limit(1)
            .count()
        )
        if improving and strict:
            raise RuntimeError(
                f"weighted_shortest_paths still improving after "
                f"max_iterations={max_iterations} rounds — the "
                f"returned distances would silently overstate path "
                f"lengths; raise max_iterations"
            )
    return dist


def k_core(
    edges_df: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """The k-core: the maximal subgraph where every node has degree
    ≥ k (undirected; self-loops ignored). Returns (node, degree)
    with degree measured INSIDE the core. The classic graph-cleanup
    pass before community detection / web-graph corpus curation
    (peel low-degree fringe; what survives is densely connected).

    Iterative peeling, relationally: per round one combinable degree
    aggregate, one broadcast-able weak-node set, one anti-join on
    each endpoint — edge-table-sized work per round, and the edge
    table SHRINKS monotonically (unlike BFS's growing settled set).
    Rounds = peel depth (rarely more than a few dozen even on web
    graphs); localCheckpoint bounds plans as in the other iterative
    operators. Termination: each round either removes a node or
    stops, so ≤ |V| rounds worst case; the loop runs to fixpoint."""
    e = (
        edges_df.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col(src) != F.col(dst))
        .distinct()
    )
    e = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    e = e.localCheckpoint()
    while True:
        deg = e.groupBy("a").agg(F.count(F.lit(1)).alias("__deg"))
        weak = deg.filter(F.col("__deg") < k).select("a").localCheckpoint()
        if weak.limit(1).count() == 0:
            return deg.select(F.col("a").alias("node"), F.col("__deg").cast("long").alias("degree"))
        e = (
            e.join(weak, "a", "left_anti")
            .join(weak.withColumnRenamed("a", "b"), "b", "left_anti")
            .select("a", "b")
            .localCheckpoint()
        )


def clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node local clustering coefficient over an undirected
    graph: 2 * triangles(v) / (deg(v) * (deg(v) - 1)); 0.0 for
    degree < 2 nodes. Returns (node, degree, triangles, coefficient)
    — total over the graph's vertex set.

    Same relational skeleton as ``triangle_count`` (canonical edges,
    path join, closing semi-check) but keeping the closed (a, b, c)
    rows and crediting each to its three corners with one explode +
    combinable count — no vertex program, and the scale story
    (degree-ordered candidates, AQE on celebrity keys) is inherited
    unchanged."""
    from pyspark.sql import functions as F

    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
    )
    paths = e.alias("ab").join(
        e.alias("bc"), F.col("ab.hi") == F.col("bc.lo")
    ).select(
        F.col("ab.lo").alias("a"),
        F.col("ab.hi").alias("b"),
        F.col("bc.hi").alias("c"),
    )
    closed = paths.join(
        e.alias("ac"),
        (F.col("a") == F.col("ac.lo")) & (F.col("c") == F.col("ac.hi")),
        "left_semi",
    )
    tri = (
        closed.select(
            F.explode(F.array("a", "b", "c")).alias("node")
        )
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )
    deg = (
        e.select(F.explode(F.array("lo", "hi")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    return deg.join(tri, "node", "left").select(
        "node",
        "degree",
        F.coalesce("triangles", F.lit(0)).alias("triangles"),
        F.when(
            F.col("degree") >= 2,
            2.0
            * F.coalesce("triangles", F.lit(0))
            / (F.col("degree") * (F.col("degree") - 1)),
        )
        .otherwise(0.0)
        .alias("coefficient"),
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 10,
) -> DataFrame:
    """Community detection by synchronous label propagation:
    every node starts as its own label; each round a node adopts the
    most frequent label among its neighbors (ties broken toward the
    SMALLEST label — the deterministic variant; classic LPA breaks
    ties randomly and is layout-dependent). Returns (node, label)
    over the full vertex set. Communities are denser-than-cut groups
    — unlike connected_components, bridges between dense clusters do
    NOT merge them.

    Per round: one join of current labels to the (undirected) edge
    list + one (node, label) count aggregate + one max_by per node —
    all combinable shuffles keyed by node; localCheckpoint bounds the
    iterative plan exactly as in connected_components/PageRank. Work
    per round is O(edges); rounds are a fixed small constant (LPA
    converges in a handful — and synchronous LPA can two-cycle on
    bipartite-ish graphs, so a hard iteration cap IS the convergence
    rule, not a timeout)."""
    from pyspark.sql import functions as F

    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        neigh = und.join(
            labels.withColumnRenamed("node", "b"), "b"
        ).select(F.col("a").alias("node"), "label")
        votes = neigh.groupBy("node", "label").agg(
            F.count("*").alias("__n")
        )
        new_labels = votes.groupBy("node").agg(
            F.min(
                F.struct(
                    (-F.col("__n")).alias("__neg"), F.col("label").alias("l")
                )
            )["l"].alias("label")
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels.localCheckpoint()
        if changed == 0:
            break
    return labels


def hits(
    edges_df: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 8,
) -> DataFrame:
    """HITS hubs-and-authorities over a directed edge list →
    (node, hub, authority), each score vector L1-normalized per
    round (the Kleinberg formulation; L1 keeps the normalizer a
    plain combinable sum — same cross-engine replayability as
    pagerank's dangling mass).

    Per round: authority(v) = Σ hub(u) over in-edges, hub(u) =
    Σ authority(v) over out-edges — two joins + two combinable
    aggregates, localCheckpoint-bounded plans, one scalar normalizer
    per round to the driver. Same loop-invariant-edges discipline as
    pagerank (checkpoint once, reuse)."""
    from pyspark.sql import functions as F

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
    if n == 0:
        return nodes.select(
            "node", F.lit(0.0).alias("hub"), F.lit(0.0).alias("authority")
        )
    scores = nodes.select(
        "node", F.lit(1.0 / n).alias("hub"), F.lit(1.0 / n).alias("authority")
    ).localCheckpoint()
    for _ in range(max_iterations):
        auth_raw = (
            edges.join(
                scores.select(F.col("node").alias("src"), "hub"), "src"
            )
            .groupBy("dst")
            .agg(F.sum("hub").alias("__a"))
        )
        a_norm = auth_raw.agg(F.sum("__a")).collect()[0][0] or 1.0
        new_auth = nodes.join(
            auth_raw.withColumnRenamed("dst", "node"), "node", "left"
        ).select(
            "node",
            (F.coalesce(F.col("__a"), F.lit(0.0)) / F.lit(a_norm)).alias(
                "authority"
            ),
        )
        hub_raw = (
            edges.join(
                new_auth.select(F.col("node").alias("dst"), "authority"),
                "dst",
            )
            .groupBy("src")
            .agg(F.sum("authority").alias("__h"))
        )
        h_norm = hub_raw.agg(F.sum("__h")).collect()[0][0] or 1.0
        new_hub = nodes.join(
            hub_raw.withColumnRenamed("src", "node"), "node", "left"
        ).select(
            "node",
            (F.coalesce(F.col("__h"), F.lit(0.0)) / F.lit(h_norm)).alias("hub"),
        )
        scores = (
            new_hub.join(new_auth, "node").localCheckpoint()
        )
    return scores.select("node", "hub", "authority")


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_count: int = 2,
    min_confidence: float = 0.0,
    max_basket_size: int | None = None,
    round_to: int = 4,
) -> DataFrame:
    """Market-basket association rules over ``co_occurrence`` pairs:
    one row per DIRECTED rule a→b with

        support    = n(a,b) / n_baskets
        confidence = n(a,b) / n(a)
        lift       = confidence / (n(b) / n_baskets)

    Scale shape: pair counts come from co_occurrence's single
    basket-key join; per-item basket counts and the total are
    combinable aggregates joined back (item side dimension-sized,
    total a 1-row broadcast). Lift > 1 means b is genuinely more
    likely given a — the recommender/affinity baseline."""
    pairs = co_occurrence(
        df, basket_col, item_col, min_count=min_count,
        max_basket_size=max_basket_size,
    )
    both = pairs.unionByName(
        pairs.select(
            F.col("item_b").alias("item_a"),
            F.col("item_a").alias("item_b"),
            "n_baskets",
        )
    ).withColumnRenamed("n_baskets", "__nab")
    item_counts = (
        df.select(basket_col, item_col)
        .distinct()
        .groupBy(item_col)
        .agg(F.count("*").alias("__ni"))
    )
    total = df.select(
        F.count_distinct(basket_col).cast("double").alias("__n")
    )
    na = item_counts.select(
        F.col(item_col).alias("item_a"), F.col("__ni").alias("__na")
    )
    nb = item_counts.select(
        F.col(item_col).alias("item_b"), F.col("__ni").alias("__nb")
    )
    out = (
        both.join(na, "item_a")
        .join(nb, "item_b")
        .crossJoin(F.broadcast(total))
        .select(
            "item_a",
            "item_b",
            F.col("__nab").alias("n_together"),
            F.round(F.col("__nab") / F.col("__n"), round_to).alias("support"),
            F.round(F.col("__nab") / F.col("__na"), round_to).alias(
                "confidence"
            ),
            # single division over exact integer products: (nab·N)/(na·nb)
            # is the same lift with no intermediate-quotient ulps, so
            # both engines round identically at the 4th decimal
            F.round(
                (F.col("__nab") * F.col("__n"))
                / (F.col("__na") * F.col("__nb")),
                round_to,
            ).alias("lift"),
        )
        .filter(F.col("confidence") >= min_confidence)
    )
    return out


def modularity(
    edges: DataFrame,
    assign: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    community_col: str = "community",
) -> DataFrame:
    """Newman modularity of a community assignment over an undirected
    graph: Q = Σ_c (e_c/m − (d_c/2m)²) — the standard objective for
    judging LPA/Louvain output (Q near 0: no structure; 0.3+: real
    communities). Returns one row per community
    (community, n_internal, degree_sum, q_term) plus callers sum
    q_term for Q.

    Scale: two keyed joins tag each edge endpoint with its community
    (the assignment is node-sized — broadcast when it fits, hash join
    otherwise); internal-edge and degree sums are combinable
    aggregates; output is community-count-sized. Each undirected edge
    appears once in `edges`; degrees count both endpoints."""
    m = edges.count()
    if m == 0:
        raise ValueError("empty edge set")
    a_src = assign.select(
        F.col(node_col).alias(src), F.col(community_col).alias("__c_src")
    )
    a_dst = assign.select(
        F.col(node_col).alias(dst), F.col(community_col).alias("__c_dst")
    )
    tagged = edges.join(a_src, src).join(a_dst, dst)
    internal = (
        tagged.filter(F.col("__c_src") == F.col("__c_dst"))
        .groupBy(F.col("__c_src").alias(community_col))
        .agg(F.count(F.lit(1)).alias("n_internal"))
    )
    degrees = (
        edges.select(F.col(src).alias(node_col))
        .unionAll(edges.select(F.col(dst).alias(node_col)))
        .join(assign, node_col)
        .groupBy(community_col)
        .agg(F.count(F.lit(1)).alias("degree_sum"))
    )
    out = degrees.join(internal, community_col, "left").fillna(
        0, subset=["n_internal"]
    )
    e_frac = F.col("n_internal") / F.lit(float(m))
    d_frac = F.col("degree_sum") / F.lit(2.0 * m)
    return out.select(
        community_col,
        "n_internal",
        "degree_sum",
        (e_frac - d_frac * d_frac).alias("q_term"),
    )


def personalized_pagerank(
    edges_df: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    source_col: str = "node",
    damping: float = 0.85,
    max_iterations: int = 20,
    tol: float = 1e-6,
) -> DataFrame:
    """Personalized PageRank: random walks restart at the SOURCE SET
    instead of uniformly — rank becomes proximity to the seeds, the
    standard recommendation / related-entity / topic-sensitive
    ranking primitive (seeds = a user's liked items, a topic's hub
    pages, a customer segment).

    Same relational power iteration as ``pagerank`` (one join + one
    combinable aggregate per round, localCheckpoint-bounded plans),
    with the teleport vector p(v) = 1/|S| on the seeds and 0
    elsewhere; dangling mass also re-enters through p (the standard
    stochastic completion), so unreachable nodes converge to exactly
    0 and mass is conserved on the seeds' reachable set."""
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
    seeds = sources.select(
        F.col(source_col).alias("node")
    ).distinct()
    ns = seeds.count()
    if ns == 0:
        raise ValueError("personalized_pagerank needs >= 1 source node")
    pvec = (
        nodes.join(
            seeds.withColumn("__is_seed", F.lit(1)), "node", "left"
        )
        .select(
            "node",
            F.when(
                F.col("__is_seed").isNotNull(), F.lit(1.0 / ns)
            )
            .otherwise(F.lit(0.0))
            .alias("__p"),
        )
        .localCheckpoint()
    )
    out_deg = edges.groupBy("src").agg(F.count("*").alias("__deg"))
    weighted_edges = (
        edges.join(out_deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("__deg")).alias("__w"))
        .localCheckpoint()
    )
    ranks = pvec.select("node", F.col("__p").alias("rank")).localCheckpoint()
    d = float(damping)
    for _ in range(max_iterations):
        contribs = (
            weighted_edges.join(ranks, weighted_edges.src == ranks.node)
            .select("dst", (F.col("rank") * F.col("__w")).alias("__c"))
            .groupBy("dst")
            .agg(F.sum("__c").alias("__in"))
        )
        dangling = (
            ranks.join(out_deg, ranks.node == out_deg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        new_ranks = (
            pvec.join(contribs, pvec.node == contribs.dst, "left")
            .select(
                "node",
                (
                    F.lit(1.0 - d) * F.col("__p")
                    + F.lit(d)
                    * (
                        F.coalesce(F.col("__in"), F.lit(0.0))
                        + F.lit(dangling) * F.col("__p")
                    )
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


def topological_levels(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """Topological level numbers for a DAG: level(v) = length of the
    LONGEST path from any source (in-degree-0) node to v — the
    parallel-schedule depth (build systems, lineage graphs, task
    DAGs: level k nodes can all run once levels < k finished).

    Relational longest-path propagation: start every node at level 0,
    then repeatedly set level(v) = 1 + max(level(u)) over in-edges
    u→v until a fixpoint — each round is ONE join + ONE combinable
    max-aggregate (same bounded-plan shape as pagerank;
    localCheckpoint per round). Rounds needed = longest path length;
    raises if no fixpoint within ``max_iterations`` (a cycle — not a
    DAG — would otherwise loop forever)."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    levels = nodes.withColumn("level", F.lit(0)).localCheckpoint()
    for _ in range(max_iterations):
        prop = (
            e.join(levels, e.src == levels.node)
            .groupBy("dst")
            .agg((F.max("level") + 1).alias("__lvl"))
        )
        new_levels = (
            nodes.join(prop, nodes.node == prop.dst, "left")
            .select(
                "node",
                F.coalesce(F.col("__lvl"), F.lit(0)).alias("level"),
            )
            .localCheckpoint()
        )
        changed = (
            new_levels.join(
                levels.withColumnRenamed("level", "__old"), "node"
            )
            .filter(F.col("level") != F.col("__old"))
            .limit(1)
            .count()
        )
        levels = new_levels
        if changed == 0:
            return levels.select("node", "level")
    raise ValueError(
        "no fixpoint reached — the edge set likely contains a cycle"
    )


def adamic_adar(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_common: int = 1,
    round_to: int = 6,
    max_degree: int | None = None,
) -> DataFrame:
    """Adamic-Adar link prediction over an undirected graph: for every
    NON-adjacent pair (u, v) at distance 2,
    ``score = Σ_{w ∈ N(u)∩N(v)} 1 / ln(deg(w))`` — the classic
    common-neighbor index that discounts hub middles (Adamic & Adar
    2003). Returns (u, v, common, score) with u < v.

    Shape: the same wedge skeleton as ``triangle_count`` — adjacency
    both ways, one self-equi-join on the shared middle, a combinable
    (u, v) groupBy, then a LEFT ANTI hash join against the canonical
    edge list so only unlinked candidates survive. Middle nodes of
    degree 1 cannot close a wedge, so 1/ln(deg) never divides by
    ln(1) = 0. Scale: wedge count is Σ deg(w)², the known cost of any
    common-neighbor method — hub middles are ordinary AQE-splittable
    join skew UNTIL one hub's wedge set is quadratic on its own, so
    ``max_degree`` (the same enforced-cap + reported-audit pattern as
    ``link_records``' max_block_size and the LSH bucket cap) excludes
    middles with deg(w) > max_degree from wedge formation entirely.
    The returned DataFrame carries ``.aa_audit`` with
    ``{"dropped_middles", "max_dropped_degree"}``; a dropped hub
    contributes at most 1/ln(max_degree+1) per pair — the smallest
    Adamic-Adar term by construction (the index's own premise is that
    hub middles carry the least signal), so the cap degrades the
    RANKING least where it saves the most compute. ``min_common``
    bounds the emitted candidate set either way.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
    )
    adj = e.select(
        F.col("lo").alias("node"), F.col("hi").alias("nb")
    ).unionByName(
        e.select(F.col("hi").alias("node"), F.col("lo").alias("nb"))
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("__deg"))
    aa_audit = {"dropped_middles": 0, "max_dropped_degree": 0}
    if max_degree is not None:
        hubs = deg.filter(F.col("__deg") > max_degree).persist()
        stats = hubs.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.max("__deg"), F.lit(0)).alias("m"),
        ).collect()[0]
        aa_audit = {
            "dropped_middles": int(stats["n"]),
            "max_dropped_degree": int(stats["m"]),
        }
        if aa_audit["dropped_middles"]:
            import logging

            logging.getLogger(__name__).warning(
                "adamic_adar: excluded %d hub middles with degree > %d "
                "(largest %d) from wedge formation; each contributed "
                "the smallest possible per-pair term 1/ln(deg).",
                aa_audit["dropped_middles"],
                max_degree,
                aa_audit["max_dropped_degree"],
            )
            adj = adj.join(
                F.broadcast(hubs.select("node")), "node", "left_anti"
            )
        hubs.unpersist()
    wedges = (
        adj.alias("x")
        .join(
            adj.alias("y"),
            (F.col("x.node") == F.col("y.node"))
            & (F.col("x.nb") < F.col("y.nb")),
        )
        .select(
            F.col("x.nb").alias("u"),
            F.col("x.node").alias("w"),
            F.col("y.nb").alias("v"),
        )
    )
    pairs = (
        wedges.join(deg, wedges["w"] == deg["node"])
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum(1.0 / F.log(F.col("__deg"))).alias("__aa"),
        )
        .filter(F.col("common") >= min_common)
    )
    out = pairs.join(
        e,
        (pairs["u"] == e["lo"]) & (pairs["v"] == e["hi"]),
        "left_anti",
    ).select("u", "v", "common", F.round("__aa", round_to).alias("score"))
    out.aa_audit = aa_audit
    return out
