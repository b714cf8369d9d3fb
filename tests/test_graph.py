"""Connected components + canonical dedup."""

from __future__ import annotations

import pytest

from pipeline_dataengineer_spark.operators.graph import (
    connected_components,
    dedup_keep_canonical,
)


def test_connected_components_chain_and_islands(spark):
    # components: {1,2,3,4} (chain), {10,11}, isolated nodes absent
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    got = {
        r["node"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_long_chain_converges(spark):
    # diameter 9 chain — exercises multiple propagation rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], ["id_a", "id_b"]
    )
    got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert set(got.values()) == {0}


def test_dedup_keep_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(6)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(1, 3), (3, 5)], ["id_a", "id_b"])
    kept = sorted(
        r["doc_id"] for r in dedup_keep_canonical(docs, pairs, "doc_id").collect()
    )
    # cluster {1,3,5} -> keep 1; untouched 0,2,4 pass through
    assert kept == [0, 1, 2, 4]


def _reference_pagerank(edges, damping=0.85, iters=200):
    """Independent pure-Python power iteration (NetworkX semantics)."""
    nodes = sorted({n for e in edges for n in e})
    n = len(nodes)
    out = {}
    for s, d in edges:
        out.setdefault(s, set()).add(d)
    ranks = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        nxt = {v: (1.0 - damping) / n for v in nodes}
        dangling = sum(ranks[v] for v in nodes if v not in out)
        for v in nodes:
            nxt[v] += damping * dangling / n
        for s, ds in out.items():
            share = ranks[s] / len(ds)
            for d in ds:
                nxt[d] += damping * share
        ranks = nxt
    return ranks


def test_pagerank_matches_reference_power_iteration(spark):
    from pipeline_dataengineer_spark.operators.graph import pagerank

    # has a cycle, a hub, and a dangling node (4)
    edges = [(0, 1), (1, 2), (2, 0), (0, 2), (3, 2), (3, 0), (2, 4)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in
           pagerank(df, max_iterations=100, tol=1e-12).collect()}
    want = _reference_pagerank(edges)
    assert abs(sum(got.values()) - 1.0) < 1e-6
    for v, w in want.items():
        assert abs(got[v] - w) < 1e-6, (v, got[v], w)


def test_resolve_entities_clusters_typos_and_keeps_singletons(spark):
    from pipeline_dataengineer_spark.operators.graph import resolve_entities

    rows = [
        (1, "acme corporation"),
        (2, "acme corporation."),   # 1 edit from 1
        (3, "acme corporations."),  # 1 edit from 2, 2 edits from 1 → chains in
        (4, "zenith holdings"),     # singleton
        (5, "zenith holding"),      # 1 edit from 4
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = {r["id"]: r["entity_id"]
           for r in resolve_entities(df, "id", "name").collect()}
    assert got[1] == got[2] == got[3] == 1   # transitive cluster, min id
    assert got[4] == got[5] == 4
    # totality: every input row appears exactly once
    assert sorted(got) == [1, 2, 3, 4, 5]


def test_resolve_entities_keeps_null_name_rows(spark):
    from pipeline_dataengineer_spark.operators.graph import resolve_entities

    rows = [(1, "acme corp"), (2, "acme corp."), (3, None), (4, None)]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {r["id"]: r["entity_id"]
           for r in resolve_entities(df, "id", "name").collect()}
    # totality: NULL-name rows survive as their own singleton entities
    assert sorted(got) == [1, 2, 3, 4]
    assert got[1] == got[2] == 1
    assert got[3] == 3 and got[4] == 4


def test_triangle_count_known_graph(spark):
    from pipeline_dataengineer_spark.operators.graph import triangle_count

    # K4 has 4 triangles; plus a dangling pendant edge and a self-loop
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges += [(3, 9), (2, 2)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    assert triangle_count(df).collect()[0]["triangles"] == 4
    # direction/duplicates don't double-count
    rev = spark.createDataFrame(edges + [(b, a) for a, b in edges], ["src", "dst"])
    assert triangle_count(rev).collect()[0]["triangles"] == 4
    # triangle-free graph
    path = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], ["src", "dst"])
    assert triangle_count(path).collect()[0]["triangles"] == 0


def test_co_occurrence_counts_and_basket_cap(spark):
    from pipeline_dataengineer_spark.operators.graph import co_occurrence

    rows = (
        [("b1", "x"), ("b1", "y"), ("b1", "z"),
         ("b2", "x"), ("b2", "y"),
         ("b3", "x"), ("b3", "y"), ("b3", "x")]  # dup item in basket: once
        + [("huge", f"i{k}") for k in range(20)]
    )
    df = spark.createDataFrame(rows, ["basket", "item"])
    got = {
        (r["item_a"], r["item_b"]): r["n_baskets"]
        for r in co_occurrence(df, "basket", "item").collect()
    }
    assert got[("x", "y")] == 3 and got[("x", "z")] == 1 and got[("y", "z")] == 1
    # cap: the 20-item basket is dropped BEFORE pair expansion
    capped = co_occurrence(df, "basket", "item", max_basket_size=10)
    pairs = {(r["item_a"], r["item_b"]) for r in capped.collect()}
    assert pairs == {("x", "y"), ("x", "z"), ("y", "z")}


def test_bfs_shortest_paths_directed(spark):
    from pipeline_dataengineer_spark.operators.graph import bfs_shortest_paths

    # 1->2->3->4 chain plus shortcut 1->3; node 9 unreachable; edge
    # 5->1 points INTO the source (must not be traversed backwards).
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 3), (5, 1), (9, 9)], ["src", "dst"]
    )
    sources = spark.createDataFrame([(1,)], ["node"])
    got = {
        r["node"]: r["dist"]
        for r in bfs_shortest_paths(edges, sources).collect()
    }
    assert got == {1: 0, 2: 1, 3: 1, 4: 2}


def test_bfs_undirected_and_multisource(spark):
    from pipeline_dataengineer_spark.operators.graph import bfs_shortest_paths

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["src", "dst"]
    )
    sources = spark.createDataFrame([(4,), (11,)], ["node"])
    got = {
        r["node"]: r["dist"]
        for r in bfs_shortest_paths(edges, sources, directed=False).collect()
    }
    # undirected: traverses 4->3->2->1; multi-source: 11 seeds its island
    assert got == {4: 0, 11: 0, 3: 1, 10: 1, 2: 2, 1: 3}


def test_bfs_max_depth_truncates(spark):
    from pipeline_dataengineer_spark.operators.graph import bfs_shortest_paths

    edges = spark.createDataFrame([(i, i + 1) for i in range(6)], ["src", "dst"])
    sources = spark.createDataFrame([(0,)], ["node"])
    # RADIUS reading: strict=False opts into the within-N-hops cut
    got = bfs_shortest_paths(
        edges, sources, max_depth=2, strict=False
    ).collect()
    assert {r["node"]: r["dist"] for r in got} == {0: 0, 1: 1, 2: 2}
    # default is fail-loud on the same truncating budget
    import pytest

    with pytest.raises(RuntimeError, match="max_depth"):
        bfs_shortest_paths(edges, sources, max_depth=2).collect()


def test_weighted_shortest_paths_prefers_cheap_long_path(spark):
    from pipeline_dataengineer_spark.operators.graph import (
        weighted_shortest_paths,
    )

    # direct 1->4 costs 10; the 3-hop detour costs 3
    edges = spark.createDataFrame(
        [(1, 4, 10.0), (1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0), (4, 5, 2.0)],
        ["src", "dst", "weight"],
    )
    sources = spark.createDataFrame([(1,)], ["node"])
    got = {
        r["node"]: r["dist"]
        for r in weighted_shortest_paths(edges, sources).collect()
    }
    assert got == {1: 0.0, 2: 1.0, 3: 2.0, 4: 3.0, 5: 5.0}


def test_weighted_shortest_paths_handles_cycles(spark):
    from pipeline_dataengineer_spark.operators.graph import (
        weighted_shortest_paths,
    )

    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0), (3, 4, 1.0)],
        ["src", "dst", "weight"],
    )
    sources = spark.createDataFrame([(1,)], ["node"])
    got = {
        r["node"]: r["dist"]
        for r in weighted_shortest_paths(edges, sources).collect()
    }
    assert got == {1: 0.0, 2: 1.0, 3: 2.0, 4: 3.0}


def test_k_core_peels_tail_keeps_triangle(spark):
    from pipeline_dataengineer_spark.operators.graph import k_core

    # triangle {1,2,3} with a tail 3-4-5: 2-core is the triangle
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], ["src", "dst"]
    )
    got = {r["node"]: r["degree"] for r in k_core(edges, 2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_k_core_cascading_peel(spark):
    from pipeline_dataengineer_spark.operators.graph import k_core

    # star: center degree 4 but leaves degree 1 — peeling the leaves
    # empties the graph (the center's degree collapses), needs rounds
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], ["src", "dst"]
    )
    assert k_core(edges, 2).count() == 0


def test_clustering_coefficient_hand_graph(spark):
    """K3 plus a pendant: triangle nodes have coeff 1 (or 1/3 for the
    node that also holds the pendant), pendant has 0."""
    from pipeline_dataengineer_spark.operators.graph import (
        clustering_coefficient,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long"
    )
    got = {
        r["node"]: (r["degree"], r["triangles"], r["coefficient"])
        for r in clustering_coefficient(edges).collect()
    }
    assert got[1] == (2, 1, 1.0)
    assert got[2] == (2, 1, 1.0)
    assert got[3] == (3, 1, pytest.approx(1 / 3))
    assert got[4] == (1, 0, 0.0)


def test_clustering_coefficient_square_no_triangles(spark):
    from pipeline_dataengineer_spark.operators.graph import (
        clustering_coefficient,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    rows = clustering_coefficient(edges).collect()
    assert all(r["coefficient"] == 0.0 and r["triangles"] == 0 for r in rows)
    assert all(r["degree"] == 2 for r in rows)


def test_label_propagation_two_cliques_with_bridge(spark):
    """Two 4-cliques joined by one bridge edge: LPA keeps them as two
    communities (CC would merge them)."""
    from pipeline_dataengineer_spark.operators.graph import (
        label_propagation,
    )

    cliq1 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    cliq2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges = spark.createDataFrame(
        cliq1 + cliq2 + [(4, 10)], "src long, dst long"
    )
    got = {
        r["node"]: r["label"]
        for r in label_propagation(edges, max_iterations=8).collect()
    }
    left = {got[n] for n in range(1, 5)}
    right = {got[n] for n in range(10, 14)}
    assert len(left) == 1 and len(right) == 1
    assert left != right


def test_label_propagation_total_and_deterministic(spark):
    from pipeline_dataengineer_spark.operators.graph import (
        label_propagation,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "src long, dst long"
    )
    a = {
        (r["node"], r["label"])
        for r in label_propagation(edges.repartition(7)).collect()
    }
    b = {
        (r["node"], r["label"])
        for r in label_propagation(edges.coalesce(1)).collect()
    }
    assert a == b
    assert {n for n, _ in a} == {1, 2, 3, 5, 6}


def test_hits_hub_authority_structure(spark):
    """Star pointing at one center: center is the sole authority,
    leaves are equal hubs with zero authority."""
    from pipeline_dataengineer_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 5)], "src long, dst long"
    )
    got = {r["node"]: r for r in hits(edges, max_iterations=4).collect()}
    assert got[0]["authority"] == pytest.approx(1.0)
    assert got[0]["hub"] == 0.0
    for i in range(1, 5):
        assert got[i]["hub"] == pytest.approx(0.25)
        assert got[i]["authority"] == 0.0


def test_hits_scores_normalized_and_total(spark):
    from pipeline_dataengineer_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3)], "src long, dst long"
    )
    rows = hits(edges, max_iterations=6).collect()
    assert len(rows) == 3
    assert sum(r["hub"] for r in rows) == pytest.approx(1.0)
    assert sum(r["authority"] for r in rows) == pytest.approx(1.0)
    # node 3 has two in-edges -> highest authority
    top_auth = max(rows, key=lambda r: r["authority"])
    assert top_auth["node"] == 3


def test_association_rules_hand_computed(spark):
    from pipeline_dataengineer_spark.operators.graph import association_rules

    # 4 baskets: {m,b} x2, {m} x1, {b,x} x1
    rows = [
        (1, "milk"), (1, "bread"),
        (2, "milk"), (2, "bread"),
        (3, "milk"),
        (4, "bread"), (4, "x"),
    ]
    df = spark.createDataFrame(rows, "bk long, it string")
    out = {
        (r["item_a"], r["item_b"]): (r["support"], r["confidence"], r["lift"])
        for r in association_rules(df, "bk", "it", min_count=2).collect()
    }
    # milk->bread: nab=2, na(milk)=3, nb(bread)=3, N=4
    assert out[("milk", "bread")] == (0.5, round(2 / 3, 4), round(8 / 9, 4))
    # bread->milk: confidence 2/3 as well (symmetric counts here)
    assert out[("bread", "milk")] == (0.5, round(2 / 3, 4), round(8 / 9, 4))


def test_modularity_hand_computed(spark):
    """Two triangles joined by one bridge edge: m=7, each community
    has 3 internal edges; degree sums 7 and 7 (bridge endpoints have
    degree 3). Q = 2*(3/7 - (7/14)^2) = 2*(3/7 - 1/4)."""
    from pipeline_dataengineer_spark.operators.graph import modularity

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "src long, dst long",
    )
    assign = spark.createDataFrame(
        [(n, n // 4) for n in range(1, 7)], "node long, community long"
    )
    rows = {r["community"]: r for r in modularity(edges, assign).collect()}
    assert rows[0]["n_internal"] == 3 and rows[1]["n_internal"] == 3
    assert rows[0]["degree_sum"] == 7 and rows[1]["degree_sum"] == 7
    q = sum(r["q_term"] for r in rows.values())
    assert abs(q - 2 * (3 / 7 - 0.25)) < 1e-12

    # a random-ish assignment scores lower than the true communities
    bad = spark.createDataFrame(
        [(n, n % 2) for n in range(1, 7)], "node long, community long"
    )
    q_bad = sum(r["q_term"] for r in modularity(edges, bad).collect())
    assert q_bad < q

    import pytest

    with pytest.raises(ValueError):
        modularity(edges.limit(0), assign)


def test_personalized_pagerank_vs_numpy(spark):
    """PPR on a small directed graph vs an independent numpy power
    iteration with the same teleport/dangling conventions; a node
    unreachable from the seeds scores exactly 0."""
    import numpy as np
    import pytest

    from pipeline_dataengineer_spark.operators.graph import (
        personalized_pagerank,
    )

    # 1->2->3->1 cycle, 3->4, 5->1 (5 unreachable FROM seeds; 4 is a
    # dangling sink)
    e = [(1, 2), (2, 3), (3, 1), (3, 4), (5, 1)]
    edges = spark.createDataFrame(e, "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(
            edges, seeds, max_iterations=40, tol=1e-14
        ).collect()
    }

    nodes = sorted({u for ed in e for u in ed})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    p = np.zeros(n)
    p[idx[1]] = 1.0
    out = {u: [] for u in nodes}
    for a, b in e:
        out[a].append(b)
    r = p.copy()
    for _ in range(40):
        nxt = np.zeros(n)
        dang = 0.0
        for u in nodes:
            if out[u]:
                for v in out[u]:
                    nxt[idx[v]] += r[idx[u]] / len(out[u])
            else:
                dang += r[idx[u]]
        r = 0.15 * p + 0.85 * (nxt + dang * p)
    for v in nodes:
        assert got[v] == pytest.approx(r[idx[v]], abs=1e-9)
    assert got[5] == 0.0  # never reachable from seed 1
    assert got[1] > got[2] > 0  # proximity ordering from the seed

    with pytest.raises(ValueError):
        personalized_pagerank(edges, seeds.limit(0))


def test_topological_levels_diamond_and_cycle(spark):
    import pytest

    from pipeline_dataengineer_spark.operators.graph import (
        topological_levels,
    )

    # diamond with a long arm: longest path wins
    # 1 -> 2 -> 4, 1 -> 3 -> 5 -> 4, 4 -> 6
    e = [(1, 2), (2, 4), (1, 3), (3, 5), (5, 4), (4, 6)]
    edges = spark.createDataFrame(e, "src long, dst long")
    got = {
        r["node"]: r["level"]
        for r in topological_levels(edges).collect()
    }
    assert got == {1: 0, 2: 1, 3: 1, 5: 2, 4: 3, 6: 4}

    cyc = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        topological_levels(cyc, max_iterations=5)


def test_adamic_adar_square_with_diagonal(spark):
    """Graph 1-2, 2-3, 3-4, 4-1, 1-3 (a square plus one diagonal).
    Non-adjacent distance-2 pairs: only (2, 4), with common neighbors
    {1, 3} of degrees 3 and 3 -> score = 2 / ln(3)."""
    import math

    from pipeline_dataengineer_spark.operators.graph import adamic_adar

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)], "src long, dst long"
    )
    out = adamic_adar(edges).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["u"], r["v"], r["common"]) == (2, 4, 2)
    assert abs(r["score"] - round(2 / math.log(3), 6)) < 1e-9


def test_adamic_adar_excludes_adjacent_and_orientation(spark):
    """Reversed/duplicated edge rows canonicalize; adjacent pairs
    never appear even when they share neighbors."""
    from pipeline_dataengineer_spark.operators.graph import adamic_adar

    edges = spark.createDataFrame(
        [(2, 1), (1, 2), (2, 3), (1, 3)], "src long, dst long"
    )
    # triangle: every pair adjacent -> no predictions at all
    assert adamic_adar(edges).count() == 0


def test_bfs_raises_on_truncated_depth(spark):
    """A 6-node chain with max_depth=3 must FAIL LOUD, not report
    nodes 4..5 unreachable; max_depth exactly equal to the true
    depth must succeed (probe, no spurious raise)."""
    import pytest

    from pipeline_dataengineer_spark.operators.graph import (
        bfs_shortest_paths,
    )

    e = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "src int, dst int"
    )
    s = spark.createDataFrame([(0,)], "node int")
    with pytest.raises(RuntimeError, match="max_depth"):
        bfs_shortest_paths(e, s, max_depth=3).collect()
    ok = bfs_shortest_paths(e, s, max_depth=5).collect()
    assert {r["node"]: r["dist"] for r in ok}[5] == 5


def test_wsp_raises_on_truncated_budget(spark):
    """Bellman-Ford under an exhausted round budget with distances
    still improving raises; an exact-budget run passes the probe."""
    import pytest

    from pipeline_dataengineer_spark.operators.graph import (
        weighted_shortest_paths,
    )

    e = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(5)], "src int, dst int, weight double"
    )
    s = spark.createDataFrame([(0,)], "node int")
    with pytest.raises(RuntimeError, match="max_iterations"):
        weighted_shortest_paths(e, s, max_iterations=3).collect()
    ok = weighted_shortest_paths(e, s, max_iterations=5).collect()
    assert {r["node"]: r["dist"] for r in ok}[5] == 5.0


def test_cc_converges_on_deep_chain(spark):
    """Diameter worst case: a 10k-node path. Plain min-label
    propagation needs 10k rounds (the pre-round-7 code could never
    finish this); star contraction does it inside the default
    20-round budget."""
    from pipeline_dataengineer_spark.operators.graph import (
        connected_components,
    )

    e = spark.range(9_999).selectExpr("id AS id_a", "id + 1 AS id_b")
    # driver_finish_edges=0 forces the fully distributed contraction
    # path (the default hybrid would just collect 10k edges)
    out = connected_components(e, driver_finish_edges=0)
    rows = out.collect()
    assert len(rows) == 10_000
    assert {r["component"] for r in rows} == {0}
