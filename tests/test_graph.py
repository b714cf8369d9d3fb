"""Connected components + canonical dedup."""

from __future__ import annotations

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
