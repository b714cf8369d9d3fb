"""k-means: exact recovery on separated clusters + determinism."""

from __future__ import annotations

import numpy as np
import pytest

from pipeline_dataengineer_spark.operators.clustering import kmeans


@pytest.fixture(scope="module")
def clustered_df(spark):
    rng = np.random.default_rng(7)
    rows = []
    centers = np.array([[0.0] * 8, [10.0] * 8, [-10.0] * 8])
    for i in range(300):
        c = i % 3
        v = centers[c] + rng.normal(0, 0.5, 8)
        rows.append((i, [float(x) for x in v], c))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_kmeans_recovers_separated_clusters(clustered_df):
    out = kmeans(clustered_df, k=3).select("label", "cluster").collect()
    # every true label maps to exactly one recovered cluster id
    mapping: dict[int, int] = {}
    for r in out:
        assert mapping.setdefault(r.label, r.cluster) == r.cluster
    assert len(set(mapping.values())) == 3


def test_kmeans_deterministic_across_runs(clustered_df):
    a = kmeans(clustered_df, k=3).select("vec_id", "cluster")
    b = kmeans(clustered_df.repartition(7), k=3).select("vec_id", "cluster")
    assert a.exceptAll(b).count() == 0


def test_kmeans_real_embeddings_partitions_corpus(spark):
    # testdata labels are NOT geometric clusters (checked: purity vs
    # k-means is at chance), so assert operator behavior instead:
    # every row gets exactly one cluster in [0, k), nothing is lost,
    # and no cluster ends up empty on a spread-out corpus.
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = kmeans(df, k=5)
    assert out.count() == df.count()
    sizes = {r.cluster: r.cnt for r in out.groupBy("cluster").count().withColumnRenamed("count", "cnt").collect()}
    assert set(sizes) <= set(range(5))
    assert sum(sizes.values()) == df.count()
    assert len(sizes) == 5


def test_kcenter_coreset_line_fixture(spark):
    """On colinear points the greedy trajectory is fully determined:
    seed = min id (leftmost here), then the far end, then the exact
    midpoint gap maxima; sel_dist is the squared gap at selection."""
    from pipeline_dataengineer_spark.operators.clustering import (
        kcenter_coreset,
    )

    # ids 0..8 at x = 0, 1, ..., 8 on a line (dim-2 to exercise the
    # fold); seed is id 0 at x=0.
    rows = [(i, [float(i), 0.0]) for i in range(9)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["round"]: (r["center_id"], r["sel_dist"])
           for r in kcenter_coreset(df, k=4).collect()}
    assert out[1] == (0, None)
    assert out[2] == (8, 64.0)          # far end, d = 8^2
    assert out[3] == (4, 16.0)          # midpoint, min(4,4)^2 with min-id tie
    assert out[4] == (2, 4.0)           # next gap: ids 2 and 6 tie at 4 -> min id
