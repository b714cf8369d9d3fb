"""ALS (operators/recommender.py): reconstruction quality on a
planted low-rank matrix, bit-exact determinism across layouts, and
scoring/top-k consistency."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pipeline_dataengineer_spark.operators.recommender import (
    als,
    predict_ratings,
    recommend_top_k,
)


def _planted(spark, n_users=30, n_items=20, rank=3, seed=5, keep=0.7):
    rng = np.random.default_rng(seed)
    u = rng.normal(scale=1.0, size=(n_users, rank))
    v = rng.normal(scale=1.0, size=(n_items, rank))
    full = u @ v.T
    rows = [
        (ui, ii, float(full[ui, ii]))
        for ui in range(n_users)
        for ii in range(n_items)
        if rng.random() < keep
    ]
    df = spark.createDataFrame(
        rows, "user_id long, item_id long, rating double"
    )
    return df, full


def test_als_reconstructs_low_rank(spark):
    df, full = _planted(spark)
    uf, itf = als(df, rank=4, reg=0.05, iterations=8)
    pred = predict_ratings(df, uf, itf).collect()
    err = np.sqrt(
        np.mean([(r["prediction"] - r["rating"]) ** 2 for r in pred])
    )
    scale = np.sqrt(np.mean(full**2))
    assert err < 0.15 * scale, f"rmse {err} vs signal {scale}"


def test_als_deterministic_across_layouts(spark):
    df, _ = _planted(spark, n_users=12, n_items=8)
    uf1, _ = als(df.repartition(13), rank=3, iterations=3)
    uf2, _ = als(df.coalesce(1), rank=3, iterations=3)
    a = {r["user_id"]: list(r["factors"]) for r in uf1.collect()}
    b = {r["user_id"]: list(r["factors"]) for r in uf2.collect()}
    assert a == b  # bit-exact


def test_predict_matches_manual_dot(spark):
    df, _ = _planted(spark, n_users=6, n_items=5)
    uf, itf = als(df, rank=2, iterations=2)
    u = {r["user_id"]: np.array(r["factors"]) for r in uf.collect()}
    v = {r["item_id"]: np.array(r["factors"]) for r in itf.collect()}
    for r in predict_ratings(df, uf, itf).collect():
        want = float(u[r["user_id"]] @ v[r["item_id"]])
        assert r["prediction"] == pytest.approx(want, rel=1e-12)


def test_recommend_top_k(spark):
    df, _ = _planted(spark, n_users=8, n_items=10)
    uf, itf = als(df, rank=3, iterations=3)
    u = {r["user_id"]: np.array(r["factors"]) for r in uf.collect()}
    v_rows = itf.collect()
    vids = [r["item_id"] for r in v_rows]
    v = np.stack([np.array(r["factors"]) for r in v_rows])
    recs = recommend_top_k(uf, itf, k=3)
    got = {}
    for r in recs.collect():
        got.setdefault(r["user_id"], []).append((r["rank"], r["item_id"], r["prediction"]))
    assert set(got) == set(u)
    for uid, lst in got.items():
        lst.sort()
        assert len(lst) == 3
        scores = u[uid] @ v.T
        best = sorted(zip(scores, vids), key=lambda t: -t[0])[:3]
        assert [i for _, i, _ in lst] == [i for _, i in best]
        assert lst[0][2] == pytest.approx(best[0][0], rel=1e-12)


def test_negative_samples_never_overlap_interactions(spark):
    from pipeline_dataengineer_spark.operators.recommender import (
        negative_samples,
    )

    inter = spark.createDataFrame(
        [(u, i) for u in range(10) for i in range(u % 5)],
        "user_id long, item_id long",
    )
    items = spark.createDataFrame(
        [(i,) for i in range(50)], "item_id long"
    )
    negs = negative_samples(inter, items, k=3)
    joined = negs.join(inter, ["user_id", "item_id"], "inner")
    assert joined.count() == 0
    per_user = {r["user_id"]: r["count"] for r in negs.groupBy("user_id").count().collect()}
    assert all(v == 3 for v in per_user.values())
    # only users that actually appear in interactions (u % 5 > 0)
    assert set(per_user) == {u for u in range(10) if u % 5}


def test_negative_samples_deterministic_across_layouts(spark):
    from pipeline_dataengineer_spark.operators.recommender import (
        negative_samples,
    )

    inter = spark.createDataFrame(
        [(u, u % 7) for u in range(30)], "user_id long, item_id long"
    )
    items = spark.createDataFrame([(i,) for i in range(40)], "item_id long")
    a = sorted(tuple(r) for r in negative_samples(inter.repartition(9), items, k=2).collect())
    b = sorted(tuple(r) for r in negative_samples(inter.coalesce(1), items, k=2).collect())
    assert a == b


def test_negative_samples_shrinks_when_catalog_saturated(spark):
    """User interacted with nearly everything: fewer than k negatives
    come back (documented contract), never a positive."""
    from pipeline_dataengineer_spark.operators.recommender import (
        negative_samples,
    )

    inter = spark.createDataFrame(
        [(1, i) for i in range(9)], "user_id long, item_id long"
    )
    items = spark.createDataFrame([(i,) for i in range(10)], "item_id long")
    rows = negative_samples(inter, items, k=5, oversample=4).collect()
    assert all(r["item_id"] == 9 for r in rows)
    assert 1 <= len(rows) <= 5


def test_ranking_metrics_hand_computed(spark):
    from pipeline_dataengineer_spark.operators.ranking_eval import (
        ranking_metrics,
    )

    import math

    ranked = spark.createDataFrame(
        # q1 top-3: items a(1) b(2) c(3); q2 top-2: x(1) y(2)
        [("q1", "a", 1), ("q1", "b", 2), ("q1", "c", 3),
         ("q2", "x", 1), ("q2", "y", 2)],
        "q string, item string, rank long",
    )
    truth = spark.createDataFrame(
        # q1 relevant {a, c, zz}; q2 relevant {y}
        [("q1", "a"), ("q1", "c"), ("q1", "zz"), ("q2", "y")],
        "q string, item string",
    )
    out = {
        r["q"]: (r["n_relevant"], r["n_hits"], r["recall_at_k"], r["ndcg_at_k"])
        for r in ranking_metrics(ranked, truth, "q", "item", "rank", k=3).collect()
    }
    # q1: hits a@1, c@3 -> recall 2/3; DCG = 1/log2(2) + 1/log2(4) = 1.5
    # IDCG@3 (3 relevant) = 1 + 1/log2(3) + 0.5
    idcg3 = 1 + 1 / math.log2(3) + 0.5
    assert out["q1"] == (3, 2, round(2 / 3, 4), round(1.5 / idcg3, 4))
    # q2: hit y@2 -> recall 1; DCG = 1/log2(3), IDCG@3(1 rel) = 1
    assert out["q2"] == (1, 1, 1.0, round(1 / math.log2(3), 4))
    # query with relevant items but nothing ranked -> zeros, not dropped
    truth2 = truth.union(spark.createDataFrame([("q9", "k")], truth.schema))
    out2 = {
        r["q"]: r["recall_at_k"]
        for r in ranking_metrics(ranked, truth2, "q", "item", "rank", k=3).collect()
    }
    assert out2["q9"] == 0.0


def test_rank_biased_overlap_bounds(spark):
    from pyspark.sql import functions as F

    from pipeline_dataengineer_spark.operators.ranking_eval import (
        rank_biased_overlap,
    )

    df = spark.createDataFrame(
        [
            (1, ["a", "b", "c", "d", "e"], ["a", "b", "c", "d", "e"]),
            (2, ["a", "b", "c", "d", "e"], ["v", "w", "x", "y", "z"]),
            (3, ["a", "b", "c", "d", "e"], ["b", "a", "c", "d", "e"]),
            (4, [], ["a"]),
        ],
        "rid long, ra array<string>, rb array<string>",
    )
    got = {
        r["rid"]: r["rbo"]
        for r in rank_biased_overlap(df, "ra", "rb", p=0.9).collect()
    }
    # identical lists at truncated depth k: RBO_min = 1 - p^k
    assert got[1] == round(1 - 0.9**5, 6)
    assert got[2] == 0.0
    # top-1 disagreement costs, deeper agreement recovers: strictly
    # between disjoint and identical
    assert 0.0 < got[3] < got[1]
    assert got[4] is None  # empty side -> undefined
