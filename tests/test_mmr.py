"""MMR diversification (operators/similarity.py:mmr_rerank): the
lam<1 greedy path on a hand-computed case, the lam=1 degenerate
order, and the bounded-k cut."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pipeline_dataengineer_spark.operators.similarity import mmr_rerank


def _cand_df(spark):
    # query 0 at [1, 0]. Candidate a is the top hit, b is nearly
    # PARALLEL to a (cos(b,a) ≈ 1 while rel(b) < rel(a) — redundancy
    # exceeds relevance, so the penalty can bite), c sits on the
    # other side of the query (diverse: cos(c,a) ≈ 0.72 << rel(c)).
    # NB: a must NOT point straight at the query — then cos(x,a) ==
    # rel(x) and the lam=0.5 objective cancels to 0 for everyone.
    rows = [
        (0, "a", [0.9487, 0.3162]),
        (0, "b", [0.948, 0.3183]),
        (0, "c", [0.9, -0.4359]),
    ]
    q = [1.0, 0.0]

    def cos(v):
        d = sum(x * y for x, y in zip(v, q))
        return round(d / math.hypot(*v), 4)

    return spark.createDataFrame(
        [(qid, vid, cos(v), v) for qid, vid, v in rows],
        "query_id long, vec_id string, score double, embedding array<double>",
    )


def test_mmr_diversifies_against_redundant_candidate(spark):
    """Pure relevance ranks a, b, c (b nearly parallel to a). MMR at
    lam=0.5 must demote b below c after picking a — the redundancy
    penalty max-cos(b, a) ≈ 1 swamps b's relevance edge."""
    out = mmr_rerank(_cand_df(spark), k=3, lam=0.5).collect()
    order = [r["vec_id"] for r in sorted(out, key=lambda r: r["mmr_rank"])]
    assert order == ["a", "c", "b"]
    # first pick's score is lam * rel (no redundancy term yet)
    first = next(r for r in out if r["mmr_rank"] == 1)
    assert abs(first["mmr_score"] - 0.5 * 0.9487) < 1e-4


def test_mmr_lambda_one_equals_relevance_order(spark):
    """lam=1: rank order must equal (score desc, id asc) — the
    lossless configuration the q_mmr_rerank oracle hash-checks."""
    out = mmr_rerank(_cand_df(spark), k=3, lam=1.0).collect()
    order = [r["vec_id"] for r in sorted(out, key=lambda r: r["mmr_rank"])]
    assert order == ["a", "b", "c"]
    scores = {r["vec_id"]: r["mmr_score"] for r in out}
    assert abs(scores["a"] - 0.9487) < 1e-4  # mmr_score == relevance at lam=1


def test_mmr_k_cut_and_multi_query(spark):
    """k bounds output per query; queries are independent groups."""
    one = _cand_df(spark)
    two = one.withColumn("query_id", F.lit(1).cast("long"))
    out = mmr_rerank(one.unionByName(two), k=2, lam=0.5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1}
    for rows in by_q.values():
        assert sorted(r["mmr_rank"] for r in rows) == [1, 2]
        assert [r["vec_id"] for r in sorted(rows, key=lambda r: r["mmr_rank"])] == ["a", "c"]


def test_hard_negatives_label_filter_and_rank(spark):
    """Hard negatives never share the anchor's label, never include
    the anchor row, and rank by descending rounded cosine with the
    id tie-break."""
    from pipeline_dataengineer_spark.operators.similarity import (
        hard_negatives,
    )

    rows = [
        # (id, vec, label): anchor 1 points along +x with label "A".
        (1, [1.0, 0.0], "A"),
        (2, [0.99, 0.14], "A"),   # same label: excluded however close
        (3, [0.95, 0.31], "B"),   # closest valid negative
        (4, [0.9, 0.44], "B"),
        (5, [0.0, 1.0], "C"),     # orthogonal: last
        (6, [0.95, 0.31], "B"),   # exact tie with 3 -> id order
    ]
    df = spark.createDataFrame(
        rows, "vec_id int, embedding array<double>, label string"
    )
    anchors = df.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("anchor_vec"),
        F.col("label").alias("anchor_label"),
    )
    out = hard_negatives(anchors, df, k=3).collect()
    got = [(r["neg_id"], r["rank"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert got == [(3, 1), (6, 2), (4, 3)]
    assert all(r["cos_sim"] <= 1.0 for r in out)
