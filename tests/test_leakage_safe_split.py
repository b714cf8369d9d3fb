"""leakage_safe_split: the contamination guarantee (near-dup pairs
never straddle splits), root correctness, weight sanity, and parity
with plain hash_split for pair-free corpora."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark, n=200):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_near_dups_never_straddle(spark):
    from pipeline_dataengineer_spark.operators.sampling import (
        leakage_safe_split,
    )

    docs = _docs(spark)
    # chains of 4: 0-1-2-3, 8-9-10-11, ... (every other 4-block)
    pairs = (
        docs.filter((F.col("doc_id") % 8 < 3))
        .select(
            F.col("doc_id").alias("id_a"),
            (F.col("doc_id") + 1).alias("id_b"),
        )
    )
    out = leakage_safe_split(
        docs, "doc_id", pairs, {"train": 0.7, "val": 0.3}
    )
    # every pair's two sides carry the same split label
    a = out.select(
        F.col("doc_id").alias("id_a"), F.col("split").alias("sa")
    )
    b = out.select(
        F.col("doc_id").alias("id_b"), F.col("split").alias("sb")
    )
    straddle = (
        pairs.join(a, "id_a").join(b, "id_b")
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert straddle == 0
    # roots: min id of the 4-chain for members, self for singletons
    rows = {r["doc_id"]: r["root"] for r in out.collect()}
    for d in range(200):
        if d % 8 < 4:
            assert rows[d] == d - d % 8
        else:
            assert rows[d] == d


def test_pair_free_matches_hash_split(spark):
    from pipeline_dataengineer_spark.operators.sampling import (
        hash_split,
        leakage_safe_split,
    )

    docs = _docs(spark)
    empty = docs.filter(F.lit(False)).select(
        F.col("doc_id").alias("id_a"), F.col("doc_id").alias("id_b")
    )
    w = {"train": 0.8, "val": 0.2}
    got = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(docs, "doc_id", empty, w).collect()
    }
    want = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, "doc_id", w).collect()
    }
    assert got == want


def test_weights_validated(spark):
    from pipeline_dataengineer_spark.operators.sampling import (
        leakage_safe_split,
    )

    docs = _docs(spark, 10)
    empty = docs.filter(F.lit(False)).select(
        F.col("doc_id").alias("id_a"), F.col("doc_id").alias("id_b")
    )
    with pytest.raises(ValueError, match="sum to 1"):
        leakage_safe_split(
            docs, "doc_id", empty, {"train": 0.5, "val": 0.1}
        )


def test_string_ids_raise_clearly(spark):
    from pipeline_dataengineer_spark.operators.sampling import (
        leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [("a",), ("b",)], "doc_id string"
    )
    empty = docs.filter(F.lit(False)).select(
        F.col("doc_id").alias("id_a"), F.col("doc_id").alias("id_b")
    )
    with pytest.raises(ValueError, match="integer id column"):
        leakage_safe_split(
            docs, "doc_id", empty, {"train": 0.5, "val": 0.5}
        )


def test_contamination_report_positive_and_negative(spark):
    """The audit's two faces on one fixture: a row-hash split leaks
    (nonzero off-diagonal), the cluster-rooted split cannot (empty
    off-diagonal)."""
    from pipeline_dataengineer_spark.operators.sampling import (
        hash_split,
        leakage_safe_split,
        split_contamination_report,
    )

    docs = _docs(spark, 400)
    pairs = (
        docs.filter(F.col("doc_id") % 4 < 3)
        .select(
            F.col("doc_id").alias("id_a"),
            (F.col("doc_id") + 1).alias("id_b"),
        )
    )
    w = {"train": 0.7, "val": 0.3}
    leaky = split_contamination_report(
        hash_split(docs, "doc_id", w), "doc_id", pairs
    )
    off = leaky.filter(F.col("split_a") != F.col("split_b"))
    assert off.count() > 0  # row-hash splits DO leak near-dups
    safe = split_contamination_report(
        leakage_safe_split(docs, "doc_id", pairs, w), "doc_id", pairs
    )
    assert (
        safe.filter(F.col("split_a") != F.col("split_b")).count() == 0
    )
    # every pair is accounted for in the report
    total = sum(r["n_pairs"] for r in safe.collect())
    assert total == pairs.count()


def test_contamination_report_surfaces_missing_endpoints(spark):
    """An endpoint absent from df must NOT silently vanish from the
    audit (round-9 ADVICE: an undercounting audit fails in the worst
    direction) — it surfaces as a '__missing__' split row."""
    from pipeline_dataengineer_spark.operators.sampling import (
        hash_split,
        split_contamination_report,
    )

    docs = _docs(spark, 100)
    pairs = spark.createDataFrame(
        [(1, 2), (3, 500), (600, 700)], "id_a long, id_b long"
    )  # 500/600/700 are not in docs
    rep = split_contamination_report(
        hash_split(docs, "doc_id", {"train": 0.7, "val": 0.3}),
        "doc_id",
        pairs,
    ).collect()
    total = sum(r["n_pairs"] for r in rep)
    assert total == 3  # every pair accounted for, none dropped
    missing = {
        (r["split_a"], r["split_b"]): r["n_pairs"]
        for r in rep
        if "__missing__" in (r["split_a"], r["split_b"])
    }
    assert sum(missing.values()) == 2
    assert ("__missing__", "__missing__") in missing  # the 600-700 pair


def test_contamination_report_distinguishes_null_split_from_miss(spark):
    """A matched row with a NULL split is '__null__', a join miss is
    '__missing__' (round-10 ADVICE: they are different data defects —
    an unlabeled row vs an endpoint the corpus never had — and the
    audit must not conflate them)."""
    from pipeline_dataengineer_spark.operators.sampling import (
        split_contamination_report,
    )

    docs = spark.createDataFrame(
        [(1, "train"), (2, None), (3, "test")],
        "doc_id long, split string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (3, 99)], "id_a long, id_b long"
    )  # 2 is present-but-NULL; 99 is absent
    rep = {
        (r["split_a"], r["split_b"]): r["n_pairs"]
        for r in split_contamination_report(
            docs, "doc_id", pairs
        ).collect()
    }
    assert rep == {
        ("__null__", "train"): 1,
        ("__missing__", "test"): 1,
    }
