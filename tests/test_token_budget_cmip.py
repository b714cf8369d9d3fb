"""token_budget_sample boundary semantics, cm_inner_product join-size
estimation, and LSH recall measured against the EXACT prefix-filter
Jaccard join as ground truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline_dataengineer_spark.functions.sketches import (
    cm_inner_product,
    cm_states,
)
from pipeline_dataengineer_spark.operators.corpus import token_budget_sample


def test_token_budget_crossing_doc_kept(spark):
    """The doc that crosses the budget boundary is kept; later docs
    are not; a tiny budget still yields one doc."""
    df = spark.createDataFrame(
        [(i, "a", 10) for i in range(1, 11)] + [(100, "b", 50)],
        "doc_id long, lang string, n_tokens long",
    )
    out = token_budget_sample(
        df, "lang", "n_tokens", {"a": 25, "b": 1}, key_col="doc_id"
    )
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # 25-token budget over 10-token docs: doc1 (cum 10 < 25 ok),
    # doc2 (cum 20), doc3 crosses at 30 (20 < 25) -> exactly 3 docs
    assert by_lang == {"a": 3, "b": 1}


def test_token_budget_unbudgeted_strata_dropped(spark):
    df = spark.createDataFrame(
        [(1, "a", 5), (2, "zzz", 5)], "doc_id long, lang string, n_tokens long"
    )
    out = token_budget_sample(df, "lang", "n_tokens", {"a": 100}).collect()
    assert [r["lang"] for r in out] == ["a"]


def test_token_budget_layout_independent(spark):
    df = spark.createDataFrame(
        [(i, "a", (i % 7) + 1) for i in range(100)],
        "doc_id long, lang string, n_tokens long",
    )
    a = sorted(
        r["doc_id"]
        for r in token_budget_sample(
            df.repartition(13), "lang", "n_tokens", {"a": 60}
        ).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in token_budget_sample(
            df.coalesce(1), "lang", "n_tokens", {"a": 60}
        ).collect()
    )
    assert a == b and len(a) > 0


def test_cm_inner_product_exact_when_collision_free(spark):
    """Huge width -> no collisions -> the estimate IS the join size."""
    a = spark.range(1000).select((F.col("id") % 50).alias("v"))
    b = spark.range(200).select((F.col("id") % 80).alias("v"))
    true = a.join(b, "v").count()
    sa = cm_states(a, [], "v", depth=3, width=1 << 18)
    sb = cm_states(b, [], "v", depth=3, width=1 << 18)
    est = cm_inner_product(sa, sb).collect()[0]["est_inner_product"]
    assert est == true


def test_cm_inner_product_never_underestimates(spark):
    """Tiny width -> collisions -> still >= the true join size."""
    a = spark.range(3000).select((F.col("id") % 97).alias("v"))
    b = spark.range(500).select((F.col("id") % 61).alias("v"))
    true = a.join(b, "v").count()
    sa = cm_states(a, [], "v", depth=4, width=16)
    sb = cm_states(b, [], "v", depth=4, width=16)
    est = cm_inner_product(sa, sb).collect()[0]["est_inner_product"]
    assert est >= true


def test_lsh_recall_vs_exact_jaccard_ground_truth(spark):
    """The banded-MinHash near-dup path measured against
    jaccard_join_exact as ground truth on a templated corpus: recall
    of true >=0.8 pairs must clear the analytic floor
    1-(1-t^r)^b ≈ 0.96 for t=0.8, r=8, b=16 (we assert a safe 0.85).
    This wires the probabilistic and exact operators together — the
    exact join is what makes the recall measurable without a
    quadratic oracle."""
    from pipeline_dataengineer_spark.operators.dedup import (
        jaccard_join_exact,
        minhash_lsh_near_duplicates,
    )

    base = [
        (i, f"alpha bravo charlie delta echo foxtrot golf hotel india "
            f"juliet kilo lima mike november oscar papa quebec romeo "
            f"sierra tango uniform victor whiskey xray yankee zulu w{i % 3}")
        for i in range(30)
    ]
    df = spark.createDataFrame(base, "doc_id long, text string")
    truth = {
        (r["id_a"], r["id_b"])
        for r in jaccard_join_exact(
            df, "doc_id", "text", threshold=0.8
        ).collect()
    }
    assert truth  # the w{i%3} suffix makes 3 near-dup clusters
    found = {
        (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
        for r in minhash_lsh_near_duplicates(
            df, "doc_id", "text", num_hashes=128, bands=16,
            jaccard_threshold=0.8,
        ).collect()
    }
    recall = len(truth & found) / len(truth)
    assert recall >= 0.85, (recall, len(truth), len(found))
