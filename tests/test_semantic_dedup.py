"""SemDeDup composition (operators/dedup.py:semantic_dedup): known
duplicate groups in well-separated clusters -> exact kept set."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        # cluster around +x: ids 1,2 duplicates (parallel), 3 distinct
        (1, [1.0, 0.0, 0.0]),
        (2, [2.0, 0.0, 0.0]),
        (3, [0.9, 0.5, 0.0]),
        # cluster around +y: ids 10,11,12 all mutually parallel
        (10, [0.0, 1.0, 0.0]),
        (11, [0.0, 3.0, 0.0]),
        (12, [0.0, 0.5, 0.0]),
        # isolated direction
        (20, [0.0, 0.0, 1.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_keeps_min_id_per_dup_group(vecs):
    from pipeline_dataengineer_spark.operators.dedup import semantic_dedup

    kept = semantic_dedup(vecs, threshold=0.999, k=3)
    assert {r["vec_id"] for r in kept.collect()} == {1, 3, 10, 20}


def test_threshold_one_keeps_nonparallel(vecs):
    from pipeline_dataengineer_spark.operators.dedup import semantic_dedup

    # cos(1,3) < 0.999 => 3 survives; raise threshold so only exact
    # parallels drop, regardless of cluster layout
    kept = semantic_dedup(vecs, threshold=0.9999999, k=2)
    assert {r["vec_id"] for r in kept.collect()} == {1, 3, 10, 20}


def test_deterministic_under_repartition(vecs):
    from pipeline_dataengineer_spark.operators.dedup import semantic_dedup

    a = {r["vec_id"] for r in semantic_dedup(vecs, threshold=0.999, k=3).collect()}
    b = {
        r["vec_id"]
        for r in semantic_dedup(
            vecs.repartition(7), threshold=0.999, k=3
        ).collect()
    }
    assert a == b


def test_output_keeps_all_columns(vecs):
    from pipeline_dataengineer_spark.operators.dedup import semantic_dedup

    kept = semantic_dedup(vecs, threshold=0.999, k=3)
    assert set(kept.columns) == {"vec_id", "embedding", "cluster"}


def test_containment_pairs_detects_fragment(spark):
    from pipeline_dataengineer_spark.operators.dedup import containment_pairs

    full = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, full),
        (2, full[:30]),                    # fragment of 1
        (3, "completely different content with nothing shared at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(
            df, "doc_id", "text", min_containment=0.9
        ).collect()
    }
    assert (2, 1) in out and out[(2, 1)] >= 0.9   # fragment inside full
    assert (1, 2) not in out                       # asymmetric: full not in fragment
    assert not any(3 in pair for pair in out)


def test_containment_pairs_shingle_cap_audited(spark):
    from pipeline_dataengineer_spark.operators.dedup import containment_pairs

    # a shingle present in EVERY doc gets dropped by the cap
    rows = [(i, f"shared-prefix-{i} unique tail {i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = containment_pairs(
        df, "doc_id", "text", min_containment=0.5, max_shingle_df=5
    )
    audit_after = out.collect()  # eager count pass ran inside
    assert out.containment_audit["dropped_shingles"] > 0


def test_drop_contained_fragments_keeps_container(spark):
    from pipeline_dataengineer_spark.operators.dedup import (
        drop_contained_fragments,
    )

    full = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(1, full), (2, full[:30]), (3, "unrelated fresh text here ok")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {
        r["doc_id"]
        for r in drop_contained_fragments(df, "doc_id", "text").collect()
    }
    assert kept == {1, 3}  # fragment 2 dropped, container + unrelated kept


def test_lof_planted_outlier(spark):
    """A tight 2D cluster plus one far point: the far point's LOF is
    clearly > 1.5; cluster members sit near 1."""
    from pipeline_dataengineer_spark.operators.similarity import (
        local_outlier_factor,
    )

    rows = [(i, [0.1 * i, 0.0]) for i in range(10)] + [(99, [50.0, 50.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["id"]: r for r in local_outlier_factor(df, k=3).collect()}
    assert out[99]["lof"] > 1.5
    inlier_lofs = [out[i]["lof"] for i in range(1, 9)]
    assert all(l < 1.3 for l in inlier_lofs), inlier_lofs


def test_lof_bucketed_restricts_candidates(spark):
    """With a bucket column, neighbors come only from the same cell:
    two separated clusters each behave as an independent LOF problem
    and every point is an inlier within its own cell."""
    from pipeline_dataengineer_spark.operators.similarity import (
        local_outlier_factor,
    )

    rows = [(i, [0.1 * i, 0.0], 0) for i in range(8)] + [
        (100 + i, [1000.0 + 0.1 * i, 0.0], 1) for i in range(8)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, cell int"
    )
    out = local_outlier_factor(df, k=3, bucket_col="cell").collect()
    assert len(out) == 16
    assert all(r["lof"] is not None and r["lof"] < 1.4 for r in out)
