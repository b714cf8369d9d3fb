"""DSIR importance resampling (operators/corpus.py:
dsir_importance_weights / dsir_sample): target-like docs must score
and be selected above off-target docs; selection is deterministic."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline_dataengineer_spark.operators.corpus import (
    dsir_importance_weights,
    dsir_sample,
)

CODE_WORDS = ["def", "return", "import", "class", "self", "lambda"]
PROSE_WORDS = ["the", "garden", "breeze", "memory", "quiet", "evening"]


def _raw(spark, n_each=40):
    rows = []
    for i in range(n_each):
        rows.append(
            (i, " ".join(CODE_WORDS[(i + j) % 6] for j in range(25)))
        )
        rows.append(
            (1000 + i, " ".join(PROSE_WORDS[(i + j) % 6] for j in range(25)))
        )
    return spark.createDataFrame(rows, "doc_id long, text string")


def _target(spark, n=10):
    # target looks like code
    rows = [
        (i, " ".join(CODE_WORDS[(i * 2 + j) % 6] for j in range(25)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dsir_weights_separate_domains(spark):
    """Every code doc's log_w exceeds every prose doc's — the two
    vocabularies are disjoint, so the likelihood ratio separates
    them completely."""
    w = dsir_importance_weights(
        _raw(spark), _target(spark), n_buckets=512
    ).collect()
    code = [r["log_w"] for r in w if r["doc_id"] < 1000]
    prose = [r["log_w"] for r in w if r["doc_id"] >= 1000]
    assert len(code) == 40 and len(prose) == 40
    assert min(code) > max(prose)


def test_dsir_sample_prefers_target_like(spark):
    """At temperature→0 (hard top-k) all selected docs are code docs;
    at 1.0 a strong majority are."""
    hard = dsir_sample(
        _raw(spark), _target(spark), n_docs=20, n_buckets=512,
        temperature=1e-6,
    ).collect()
    assert all(r["doc_id"] < 1000 for r in hard)
    soft = dsir_sample(
        _raw(spark), _target(spark), n_docs=20, n_buckets=512,
        temperature=1.0,
    ).collect()
    assert sum(1 for r in soft if r["doc_id"] < 1000) >= 15
    assert len(soft) == 20


def test_dsir_sample_deterministic_across_layouts(spark):
    raw = _raw(spark)
    a = sorted(
        r["doc_id"]
        for r in dsir_sample(
            raw.repartition(11), _target(spark), n_docs=15, n_buckets=512
        ).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in dsir_sample(
            raw.coalesce(1), _target(spark), n_docs=15, n_buckets=512
        ).collect()
    )
    assert a == b


def test_fixture_tokens_bucket_apart(spark):
    """Pin of q_dsir_sample's oracle assumption (round 9): the two
    fixture tokens hash to DIFFERENT buckets mod 4096, so each
    domain's log-ratio is its own bucket's — the closed form the
    DuckDB oracle computes. A Spark release that changes xxhash64
    (it never has; the algorithm is pinned) fails here loudly rather
    than as a silent oracle mismatch."""
    r = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit("qza")), F.lit(4096)).alias("a"),
        F.pmod(F.xxhash64(F.lit("vrk")), F.lit(4096)).alias("b"),
    ).collect()[0]
    assert (r["a"], r["b"]) == (475, 2728)
