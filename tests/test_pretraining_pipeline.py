"""End-to-end pretraining-corpus pipeline invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline_dataengineer_spark.pipelines.pretraining_corpus import (
    build_pretraining_corpus,
)


def _docs(spark, n_part=4):
    rows = []
    for i in range(40):
        text = f"document number {i} with some words " + " ".join(
            f"tok{j % 7}" for j in range(20)
        )
        rows.append((i, text, "en" if i % 2 == 0 else "de", f"src{i % 3}"))
    # an exact duplicate pair and a near-duplicate pair
    rows.append((100, rows[0][1], "en", "src0"))
    rows.append((101, rows[1][1] + " tail", "de", "src1"))
    return spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source"]
    ).repartition(n_part)


def test_pipeline_dedups_and_splits_deterministically(spark):
    out1 = build_pretraining_corpus(
        _docs(spark, 4), min_quality=0.0, context_len=64, pack_buckets=4
    )
    rows1 = {r["doc_id"]: r for r in out1.collect()}
    # exact duplicate of doc 0 collapsed to the min-id canonical
    assert 0 in rows1 and 100 not in rows1
    # every row has a split and a window assignment
    assert all(r["split"] in ("train", "val", "test") for r in rows1.values())
    assert all(r["seq_offset"] >= 0 for r in rows1.values())
    # determinism under a different partition layout
    out2 = build_pretraining_corpus(
        _docs(spark, 11), min_quality=0.0, context_len=64, pack_buckets=4
    )
    rows2 = {r["doc_id"]: r for r in out2.collect()}
    assert set(rows1) == set(rows2)
    for k in rows1:
        assert (rows1[k]["split"], rows1[k]["seq_id"], rows1[k]["seq_offset"]) == (
            rows2[k]["split"], rows2[k]["seq_id"], rows2[k]["seq_offset"]
        )


def test_pipeline_quarantines_contaminated_docs(spark):
    docs = _docs(spark)
    bench = spark.createDataFrame(
        # verbatim 8-token run from doc 3's text
        [(999, docs.filter(F.col("doc_id") == 3).collect()[0]["text"])],
        ["doc_id", "text"],
    )
    out = build_pretraining_corpus(
        docs, benchmark=bench, min_quality=0.0, context_len=64, pack_buckets=4
    )
    assert out.filter(F.col("doc_id") == 3).count() == 0


def test_incremental_corpus_append_delta_semantics(spark):
    """New-batch delta: near-dups of the existing corpus die, the
    existing side never rewrites, within-batch dups keep min id,
    re-delivered ids drop (idempotence), fresh docs survive."""
    from pipeline_dataengineer_spark.pipelines.pretraining_corpus import (
        incremental_corpus_append,
    )

    base = ("the quick brown fox jumps over the lazy dog and then "
            "wanders far across the wide green meadow looking for food")
    existing = spark.createDataFrame(
        [(1, base, "en"), (2, "an entirely different document about "
          "shipping routes and customs declarations in winter", "en")],
        ["doc_id", "text", "lang"],
    )
    batch = spark.createDataFrame(
        [
            (10, base + " tail", "en"),          # near-dup of existing 1 → dies
            (11, "completely novel content on glacier hydrology and "
                 "seasonal meltwater variation measured over decades", "en"),
            (12, "completely novel content on glacier hydrology and "
                 "seasonal meltwater variation measured over decade", "en"),
            # 12 ~ 11 within batch → 12 dies (min id wins)
            (2, "an entirely different document about shipping routes "
                "and customs declarations in winter", "en"),  # re-delivered id
        ],
        ["doc_id", "text", "lang"],
    )
    out = incremental_corpus_append(
        existing, batch, jaccard_threshold=0.5
    )
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [11]
