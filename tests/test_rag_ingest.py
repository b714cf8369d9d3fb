"""RAG ingestion pipeline (pipelines/rag_ingest.py): gate → dedup →
chunk → stable keys, plus the lexical and vector index hookups."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline_dataengineer_spark.pipelines.rag_ingest import (
    attach_embeddings,
    build_rag_chunks,
    chunk_terms,
)

PROSE = (
    "the quick brown fox jumps over a lazy dog near the riverbank. "
    "a second sentence keeps the chunker honest. "
    "the third sentence of this document adds more prose to split. "
) * 3


def _docs(spark):
    rows = [
        (1, PROSE),
        (2, PROSE),            # exact duplicate of 1 (min id survives)
        (3, "too short"),      # fails the quality gate
        (4, PROSE + "a distinct tail sentence ends the fourth document. "),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_build_rag_chunks_gate_dedup_stability(spark):
    chunks = build_rag_chunks(
        _docs(spark), max_chars=120,
        quality_kwargs={"min_words": 10, "stopwords": ("the", "a")},
    )
    rows = chunks.collect()
    doc_ids = {r["doc_id"] for r in rows}
    assert doc_ids == {1, 4}  # 2 deduped into 1, 3 gated out
    # chunk keys are unique and stable across a re-run on shuffled input
    keys = sorted(r["chunk_key"] for r in rows)
    assert len(keys) == len(set(keys))
    rerun = build_rag_chunks(
        _docs(spark).repartition(5), max_chars=120,
        quality_kwargs={"min_words": 10, "stopwords": ("the", "a")},
    ).collect()
    assert sorted(r["chunk_key"] for r in rerun) == keys
    # budget respected in spirit: every chunk ends on a sentence
    assert all(r["chunk_text"].rstrip().endswith(".") for r in rows)


def test_chunk_terms_feed_bm25(spark):
    from pipeline_dataengineer_spark.operators.text_features import bm25_rank

    chunks = build_rag_chunks(
        _docs(spark), max_chars=120,
        quality_kwargs={"min_words": 10, "stopwords": ("the", "a")},
    )
    # bm25 over chunks via the documented id/text col override
    scored = bm25_rank(
        chunks, ["fox", "riverbank"],
        id_col="chunk_key", text_col="chunk_text",
    )
    assert scored.count() > 0
    assert set(scored.columns) == {"chunk_key", "n_hits", "score"}
    # chunk_terms projection agrees with the bm25 tokenizer
    t = chunk_terms(chunks)
    assert t.filter(F.col("term") == "fox").count() > 0


def test_attach_embeddings_inner_join(spark):
    chunks = build_rag_chunks(
        _docs(spark), max_chars=120,
        quality_kwargs={"min_words": 10, "stopwords": ("the", "a")},
    )
    some_keys = [r["chunk_key"] for r in chunks.limit(2).collect()]
    emb = spark.createDataFrame(
        [(k, [0.1, 0.2]) for k in some_keys],
        "chunk_key long, embedding array<float>",
    )
    joined = attach_embeddings(chunks, emb)
    assert joined.count() == 2
    assert "embedding" in joined.columns


def test_build_rag_chunks_string_doc_ids(spark):
    # regression: the dedup step used to negate the id column, which
    # raises CAST_INVALID_INPUT under ANSI for string/uuid doc ids
    rows = [
        ("doc-b", PROSE),
        ("doc-a", PROSE),      # duplicate text: lexicographically-first id survives
        ("doc-c", "too short"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    chunks = build_rag_chunks(
        df, max_chars=120,
        quality_kwargs={"min_words": 10, "stopwords": ("the", "a")},
    )
    got = {r["doc_id"] for r in chunks.collect()}
    assert got == {"doc-a"}
