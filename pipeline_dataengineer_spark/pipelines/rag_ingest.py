"""RAG corpus ingestion: documents → retrieval-ready chunk index.

The retrieval-side composition (the pretraining pipeline's sibling —
that one feeds training, this one feeds search):

    quality gate        (gopher_rules — drop non-prose)
      → exact dedup     (fingerprint64 last-wins — identical docs
                         carry identical chunks, index once)
      → sentence chunks (sentence-aware budgeted windows — the unit
                         of retrieval)
      → chunk ids + fingerprints (stable across re-runs: chunk id =
                         xxhash64(doc_id, chunk_id) — incremental
                         re-index only touches changed docs)

plus the two index sides built FROM those chunks:

    lexical:  ``chunk_terms`` feeding bm25_rank / inverted_index
    vector:   caller-supplied embeddings join on chunk_key, then
              int8_quantize / ivf_build for the compressed ANN path

Everything up to the chunk table is ONE lazy Catalyst plan — the
quality gate's filter sits below the dedup shuffle, so pruning and
pushdown cross stage boundaries. No Python anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pipeline_dataengineer_spark.functions.textstats import (
    fingerprint64,
    gopher_rules,
)
from pipeline_dataengineer_spark.operators.corpus import sentence_chunks
from pipeline_dataengineer_spark.operators.dedup import dedup_keep_first


def build_rag_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_chars: int = 400,
    quality_kwargs: dict | None = None,
) -> DataFrame:
    """documents → (doc_id, chunk_id, chunk_key, chunk_text,
    n_sentences, n_chars): the retrieval-unit table.

    ``chunk_key`` is content-addressed-ish (xxhash64 of doc id +
    chunk ordinal) — stable across re-runs and layouts, so an
    embedding table keyed on it survives incremental re-ingestion of
    unchanged documents."""
    g = gopher_rules(F.col(text_col), **(quality_kwargs or {}))
    gated = df.filter(g["passes"])
    # exact dedup BEFORE chunking: identical docs chunk identically,
    # so deduping doc-level avoids fanning duplicates into the index.
    # Key on the normalized fingerprint, keep the smallest id
    # (deterministic canonical survivor).
    fp = gated.withColumn("__fp", fingerprint64(F.col(text_col)))
    # keep-first on the id itself: works for numeric AND string/uuid
    # doc ids (the old -F.col(id) spelling raised under ANSI for
    # non-numeric ids)
    unique_docs = dedup_keep_first(fp, ["__fp"], F.col(id_col)).drop("__fp")
    chunks = sentence_chunks(unique_docs, id_col, text_col, max_chars)
    return chunks.withColumn(
        "chunk_key",
        F.xxhash64(F.col(id_col).cast("string"), F.col("chunk_id")),
    )


def chunk_terms(chunks: DataFrame) -> DataFrame:
    """(chunk_key, term) rows from the chunk table — the input shape
    ``operators/text_features.py``'s BM25 / inverted-index builders
    expect (pass ``id_col="chunk_key"``, ``text_col="chunk_text"``).
    Here only for discoverability; it is a plain projection."""
    return chunks.select(
        "chunk_key",
        F.explode(
            F.split(F.lower(F.col("chunk_text")), " ")
        ).alias("term"),
    ).filter(F.col("term") != "")


def attach_embeddings(
    chunks: DataFrame,
    embeddings: DataFrame,
    key_col: str = "chunk_key",
    vec_col: str = "embedding",
) -> DataFrame:
    """Join caller-computed chunk embeddings (model inference happens
    outside the engine) back onto the chunk table — inner join on the
    stable chunk key; chunks without vectors drop out of the vector
    index but stay in the lexical one."""
    return chunks.join(
        embeddings.select(key_col, vec_col), key_col, "inner"
    )
