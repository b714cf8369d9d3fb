"""End-to-end vector-index build pipeline: the RAG/embedding-search
composition the individual operators imply, wired as ONE dataflow —

    documents → exact dedup → chunk → embed → IVF-PQ index
             → versioned snapshot publish

Each stage is an existing engine operator; the pipeline adds the
contract between them (ids, schemas, the snapshot layout) and makes
the whole thing restartable: the index lives in four snapshot
tables (centroids / codes / codebooks / chunk-map) under one root,
each published atomically by the engine's ACID snapshot layer, and
a build COMMITS via one atomic index-level manifest rename pinning
the four table versions as a consistent set — a crashed build's
uncommitted table versions are never referenced, searches never mix
builds, and time travel is per committed build.

Embedding is the ONE stage a real deployment swaps out: here it is
the model-free feature-hashing vectorizer (integer-exact, engine
portable — see text_features.hashed_doc_vectors), which keeps the
entire pipeline executable and hash-checkable inside the container;
a production build replaces `embed_fn` with its inference call and
NOTHING else changes.

Scale shape: dedup is a hash groupBy; chunking is a narrow fan-out
riding the scan; embedding is one combinable aggregate per chunk;
the IVF-PQ build shuffles once on the cell id; the publish writes
each table once. No stage collects the corpus — driver traffic is
centroids + codebooks (model-sized constants).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline_dataengineer_spark.operators.corpus import chunk_documents
from pipeline_dataengineer_spark.operators.dedup import dedup_keep_first
from pipeline_dataengineer_spark.operators.pq import ivfpq_build, ivfpq_search
from pipeline_dataengineer_spark.operators.snapshots import (
    read_snapshot,
    write_snapshot,
)
from pipeline_dataengineer_spark.operators.text_features import (
    hashed_doc_vectors,
)


def _default_embed(chunks: DataFrame, dim: int) -> DataFrame:
    """Model-free embedding: signed feature hashing over the chunk
    text, L2-normalized. Returns (chunk_id, embedding)."""
    vecs = hashed_doc_vectors(
        chunks, id_col="chunk_id", text_col="chunk_text", dim=dim
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform("vector", lambda v: v * v),
            F.lit(0.0),
            lambda a, v: a + v,
        )
    )
    return vecs.select(
        "chunk_id",
        F.when(norm == 0.0, F.col("vector"))
        .otherwise(F.transform("vector", lambda v: v / norm))
        .alias("embedding"),
    )


def build_vector_index(
    docs: DataFrame,
    index_root: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
    dim: int = 64,
    num_centroids: int = 16,
    m: int = 8,
    codebook_size: int = 16,
    embed_fn=None,
) -> dict:
    """Build and atomically publish the index. Returns a summary dict
    (chunk/vector counts + published versions). Re-running replaces
    the index as a NEW snapshot version per table — the previous
    build stays readable via time travel until VACUUM."""
    deduped = dedup_keep_first(
        docs.withColumn("__fp", F.xxhash64(text_col)),
        "__fp",
        F.col(id_col),
    ).drop("__fp")
    chunks = chunk_documents(
        deduped, id_col=id_col, text_col=text_col,
        chunk_tokens=chunk_tokens, overlap=overlap,
    ).select(
        F.concat_ws("#", F.col(id_col), F.col("chunk_idx")).alias("chunk_id"),
        F.col(id_col).alias("parent_id"),
        "chunk_idx",
        "chunk_text",
    )
    embed = embed_fn or (lambda c: _default_embed(c, dim))
    # cache the shared lineage: the four snapshot writes + the count
    # below would otherwise each re-execute dedup -> chunk -> EMBED
    # (~5x inference cost when embed_fn is a real model call)
    chunks = chunks.persist()
    vectors = embed(chunks).persist()
    n_vectors = vectors.count()
    centroids, encoded, books = ivfpq_build(
        vectors,
        vec_col="embedding",
        id_col="chunk_id",
        num_centroids=num_centroids,
        m=m,
        codebook_size=codebook_size,
    )
    encoded = encoded.persist()
    spark = docs.sparkSession
    # codebooks: numpy (m, codebook_size, subdim) -> rows
    m_, kc, subdim = books.shape
    book_rows = [
        (int(j), int(c), [float(x) for x in books[j, c]])
        for j in range(m_)
        for c in range(kc)
    ]
    books_df = spark.createDataFrame(
        book_rows, "subspace int, code int, vec array<double>"
    )
    chunk_map = chunks.select("chunk_id", "parent_id", "chunk_idx")
    try:
        v_cent = write_snapshot(centroids, f"{index_root}/centroids")
        v_codes = write_snapshot(encoded, f"{index_root}/codes")
        v_books = write_snapshot(books_df, f"{index_root}/codebooks")
        v_map = write_snapshot(chunk_map, f"{index_root}/chunks")
        versions = {
            "centroids": v_cent["version"],
            "codes": v_codes["version"],
            "codebooks": v_books["version"],
            "chunks": v_map["version"],
        }
        # the INDEX-LEVEL commit: the four per-table publishes above
        # are each atomic but not jointly — a crash between them (or
        # a concurrent reader) must never surface a torn index, so a
        # build only becomes visible when this one-file manifest
        # rename lands, pinning a CONSISTENT cross-table version set.
        _commit_index_manifest(index_root, versions)
    finally:
        chunks.unpersist()
        vectors.unpersist()
        encoded.unpersist()
    return {
        "n_vectors": n_vectors,
        "n_centroids": num_centroids,
        "m": m_,
        "codebook_size": kc,
        "dim": dim,
        "versions": versions,
    }


def _commit_index_manifest(index_root: str, versions: dict) -> None:
    """Append this build's per-table version set to the index-level
    manifest with an atomic rename — the cross-table commit point."""
    import json
    import os

    path = os.path.join(index_root, "INDEX_MANIFEST.json")
    builds = []
    if os.path.exists(path):
        with open(path) as fh:
            builds = json.load(fh).get("builds", [])
    builds.append(versions)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump({"builds": builds}, fh)
    os.replace(tmp, path)


def _load_index_manifest(index_root: str, build: int | None) -> dict:
    import json
    import os

    path = os.path.join(index_root, "INDEX_MANIFEST.json")
    with open(path) as fh:
        builds = json.load(fh)["builds"]
    return builds[-1 if build is None else build]


def search_vector_index(
    spark: SparkSession,
    index_root: str,
    query: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    version: int | None = None,
) -> DataFrame:
    """Search a published index. ``version`` is a BUILD number into
    the index-level manifest (default: latest committed build); the
    manifest pins a CONSISTENT per-table version set, so a search
    never mixes one build's centroids with another's codes — even
    mid-rebuild or after a crashed build (uncommitted table versions
    are simply never referenced). ``query``: (query_id, embedding).
    Returns (query_id, chunk_id, parent_id, chunk_idx, dist2, rank)."""
    pins = _load_index_manifest(index_root, version)
    centroids = read_snapshot(
        spark, f"{index_root}/centroids", version=pins["centroids"]
    )
    encoded = read_snapshot(spark, f"{index_root}/codes", version=pins["codes"])
    books_df = read_snapshot(
        spark, f"{index_root}/codebooks", version=pins["codebooks"]
    )
    rows = books_df.collect()
    m_ = 1 + max(r["subspace"] for r in rows)
    kc = 1 + max(r["code"] for r in rows)
    subdim = len(rows[0]["vec"])
    books = np.zeros((m_, kc, subdim))
    for r in rows:
        books[r["subspace"], r["code"]] = r["vec"]
    hits = ivfpq_search(
        centroids,
        encoded,
        books,
        query,
        id_col="chunk_id",
        k=k,
        nprobe=nprobe,
    )
    chunk_map = read_snapshot(
        spark, f"{index_root}/chunks", version=pins["chunks"]
    )
    return hits.join(chunk_map, "chunk_id").select(
        "query_id", "chunk_id", "parent_id", "chunk_idx", "dist2", "rank"
    )
