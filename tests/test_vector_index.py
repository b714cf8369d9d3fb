"""End-to-end vector-index pipeline (pipelines/vector_index.py):
build → publish → search, self-retrieval quality, dedup stage, and
time travel across rebuilds."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline_dataengineer_spark.pipelines.vector_index import (
    _default_embed,
    build_vector_index,
    search_vector_index,
)

def _docs(spark, n=40, salt=""):
    # 100-token vocabulary, each doc a 30-token run offset by i*7:
    # neighboring docs overlap, distant docs diverge, and no two
    # docs' chunks have the same token SET (a small vocab makes every
    # 16-token bag ≈ the whole vocab and all embeddings collide —
    # the first version of this fixture did exactly that). The
    # leading u{i} token pins chunk 0 unique per doc.
    rows = [
        (
            i,
            f"u{i} "
            + " ".join(f"w{(i * 7 + j) % 100}" for j in range(30))
            + f" topic{i % 5}{salt}",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_build_and_self_retrieval(spark, tmp_path):
    root = str(tmp_path / "idx")
    docs = _docs(spark)
    # codebook_size=256 >= the corpus's distinct residual subvectors
    # -> verbatim (lossless) codebooks, so ADC distances are exact and
    # self-retrieval has a unique argmin; a lossy codebook can merge
    # two 15/16-token-overlap chunks into one code and tie them.
    info = build_vector_index(
        docs, root, chunk_tokens=16, overlap=4, dim=32,
        num_centroids=4, m=4, codebook_size=256,
    )
    assert info["n_vectors"] > 0
    # query with a chunk's own embedding -> that chunk must be the
    # top hit when every cell is probed (ADC of a vector against its
    # own code is the minimum achievable distance in its cell)
    from pipeline_dataengineer_spark.operators.corpus import chunk_documents
    from pipeline_dataengineer_spark.operators.dedup import dedup_keep_first

    deduped = dedup_keep_first(
        docs.withColumn("__fp", F.xxhash64("text")), "__fp", F.col("doc_id")
    ).drop("__fp")
    # probe only chunk_idx 0 — the u{i} leading token makes those
    # texts unique per doc, so self-retrieval has a unique argmin
    chunks = (
        chunk_documents(deduped, chunk_tokens=16, overlap=4)
        .filter(F.col("chunk_idx") == 0)
        .select(
            F.concat_ws("#", "doc_id", "chunk_idx").alias("chunk_id"),
            "chunk_text",
        )
    )
    probe = _default_embed(chunks, 32).limit(3).select(
        F.col("chunk_id").alias("query_id"), "embedding"
    )
    hits = search_vector_index(spark, root, probe, k=3, nprobe=4).collect()
    by_q = {}
    for r in hits:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == 3
    # lossless codebooks -> ADC distance is exact: the rank-1 hit sits
    # at distance 0 and the probe's own chunk is among the
    # zero-distance hits (32-dim hashed embeddings CAN collide across
    # different token bags, so assert membership, not uniqueness)
    for qid, rows in by_q.items():
        top = min(rows, key=lambda r: r["rank"])
        assert top["dist2"] == 0.0, (qid, top)
        zero_ids = {r["chunk_id"] for r in rows if r["dist2"] == 0.0}
        assert qid in zero_ids, (qid, rows)


def test_dedup_stage_collapses_exact_copies(spark, tmp_path):
    root = str(tmp_path / "idx2")
    docs = _docs(spark, n=10)
    doubled = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + 1000)
    )
    info_single = build_vector_index(
        docs, str(tmp_path / "idx_s"), chunk_tokens=16, overlap=4,
        dim=32, num_centroids=2, m=4, codebook_size=16,
    )
    info_double = build_vector_index(
        doubled, root, chunk_tokens=16, overlap=4, dim=32,
        num_centroids=2, m=4, codebook_size=16,
    )
    assert info_double["n_vectors"] == info_single["n_vectors"]


def test_rebuild_bumps_version_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "idx3")
    v1 = build_vector_index(
        _docs(spark, n=12), root, chunk_tokens=16, overlap=4, dim=32,
        num_centroids=2, m=4, codebook_size=16,
    )
    v2 = build_vector_index(
        _docs(spark, n=24, salt=" extra"), root, chunk_tokens=16,
        overlap=4, dim=32, num_centroids=2, m=4, codebook_size=16,
    )
    assert v2["versions"]["codes"] == v1["versions"]["codes"] + 1
    from pipeline_dataengineer_spark.operators.snapshots import read_snapshot

    old = read_snapshot(
        spark, f"{root}/codes", version=v1["versions"]["codes"]
    ).count()
    new = read_snapshot(spark, f"{root}/codes").count()
    assert old == v1["n_vectors"]
    assert new == v2["n_vectors"]
    assert new > old


def test_search_never_sees_torn_build(spark, tmp_path):
    """A table bumped WITHOUT an index-manifest commit (a crashed
    build's debris) is invisible: searches keep reading the last
    committed consistent set."""
    from pipeline_dataengineer_spark.operators.snapshots import (
        read_snapshot,
        write_snapshot,
    )
    from pipeline_dataengineer_spark.pipelines.vector_index import (
        _load_index_manifest,
    )

    root = str(tmp_path / "idx4")
    docs = _docs(spark, n=12)
    build_vector_index(
        docs, root, chunk_tokens=16, overlap=4, dim=32,
        num_centroids=2, m=4, codebook_size=256,
    )
    committed = _load_index_manifest(root, None)
    # simulate a crash mid-second-build: centroids table advances,
    # nothing else does, no manifest commit
    write_snapshot(
        read_snapshot(spark, f"{root}/centroids").limit(1),
        f"{root}/centroids",
    )
    assert _load_index_manifest(root, None) == committed
    from pipeline_dataengineer_spark.operators.corpus import chunk_documents

    probe = _default_embed(
        chunk_documents(docs, chunk_tokens=16, overlap=4)
        .filter(F.col("chunk_idx") == 0)
        .select(
            F.concat_ws("#", "doc_id", "chunk_idx").alias("chunk_id"),
            "chunk_text",
        ),
        32,
    ).limit(2).select(F.col("chunk_id").alias("query_id"), "embedding")
    hits = search_vector_index(spark, root, probe, k=2, nprobe=2).collect()
    # both queries still answered from the committed (2-centroid) build
    assert {r["query_id"] for r in hits} and all(
        r["dist2"] == 0.0 for r in hits if r["rank"] == 1
    )
