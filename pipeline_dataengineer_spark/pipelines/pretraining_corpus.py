"""End-to-end pretraining-corpus build: every north-star stage wired
into one lazy plan.

    clean (lang/quality/token filters + exact dedup)
      → near-dup removal   (MinHash-LSH pairs → connected components
                            → one canonical survivor per cluster)
      → decontamination    (quarantine docs sharing n-gram runs with
                            a benchmark set, via anti-join)
      → per-source caps    (domain budget)
      → train/val/test split (stable hash buckets)
      → sequence packing   (concat-and-chop context windows)

Each stage is an independently oracle-checked operator (see
COVERAGE.md); this module is the composition a user actually runs.
Laziness matters: the narrow filters (clean) sit below the dedup
shuffles in one Catalyst plan, so column pruning and predicate
pushdown cross stage boundaries — the win of building ON Spark
instead of gluing engines, and the reason the composition is a
DataFrame→DataFrame function, not a script materializing each step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipeline_dataengineer_spark.operators.corpus import cap_per_key, clean_corpus
from pipeline_dataengineer_spark.operators.dedup import (
    cross_corpus_contamination,
    minhash_lsh_near_duplicates,
)
from pipeline_dataengineer_spark.operators.graph import dedup_keep_canonical
from pipeline_dataengineer_spark.operators.packing import pack_sequences
from pipeline_dataengineer_spark.operators.sampling import hash_split


def build_pretraining_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    langs: list[str] | None = None,
    min_quality: float = 0.3,
    jaccard_threshold: float = 0.7,
    max_per_source: int | None = None,
    split_weights: dict[str, float] | None = None,
    context_len: int = 2048,
    pack_buckets: int = 1024,
) -> DataFrame:
    """documents(doc_id, text, lang, source) → packed corpus rows
    (doc_id, lang, source, n_tokens, quality, split, bucket, seq_id,
    seq_offset). Deterministic end to end: every choice (canonical
    duplicate, split membership, window id) derives from doc_id
    hashes, never from partition layout."""
    cleaned = clean_corpus(
        docs, langs=langs, min_quality=min_quality, min_tokens=5
    )
    pairs = minhash_lsh_near_duplicates(
        cleaned, "doc_id", "text", jaccard_threshold=jaccard_threshold
    )
    surviving = dedup_keep_canonical(cleaned, pairs, "doc_id")
    # dedup_keep_canonical runs connected_components EAGERLY (the
    # label tables are localCheckpoint-ed, truncating lineage), so the
    # persisted pair table minhash returned is no longer referenced —
    # release it now rather than leaking one cache per pipeline run.
    pairs.unpersist()
    if benchmark is not None:
        contaminated = cross_corpus_contamination(
            surviving, benchmark, "doc_id", "text"
        ).select(F.col("corpus_id").alias("doc_id")).distinct()
        surviving = surviving.join(contaminated, "doc_id", "left_anti")
    if max_per_source is not None:
        surviving = cap_per_key(surviving, ["source"], max_per_source, "doc_id")
    split = hash_split(
        surviving, "doc_id", split_weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    )
    packed = pack_sequences(
        split, "doc_id", "n_tokens", context_len, buckets=pack_buckets
    )
    return split.select(
        "doc_id", "lang", "source", "n_tokens", "quality", "split"
    ).join(packed, "doc_id")


def incremental_corpus_append(
    existing: DataFrame,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    langs: list[str] | None = None,
    min_quality: float = 0.3,
    jaccard_threshold: float = 0.7,
    signature_store: str | None = None,
) -> DataFrame:
    """The reference's incremental-ingest loop lifted to corpus scale:
    given the EXISTING corpus and a new crawl batch, return only the
    batch rows worth appending —

    1. clean the batch (language / quality / token gates + exact
       dedup within the batch; `operators/corpus.py:clean_corpus`);
    2. drop batch docs that are near-duplicates OF THE EXISTING
       corpus or of each other: MinHash-LSH over the tagged union,
       keeping the union single-shuffle design — only pairs touching
       a batch doc matter, and the existing side always wins;
    3. idempotent-append semantics on the id (LEFT ANTI vs existing
       ids — re-delivered batches, the reference's A17 bug, drop out).

    The existing corpus is never rewritten — the output is the delta,
    ready for an append write (or `apply_cdc` if ids can mutate).

    Scale notes: pass ``signature_store`` (a parquet directory) and
    the signature/banding UDF cost becomes O(batch) instead of
    O(existing + batch) per call: signatures are content-addressed,
    so the store serves the existing side, the UDF runs only for ids
    the store lacks, and the surviving delta's signatures append to
    the store afterwards. The store is a derived cache — ids no
    longer in the corpus are filtered out on read (semi-join against
    existing), and a missing/partial store self-heals by computing
    whatever is absent. Without a store the cost is
    |existing| + |batch| per call (fine at test scale)."""
    import os
    from pipeline_dataengineer_spark.operators.corpus import clean_corpus
    from pipeline_dataengineer_spark.operators.dedup import (
        minhash_lsh_near_duplicates,
    )

    cleaned = clean_corpus(
        batch,
        text_col=text_col,
        id_col=id_col,
        langs=langs,
        min_quality=min_quality,
    ).select(batch.columns)
    tagged = existing.select(id_col, text_col).withColumn(
        "__is_new", F.lit(False)
    ).unionByName(
        cleaned.select(id_col, text_col).withColumn("__is_new", F.lit(True))
    )
    spark = batch.sparkSession
    store_df = None
    if signature_store is not None and os.path.isdir(signature_store):
        # only ids still in the corpus may come from the store (docs
        # deleted since the store was written must not resurrect), and
        # only existing-side ids (a re-delivered batch id must be
        # re-signed from the BATCH text, not trusted from the store)
        store_df = (
            spark.read.parquet(signature_store)
            .join(
                existing.select(F.col(id_col).alias("__id")),
                "__id",
                "left_semi",
            )
        )
    pairs = minhash_lsh_near_duplicates(
        tagged, id_col, text_col, jaccard_threshold=jaccard_threshold,
        precomputed_signatures=store_df,
    )
    new_ids = cleaned.select(F.col(id_col))
    # a batch doc dies if it pairs with ANY lower-precedence partner:
    # an existing doc (either side), or a smaller-id batch doc.
    is_new = new_ids.withColumnRenamed(id_col, "__nid")
    a_new = pairs.join(is_new, pairs.id_a == F.col("__nid"), "left_semi")
    b_new = pairs.join(is_new, pairs.id_b == F.col("__nid"), "left_semi")
    # pairs with id_b new: id_a < id_b (operator contract) → id_b loses
    drop_b = b_new.select(F.col("id_b").alias(id_col))
    # pairs with id_a new and id_b existing: the existing doc wins
    not_new = pairs.join(is_new, pairs.id_b == F.col("__nid"), "left_anti")
    drop_a = not_new.join(is_new, not_new.id_a == F.col("__nid"), "left_semi").select(
        F.col("id_a").alias(id_col)
    )
    # minhash_lsh_near_duplicates returns a PERSISTED pair table whose
    # cache the caller owns. This is the nightly-ingest loop, so a
    # leaked cache per batch compounds into exactly the session-skew
    # problem the eager-cache redesign fixed. Materialize the (small,
    # batch-bounded) drop-id set, release the pair cache, then
    # materialize the delta and release the drop-id cache — the
    # operator exits with only the returned delta cached, and the
    # CALLER releases that with `.unpersist()` when done (same
    # contract as minhash_lsh_near_duplicates itself).
    drop_ids = drop_a.unionByName(drop_b).distinct().persist()
    drop_ids.count()
    pairs.unpersist()
    survivors = cleaned.join(drop_ids, id_col, "left_anti")
    delta = survivors.join(
        existing.select(id_col), id_col, "left_anti"
    ).persist()
    delta.count()
    drop_ids.unpersist()
    if signature_store is not None:
        from pipeline_dataengineer_spark.operators.dedup import (
            minhash_signatures,
        )

        if store_df is None:
            # bootstrap: one full pass seeds the store with the whole
            # new corpus (existing + delta); every later call is
            # O(batch)
            seed = existing.select(id_col, text_col).unionByName(
                delta.select(id_col, text_col)
            )
            minhash_signatures(seed, id_col, text_col).write.mode(
                "overwrite"
            ).parquet(signature_store)
        else:
            minhash_signatures(delta, id_col, text_col).write.mode(
                "append"
            ).parquet(signature_store)
    return delta


def streaming_corpus_drain(
    spark,
    topic_dir: str,
    corpus_dir: str,
    checkpoint_dir: str,
    signature_store: str | None = None,
    langs: list[str] | None = None,
    min_quality: float = 0.3,
    jaccard_threshold: float = 0.7,
    source_format: str = "kafka_log",
) -> None:
    """The reference's daily Kafka drain (``spark_streaming.py``)
    composed with the corpus-scale ingest: stream of JSON doc batches
    → parse (imposed schema) → ``incremental_corpus_append`` (clean +
    MinHash-LSH near-dup vs the CURRENT corpus, served by the
    signature store) → append the delta to the corpus directory.

    Exactly-once per doc id regardless of redelivery: the id-level
    anti-join inside ``incremental_corpus_append`` re-reads the
    corpus every micro-batch (the reference's read-once A17 bug,
    fixed), so draining the same offsets twice — or replaying from a
    fresh checkpoint — appends nothing. ``availableNow`` + a real
    checkpoint give the daily-drain topology; production swaps
    ``source_format="kafka"`` with broker options, nothing else
    changes."""
    from pipeline_dataengineer_spark.streaming.sinks import (
        run_available_now,
    )

    doc_schema = "doc_id bigint, text string, lang string"
    stream = (
        spark.readStream.format(source_format)
        .option("path", topic_dir)
        .load()
    )
    docs = stream.select(
        F.from_json(F.col("value").cast("string"), doc_schema).alias(
            "d"
        )
    ).select("d.*")

    def _existing(sess) -> DataFrame:
        try:
            return sess.read.parquet(corpus_dir).select(
                "doc_id", "text", "lang"
            )
        except Exception:
            return sess.createDataFrame([], doc_schema)

    def drain_batch(batch_df: DataFrame, epoch_id: int) -> None:
        sess = batch_df.sparkSession
        existing = _existing(sess)
        delta = incremental_corpus_append(
            existing,
            batch_df,
            langs=langs,
            min_quality=min_quality,
            jaccard_threshold=jaccard_threshold,
            signature_store=signature_store,
        )
        if delta.limit(1).count() > 0:
            delta.write.mode("append").parquet(corpus_dir)
        delta.unpersist()

    q = run_available_now(docs, drain_batch, checkpoint_dir)
    q.awaitTermination()
