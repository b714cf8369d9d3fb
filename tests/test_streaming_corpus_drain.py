"""End-to-end streaming drain of the pretraining-corpus ingest
(round-6 VERDICT item 6): kafka_log doc batches → from_json parse →
incremental_corpus_append (clean + MinHash-LSH near-dup vs the
CURRENT corpus, signatures served by the store) → idempotent append.
Proves the reference's daily-drain topology (spark_streaming.py's
foreachBatch trigger-once loop) at corpus semantics: redelivered
offsets and replayed checkpoints append nothing, near-dups of the
live corpus die, and the signature store advances with each delta.
"""

from __future__ import annotations

from pipeline_dataengineer_spark.pipelines.pretraining_corpus import (
    streaming_corpus_drain,
)
from pipeline_dataengineer_spark.sinks.writers import kafka_json_payload
from pipeline_dataengineer_spark.sources.kafka_sim import (
    produce,
    register_kafka_log_source,
)

BASE = (
    "the quick brown fox jumps over the lazy dog and then wanders "
    "far across the wide green meadow looking for food"
)
NOVEL_1 = (
    "completely novel content on glacier hydrology and seasonal "
    "meltwater variation measured over decades"
)
NOVEL_2 = (
    "an unrelated treatise concerning harbor logistics and the "
    "seasonal scheduling of container vessels at northern ports"
)
NOVEL_3 = (
    "field notes describing alpine soil chemistry and the slow "
    "accumulation of organic matter under persistent snow cover"
)


def _produce_docs(spark, topic, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    return produce(topic, kafka_json_payload(df, key_col="doc_id"))


def _corpus_ids(spark, corpus_dir):
    return sorted(
        r["doc_id"] for r in spark.read.parquet(corpus_dir).collect()
    )


def _store_ids(spark, store_dir):
    return sorted(
        r["__id"]
        for r in spark.read.parquet(store_dir).select("__id").distinct().collect()
    )


def test_streaming_corpus_drain_end_to_end(spark, tmp_path):
    register_kafka_log_source(spark)
    topic = str(tmp_path / "topic")
    corpus = str(tmp_path / "corpus")
    store = str(tmp_path / "sigstore")

    # seed corpus: two existing docs
    spark.createDataFrame(
        [(1, BASE, "en"), (2, NOVEL_2, "en")],
        "doc_id long, text string, lang string",
    ).write.parquet(corpus)

    def drain(ckpt):
        streaming_corpus_drain(
            spark,
            topic,
            corpus,
            str(tmp_path / ckpt),
            signature_store=store,
            jaccard_threshold=0.5,
        )

    # batch 1: near-dup of existing doc 1 (dies), novel doc 11
    # (survives), redelivery of existing id 2 (dies on the anti-join)
    _produce_docs(
        spark,
        topic,
        [(10, BASE + " tail", "en"), (11, NOVEL_1, "en"), (2, NOVEL_2, "en")],
    )
    drain("ckpt1")
    assert _corpus_ids(spark, corpus) == [1, 2, 11]
    # store bootstrapped with the whole new corpus
    assert _store_ids(spark, store) == [1, 2, 11]

    # replay the SAME offsets from a fresh checkpoint: the id-level
    # anti-join re-reads the corpus per micro-batch, so the second
    # drain is a no-op (the reference's read-once A17 bug, fixed)
    drain("ckpt2")
    assert _corpus_ids(spark, corpus) == [1, 2, 11]
    assert _store_ids(spark, store) == [1, 2, 11]

    # batch 2: near-dup of the doc that arrived VIA STREAMING (11 —
    # its signature must be served by the store) dies; novel 13 lands
    _produce_docs(
        spark,
        topic,
        [(12, NOVEL_1 + " extra", "en"), (13, NOVEL_3, "en")],
    )
    drain("ckpt3")
    ids = _corpus_ids(spark, corpus)
    assert 12 not in ids and 13 in ids
    assert ids == [1, 2, 11, 13]
    # signature store advanced with the delta only
    assert _store_ids(spark, store) == [1, 2, 11, 13]

    # third drain on the ALREADY-CONSUMED checkpoint: no new offsets,
    # nothing changes (checkpointed idempotence, not just key-level)
    drain("ckpt3")
    assert _corpus_ids(spark, corpus) == [1, 2, 11, 13]


def test_streaming_corpus_drain_quality_gate(spark, tmp_path):
    """Docs failing the clean_corpus quality/token gates never reach
    the corpus, even as stream batches."""
    register_kafka_log_source(spark)
    topic = str(tmp_path / "topic")
    corpus = str(tmp_path / "corpus")

    spark.createDataFrame(
        [(1, BASE, "en")], "doc_id long, text string, lang string"
    ).write.parquet(corpus)
    _produce_docs(
        spark,
        topic,
        [(20, "x x x", "en"), (21, NOVEL_1, "en")],  # 20: too short
    )
    streaming_corpus_drain(
        spark, topic, corpus, str(tmp_path / "ckpt"),
        jaccard_threshold=0.5,
    )
    assert _corpus_ids(spark, corpus) == [1, 21]
