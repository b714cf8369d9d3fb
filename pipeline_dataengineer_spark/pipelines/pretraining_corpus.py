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
