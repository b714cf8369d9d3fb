"""Focused tests for round-11 optimization internals.

Each optimization that changed an operator's internals gets a pin
here on exactly the equivalence argument the rewrite leaned on:

- duplicate_ngram_spans: the token-hash gram key (xxhash64 over the
  n per-token hashes) must produce the identical span output as the
  string-gram path — the keys differ, the gram EQUIVALENCE CLASSES
  must not;
- session: shuffles must be PLANNED at the input-aware initial
  partition count (AQE can merge, never split) while the static
  fallback stays cores-sized.
"""

from __future__ import annotations

import pytest


def _span_set(rows):
    return sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_dup_grams"])
        for r in rows
    )


def test_dup_spans_hash_grams_match_string_grams(spark):
    """hash_grams=True (token-hash keys, round-11 path) and
    hash_grams=False (NGram string keys) must emit identical spans:
    gram equality is decided by the n-token tuple either way. The
    fixture exercises repeated tokens, overlapping duplicate runs,
    docs shorter than n, leading/trailing whitespace (empty-string
    tokens from the split), and mixed case."""
    from pipeline_dataengineer_spark.operators.dedup import (
        duplicate_ngram_spans,
    )

    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota"),
        (2, "ALPHA beta gamma delta epsilon zeta eta theta kappa"),
        (3, "  alpha beta gamma delta epsilon zeta eta theta iota"),
        (4, "one two three"),  # shorter than n -> no grams
        (5, "x x x x x x x x x x x x"),  # degenerate repeats
        (6, "x x x x x x x x x x x x"),
        (7, None),  # NULL text
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for n in (4, 8):
        hashed = _span_set(
            duplicate_ngram_spans(
                df, "doc_id", "text", n_tokens=n, hash_grams=True
            ).collect()
        )
        strings = _span_set(
            duplicate_ngram_spans(
                df, "doc_id", "text", n_tokens=n, hash_grams=False
            ).collect()
        )
        assert hashed == strings, f"n_tokens={n}: {hashed} != {strings}"


def test_dup_spans_positions_and_short_docs(spark):
    """The exploded-position path must keep NGram's position
    convention: 1-based start, last gram starts at T-n+1, docs with
    exactly n tokens emit one gram, docs with fewer emit none."""
    from pipeline_dataengineer_spark.operators.dedup import _token_ngrams

    df = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "a b c d"),
            (3, "a b c"),
        ],
        "doc_id long, text string",
    )
    rows = (
        _token_ngrams(df, "doc_id", "text", 4, True, "doc_id")
        .collect()
    )
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["start_pos"])
    assert by_doc == {1: [1], 2: [1]}  # doc 3: 3 tokens < n -> none
    # 6-token doc with n=4 -> starts 1..3
    df2 = spark.createDataFrame(
        [(9, "t u v w x y")], "doc_id long, text string"
    )
    starts = sorted(
        r["start_pos"]
        for r in _token_ngrams(df2, "doc_id", "text", 4, True, "doc_id").collect()
    )
    assert starts == [1, 2, 3]


def test_session_plans_input_aware_initial_partitions(spark):
    """AQE coalescing can only MERGE partitions, so the planned
    (initial) count is the scale-safety ceiling: it must be the
    input-aware floor (>= 256 locally), not the core count (round-10
    sf10 spot: a 6 GB shuffle planned at 32 partitions spilled its
    SMJ sorts, q_tpch_q21_shape 19.7x for 10x data). The static
    fallback stays cores-sized for non-AQE-planned shuffles."""
    conf = spark.conf
    init = int(
        conf.get("spark.sql.adaptive.coalescePartitions.initialPartitionNum")
    )
    cores = spark.sparkContext.defaultParallelism
    assert init >= max(8 * cores, 256)
    assert conf.get("spark.sql.adaptive.enabled") == "true"
    assert (
        conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true"
    )
    assert int(conf.get("spark.sql.shuffle.partitions")) <= init
