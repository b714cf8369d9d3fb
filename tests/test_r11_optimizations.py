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


def test_lloyd_collect_fast_path_matches_aggregate_path(spark):
    """The bounded driver-collect of per-task partials (one
    single-stage job per iteration) must produce the same centroids
    as the map-side-combined aggregate path — identical partial sums,
    only the final fold moves from an exchange to the driver.
    Tolerance is summation-order ulps only; assignments must be
    bit-identical on a separated fixture."""
    import numpy as np

    from pipeline_dataengineer_spark.operators.clustering import (
        _lloyd_centroids,
    )

    rows = []
    for i in range(120):
        c = i % 3
        rows.append(
            (
                i,
                [
                    float(c * 10) + (i % 7) * 0.01,
                    float(c * -5) + (i % 5) * 0.02,
                ],
            )
        )
    df = (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        .repartition(5)
        .persist()
    )
    try:
        fast = _lloyd_centroids(
            df, "embedding", "vec_id", 3, 8, tol=1e-9
        )
        slow = _lloyd_centroids(
            df,
            "embedding",
            "vec_id",
            3,
            8,
            tol=1e-9,
            driver_collect_max_rows=0,  # force the aggregate path
        )
    finally:
        df.unpersist()
    assert np.allclose(fast, slow, rtol=0, atol=1e-9), (fast, slow)


def test_semantic_dedup_releases_lloyd_cache(spark):
    """semantic_dedup must not leave its Lloyd-input cache pinned
    (VERDICT r10 item 8): after the call, exactly ONE new persisted
    frame remains (the documented caller-owned `.sem_dedup_cache`
    handle), and unpersisting it restores the starting state."""
    from pipeline_dataengineer_spark.operators.dedup import semantic_dedup

    rows = [
        (i, [1.0 + 0.001 * (i % 4), 2.0, float(i % 3)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    jsc = spark.sparkContext._jsc.sc()

    def n_persisted():
        return jsc.getPersistentRDDs().size()

    before = n_persisted()
    out = semantic_dedup(df, "vec_id", "embedding", threshold=0.999, k=2,
                         max_iterations=3)
    out.count()
    assert n_persisted() == before + 1  # slim only; `work` released
    out.sem_dedup_cache.unpersist(blocking=True)
    assert n_persisted() == before


def test_monotonic_id_bit_layout_pin(spark):
    """global_row_index's stored-id trick depends on
    monotonically_increasing_id's documented layout: partition id in
    the upper 31 bits (<< 33), per-partition 0-based row counter in
    the lower 33. Pin it directly: the bit-slices must equal
    spark_partition_id() and a per-partition row_number."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = (
        spark.range(0, 1000)
        .repartition(7)
        .withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.spark_partition_id())
    )
    pid_slice = F.shiftright(F.col("__mid"), 33).cast("int")
    local_slice = F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1))
    w = Window.partitionBy("__pid").orderBy("__mid")
    checked = df.withColumn(
        "__rn", F.row_number().over(w) - 1
    ).filter(
        (pid_slice != F.col("__pid")) | (local_slice != F.col("__rn"))
    )
    assert checked.count() == 0


@pytest.mark.parametrize("n_parts", [256, 1030])
def test_global_row_index_many_partitions(spark, n_parts):
    """Forced high partition counts must still produce the exact
    0..n-1 total order — 256 exercises the dense O(1) literal-array
    offset lookup, 1030 the >1024 broadcast-join fallback (both with
    empty partitions, since rows << partitions)."""
    from pyspark.sql import functions as F

    from pipeline_dataengineer_spark.operators.order import (
        global_row_index,
    )

    n = 2000
    df = spark.range(0, n).select(
        (F.col("id") * 2654435761 % 9973).alias("key"), "id"
    )
    out = global_row_index(
        df, ["key", "id"], "idx", num_partitions=n_parts
    ).collect()
    assert sorted(r["idx"] for r in out) == list(range(n))
    ordered = sorted(out, key=lambda r: (r["key"], r["id"]))
    assert [r["idx"] for r in ordered] == list(range(n))


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
