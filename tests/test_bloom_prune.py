"""k-hash Bloom prune (operators/prune.py:build_bloom /
bloom_might_contain / bloom_semi_join_prune / bloom_anti_join_prune):
exactness vs the plain joins, the no-false-negative invariant, and
that the bitmap really prunes."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline_dataengineer_spark.operators.prune import (
    bloom_anti_join_prune,
    bloom_might_contain,
    bloom_semi_join_prune,
    build_bloom,
)

BITS = 1 << 16


def _sides(spark):
    big = spark.range(0, 20_000).select((F.col("id") * 7).alias("k"))
    small = spark.range(0, 500).select((F.col("id") * 91).alias("k"))
    return big, small


def test_bloom_semi_join_exact(spark):
    big, small = _sides(spark)
    got = sorted(
        r["k"] for r in bloom_semi_join_prune(
            big, small, "k", num_bits=BITS).collect()
    )
    want = sorted(r["k"] for r in big.join(
        small.distinct(), "k", "left_semi").collect())
    assert got == want and len(got) > 0


def test_bloom_anti_join_exact(spark):
    big, small = _sides(spark)
    got = sorted(
        r["k"] for r in bloom_anti_join_prune(
            big, small, "k", num_bits=BITS).collect()
    )
    want = sorted(r["k"] for r in big.join(
        small.distinct(), "k", "left_anti").collect())
    assert got == want
    assert len(got) + small.join(big, "k", "left_semi").count() == 20_000


def test_bloom_no_false_negatives_and_prunes(spark):
    """Every inserted key passes the membership test (no false
    negatives — the correctness half), and the bitmap rejects the
    vast majority of non-members (the cost half: at n=500, m=2^16,
    k=3 the FP rate is ~0.03%)."""
    big, small = _sides(spark)
    bitmap = build_bloom(small.distinct(), "k", num_bits=BITS)
    assert small.filter(
        ~bloom_might_contain(bitmap, "k", BITS)).count() == 0
    survivors = big.filter(bloom_might_contain(bitmap, "k", BITS)).count()
    true_matches = big.join(small.distinct(), "k", "left_semi").count()
    assert survivors >= true_matches          # never drops a match
    assert survivors <= true_matches + 200    # and actually prunes


def test_bloom_bitmap_is_config_bounded(spark):
    """Bitmap length is m/64 regardless of key count."""
    _, small = _sides(spark)
    bm = build_bloom(small, "k", num_bits=4096)
    assert len(bm) == 4096 // 64
    assert any(w != 0 for w in bm)
