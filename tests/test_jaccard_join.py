"""Exact prefix-filter Jaccard join (operators/dedup.py:
jaccard_join_exact): no-false-negative guarantee vs an in-Spark
brute force, hand-computed values, and edge cases."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from pipeline_dataengineer_spark.operators.dedup import jaccard_join_exact


def _brute(rows, threshold):
    out = {}
    sets = {i: set(t.split()) for i, t in rows if t.split()}
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        j = round(inter / union, 4)
        if j >= threshold:
            out[(a, b)] = j
    return out


def test_jaccard_join_matches_brute_force(spark):
    """Every qualifying pair is found with the exact score — the
    prefix-filter theorem in action on a corpus with shared
    vocabulary, templated near-dups, and disjoint rows."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "the quick brown fox leaps over the lazy dog"),
        (4, "entirely different tokens appear in this document"),
        (5, "entirely different tokens appear in this text"),
        (6, "zzz yyy xxx"),
        (7, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    ]
    for t in (0.5, 0.7, 0.9):
        want = _brute(rows, t)
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in jaccard_join_exact(df, "doc_id", "text", threshold=t).collect()
        }
        assert got == want, (t, got, want)


def test_jaccard_join_exact_duplicate_scores_one(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y z")],
        "doc_id long, text string",
    )
    out = jaccard_join_exact(df, "doc_id", "text", threshold=0.99).collect()
    assert len(out) == 1
    assert (out[0]["id_a"], out[0]["id_b"], out[0]["jaccard"]) == (1, 2, 1.0)


def test_jaccard_join_empty_and_whitespace_rows_dropped(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, ""), (3, "   "), (4, "a b")],
        "doc_id long, text string",
    )
    out = jaccard_join_exact(df, "doc_id", "text", threshold=0.5).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [(1, 4)]


def test_jaccard_join_token_multiplicity_ignored(spark):
    """Token SETS: repeated tokens count once, so 'a a a b' and 'a b'
    are identical sets."""
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b")], "doc_id long, text string"
    )
    out = jaccard_join_exact(df, "doc_id", "text", threshold=0.9).collect()
    assert len(out) == 1 and out[0]["jaccard"] == 1.0
