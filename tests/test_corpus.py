"""Unit tests for the end-to-end corpus cleaning operator."""

from __future__ import annotations

from pipeline_dataengineer_spark.operators.corpus import clean_corpus


def test_clean_corpus_filters_and_dedups(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the quick brown fox jumps over the lazy dog", "en"),  # dup of 1
        (3, "short", "en"),  # under min_tokens
        (4, "ein ganz normaler deutscher satz mit genug worten", "de"),
        (5, "texto perfectamente razonable con bastantes palabras", "es"),  # lang out
        (6, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))", "en"),  # punct-only → low quality
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = clean_corpus(df, langs=["en", "de"], min_quality=0.3, min_tokens=3).select(
        "doc_id"
    )
    assert {r.doc_id for r in out.collect()} == {1, 4}  # min-id dup survives


def test_clean_corpus_attaches_features(spark):
    df = spark.createDataFrame(
        [(1, "one two three four five six", "en")],
        "doc_id long, text string, lang string",
    )
    row = clean_corpus(df).collect()[0]
    assert row.n_tokens == 6
    assert 0.0 <= row.quality <= 1.0
