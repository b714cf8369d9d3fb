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


def test_cap_per_key_deterministic(spark):
    from pipeline_dataengineer_spark.operators.corpus import cap_per_key

    df = spark.createDataFrame(
        [(f"d{i}", i, "big" if i < 20 else "small") for i in range(25)],
        ["doc", "rank_key", "src"],
    )
    out = cap_per_key(df, ["src"], 3, "rank_key")
    got = {(r["src"], r["rank_key"]) for r in out.collect()}
    assert got == {("big", 0), ("big", 1), ("big", 2),
                   ("small", 20), ("small", 21), ("small", 22)}
    # descending keeps the other tail
    out_d = cap_per_key(df, ["src"], 2, "rank_key", descending=True)
    got_d = {(r["src"], r["rank_key"]) for r in out_d.collect()}
    assert got_d == {("big", 19), ("big", 18), ("small", 24), ("small", 23)}
