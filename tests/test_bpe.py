"""BPE tokenizer (operators/bpe.py): learning determinism, classic
merge behavior, distributed apply parity with the driver-side
encoder, round-trip reconstruction."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline_dataengineer_spark.operators.bpe import (
    EOW,
    _encode_word,
    bpe_tokenize,
    learn_bpe_merges,
    vocab_from_merges,
)


def test_learn_merges_classic_behavior(spark):
    df = spark.createDataFrame(
        [("low low low low low lower lower newest newest newest "
          "newest newest newest widest widest widest",)],
        ["text"],
    )
    merges = learn_bpe_merges(df, num_merges=10)
    # 'e','s' is the most frequent pair (newest x6 + widest x3 = 9)
    assert merges[0] == ("e", "s")
    assert merges == learn_bpe_merges(df, num_merges=10)  # deterministic
    assert "es" in vocab_from_merges(merges)


def test_tokenize_matches_driver_encoder_and_reconstructs(spark):
    texts = [
        (1, "the lowest newest widest things"),
        (2, "low and slow"),
        (3, None),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [("low lower lowest newest widest new wide the and slow " * 5,)],
        ["text"],
    )
    merges = learn_bpe_merges(corpus, num_merges=30)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {r["doc_id"]: r for r in bpe_tokenize(df, merges).collect()}
    for doc_id, text in texts:
        expect = []
        for w in (text or "").lower().split():
            expect.extend(_encode_word(w, ranks))
        assert got[doc_id]["bpe_tokens"] == expect
        assert got[doc_id]["n_bpe_tokens"] == len(expect)
    # tokens reconstruct the original text exactly (EOW marks joins)
    joined = "".join(got[1]["bpe_tokens"]).replace(EOW, " ").strip()
    assert joined == "the lowest newest widest things"


def test_tokenize_is_a_map_no_shuffle(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = (
        bpe_tokenize(df, [("a", EOW)])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
