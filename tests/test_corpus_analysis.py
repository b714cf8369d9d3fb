"""perplexity_buckets, oov_rate, zipf_fit."""

from __future__ import annotations

import math


def test_perplexity_buckets_head_tail(spark):
    from pipeline_dataengineer_spark.operators.corpus import (
        perplexity_buckets,
    )
    from pipeline_dataengineer_spark.operators.text_features import (
        train_char_trigram_lm,
    )

    # 9 docs per lang: 3 natural-ish, 3 mid, 3 junk — junk must land
    # in the tail bucket, repeated-pattern text in the head.
    rows = []
    for lang in ("en", "fr"):
        for i in range(3):
            rows.append((f"{lang}_head_{i}", lang, "the cat sat on the mat " * 8))
        for i in range(3):
            rows.append((f"{lang}_mid_{i}", lang, f"mixed words appear here {i} sometimes oddly"))
        for i in range(3):
            rows.append((f"{lang}_tail_{i}", lang, f"zq{i}xv jkwp qzzt vbnm xkcd wyxz"))
    df = spark.createDataFrame(rows, "doc_id string, lang string, text string")
    # CCNet trains the LM on a REFERENCE corpus, not the candidates:
    # junk trigrams must be UNSEEN (unk penalty), not self-predicted.
    ref = spark.createDataFrame(
        [
            ("r1", "the cat sat on the mat and the dog sat too"),
            ("r2", "mixed words appear here sometimes oddly placed"),
            ("r3", "the mat sat on the cat sometimes words appear"),
        ],
        "doc_id string, text string",
    )
    lm = train_char_trigram_lm(ref, id_col="doc_id", text_col="text")
    out = perplexity_buckets(df, lm, group_col="lang", id_col="doc_id").collect()
    by_id = {r["doc_id"]: r for r in out}
    for lang in ("en", "fr"):
        assert all(by_id[f"{lang}_head_{i}"]["bucket_label"] == "head" for i in range(3))
        assert all(by_id[f"{lang}_tail_{i}"]["bucket_label"] == "tail" for i in range(3))
    # equal-frequency: each (lang, bucket) holds exactly 3 of 9
    from collections import Counter

    sizes = Counter((r["lang"], r["bucket"]) for r in out)
    assert set(sizes.values()) == {3}


def test_oov_rate_counts(spark):
    from pipeline_dataengineer_spark.operators.text_features import oov_rate

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha zzz qqq"), (3, "")],
        "doc_id long, text string",
    )
    vocab = spark.createDataFrame(
        [("alpha",), ("beta",), ("gamma",)], "term string"
    )
    got = {r["doc_id"]: r for r in oov_rate(docs, vocab).collect()}
    assert got[1]["n_oov"] == 0 and got[1]["oov_rate"] == 0.0
    assert got[2]["n_tokens"] == 3 and got[2]["n_oov"] == 2
    assert abs(got[2]["oov_rate"] - round(2 / 3, 6)) < 1e-12
    assert 3 not in got  # empty text has no tokens, no row


def test_zipf_fit_recovers_planted_slope(spark):
    from pipeline_dataengineer_spark.operators.text_features import zipf_fit

    # plant an exact power law: term t_r appears round(1000 * r^-1)
    # times -> slope ~ -1, r2 ~ 1
    words = []
    for r in range(1, 41):
        words += [f"t{r:02d}"] * round(1000 / r)
    df = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    row = zipf_fit(df, top_k=40).collect()[0]
    assert row["n_terms"] == 40
    assert abs(row["slope"] + 1.0) < 0.02  # rounding of counts only
    assert row["r2"] > 0.999
    # ties rank deterministically by term: flat corpus -> slope 0
    flat = spark.createDataFrame(
        [(1, "a b c d e " * 10)], "doc_id long, text string"
    )
    frow = zipf_fit(flat, top_k=5).collect()[0]
    assert frow["slope"] == 0.0 and frow["n_terms"] == 5
    assert frow["r2"] is None  # zero y-variance: undefined, not NaN


def test_dataset_card_summary(spark):
    from pipeline_dataengineer_spark.pipelines.dataset_card import (
        build_dataset_card,
    )

    rows = [
        (1, "a b c", "en"), (2, "a b c", "en"),   # verbatim dup
        (3, "d e", "fr"), (4, "f", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    r = build_dataset_card(df, "text", "lang").collect()[0]
    assert r["n_docs"] == 4
    assert r["total_tokens"] == 3 + 3 + 2 + 1
    assert r["distinct_text_rate"] == 0.75
    assert [(x["lang"], x["n_docs"]) for x in r["langs"]] == [("en", 3), ("fr", 1)]
    assert r["median_tokens"] == 2.5  # interpolated between 2 and 3

    nolang = build_dataset_card(df, "text", lang_col=None).collect()[0]
    assert "langs" not in nolang.asDict()


def test_conversation_validation_matrix(spark):
    from pipeline_dataengineer_spark.operators.chat import (
        conversation_stats,
    )

    def msg(role, content):
        return {"role": role, "content": content}

    rows = [
        (1, [msg("system", "s"), msg("user", "hi"), msg("assistant", "yo")]),
        (2, [msg("user", "hi"), msg("assistant", "yo"),
             msg("user", "more"), msg("assistant", "sure")]),
        (3, [msg("user", "hi")]),                      # ends on user
        (4, [msg("assistant", "yo")]),                 # starts assistant
        (5, [msg("user", "hi"), msg("system", "late"),
             msg("assistant", "yo")]),                 # system not first
        (6, [msg("user", "  "), msg("assistant", "yo")]),  # blank content
        (7, []),                                       # empty
    ]
    df = spark.createDataFrame(
        rows, "cid long, messages array<struct<role string, content string>>"
    )
    got = {r["cid"]: r for r in conversation_stats(df).collect()}
    assert got[1]["valid"] and got[2]["valid"]
    assert not got[3]["valid"] and not got[4]["valid"]
    assert not got[5]["valid"] and not got[6]["valid"]
    assert not got[7]["valid"] and got[7]["n_turns"] == 0
    assert got[2]["user_tokens"] == 2 and got[2]["assistant_tokens"] == 2
    assert got[1]["flat_text"] == "<|system|>s\n<|user|>hi\n<|assistant|>yo"


def test_assistant_spans_slice_property(spark):
    """Property: substring(flat, s, e-s+1) recovers EXACTLY each
    assistant turn's content, for random conversations."""
    import random

    from pyspark.sql import functions as F

    from pipeline_dataengineer_spark.operators.chat import (
        assistant_spans,
        flatten_conversation,
    )

    rng = random.Random(42)
    rows = []
    for cid in range(30):
        msgs = []
        if rng.random() < 0.5:
            msgs.append({"role": "system", "content": "sys " * rng.randint(1, 3)})
        for _ in range(rng.randint(1, 4)):
            msgs.append({"role": "user", "content": " ".join(
                "u%d" % rng.randint(0, 99) for _ in range(rng.randint(1, 6)))})
            msgs.append({"role": "assistant", "content": " ".join(
                "a%d" % rng.randint(0, 99) for _ in range(rng.randint(1, 6)))})
        rows.append((cid, msgs))
    df = spark.createDataFrame(
        rows, "cid long, messages array<struct<role string, content string>>"
    )
    got = df.select(
        "cid",
        flatten_conversation("messages").alias("flat"),
        assistant_spans("messages").alias("spans"),
    ).collect()
    by_cid = {r["cid"]: r for r in got}
    for cid, msgs in rows:
        r = by_cid[cid]
        want = [m["content"] for m in msgs if m["role"] == "assistant"]
        sliced = [
            r["flat"][sp["s"] - 1 : sp["e"]] for sp in r["spans"]
        ]
        assert sliced == want, (cid, sliced, want)


def test_build_sft_dataset_end_to_end(spark):
    from pipeline_dataengineer_spark.pipelines.sft_dataset import (
        build_sft_dataset,
    )

    def msg(role, content):
        return {"role": role, "content": content}

    good = [msg("user", "hello there"), msg("assistant", "hi friend")]
    rows = [
        (1, "web", good),
        (2, "web", good),                                   # exact dup
        (3, "web", [msg("user", "only user turn")]),        # invalid
        (4, "books", [msg("system", "s"), msg("user", "q q q"),
                      msg("assistant", "a a")]),
        (5, "books", [msg("user", "x y"), msg("assistant", "z")]),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id long, source string, "
        "messages array<struct<role string, content string>>",
    )
    out = build_sft_dataset(df, source_col="source")
    got = {r["conv_id"]: r for r in out.collect()}
    assert set(got) == {1, 4, 5}  # dup 2 collapsed onto 1, invalid 3 gone
    assert got[1]["assistant_tokens"] == 2
    sp = got[4]["loss_spans"]
    assert len(sp) == 1
    flat = got[4]["flat_text"]
    assert flat[sp[0]["s"] - 1 : sp[0]["e"]] == "a a"

    # budget: cap 'books' to ~5 tokens -> the crossing conversation
    # is kept, later ones drop (deterministic scramble order)
    capped = build_sft_dataset(
        df, source_col="source",
        token_budgets={"web": 1000, "books": 1},
    )
    by_src = {}
    for r in capped.collect():
        by_src.setdefault(r["source"], []).append(r["conv_id"])
    assert by_src["web"] == [1]
    assert len(by_src["books"]) == 1  # budget 1 -> only the crosser

    import pytest

    with pytest.raises(ValueError):
        build_sft_dataset(df, token_budgets={"web": 1})
