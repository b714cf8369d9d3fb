"""Char-trigram LM training + perplexity scoring
(operators/text_features.py). Model properties, not golden numbers:
probabilities per context sum to 1, in-distribution text scores lower
perplexity than out-of-distribution text, short docs produce no score.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pipeline_dataengineer_spark.operators.text_features import (
    char_trigrams,
    perplexity,
    train_char_trigram_lm,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, "the cat sat on the mat " * 5) for i in range(20)]
    rows += [(100 + i, "a dog ran to the dog bed " * 5) for i in range(20)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_trigram_extraction_exact(spark):
    df = spark.createDataFrame([(1, "AbCd"), (2, "xy"), (3, None)],
                               "doc_id long, text string")
    got = {
        (r["doc_id"], r["gram"])
        for r in char_trigrams(df, "doc_id", "text").collect()
    }
    # lowercased, sliding windows; len<3 and null docs vanish
    assert got == {(1, "abc"), (1, "bcd")}


def test_lm_probabilities_normalize(corpus):
    lm = train_char_trigram_lm(corpus)
    sums = (
        lm.groupBy(F.substring("gram", 1, 2).alias("ctx"))
        .agg(F.sum(F.exp("logp")).alias("psum"))
        .collect()
    )
    assert sums, "LM is empty"
    for r in sums:
        assert math.isclose(r["psum"], 1.0, rel_tol=1e-9), r


def test_in_distribution_scores_lower(spark, corpus):
    lm = train_char_trigram_lm(corpus)
    probe = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "zqxj vwpf kgzz qqqq")],
        "doc_id long, text string",
    )
    ppl = {r["doc_id"]: r["ppl"] for r in perplexity(probe, lm).collect()}
    assert ppl[1] < ppl[2]
    # the OOV probe is dominated by the flat unknown penalty
    assert ppl[2] > 1000


def test_short_docs_unscored(spark, corpus):
    lm = train_char_trigram_lm(corpus)
    probe = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    assert perplexity(probe, lm).count() == 0


def test_ngram_counts(spark, corpus):
    lm = train_char_trigram_lm(corpus)
    probe = spark.createDataFrame([(7, "abcde")], "doc_id long, text string")
    row = perplexity(probe, lm).collect()[0]
    assert row["n_grams"] == 3


def test_inverted_index_posting_cap_drops_stopword_terms(spark):
    from pyspark.sql import functions as F

    from pipeline_dataengineer_spark.operators.text_features import inverted_index

    # "the" appears in all 50 docs (the manufactured stopword);
    # "rare<i>" in exactly one each.
    docs = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("the rare"), F.col("id").cast("string")).alias("text"),
    )
    capped = inverted_index(docs, max_posting_size=10)
    assert capped.index_audit == {"dropped_terms": 1, "max_dropped_doc_freq": 50}
    terms_left = {r["term"] for r in capped.select("term").collect()}
    assert "the" not in terms_left and len(terms_left) == 50
    # uncapped keeps everything and reports a clean audit
    full = inverted_index(docs)
    assert full.index_audit == {"dropped_terms": 0, "max_dropped_doc_freq": 0}
    assert full.count() == 51


def test_bm25_hand_computed(spark):
    from pipeline_dataengineer_spark.operators.text_features import bm25_rank

    # 3 docs; query = {cat}. df(cat)=2, N=3, dl = 4,4,2, avgdl = 10/3
    df = spark.createDataFrame(
        [
            (1, "cat cat dog bird"),
            (2, "cat dog dog bird"),
            (3, "fish fish"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_hits"], r["score"])
        for r in bm25_rank(df, ["cat"], k1=1.2, b=0.75).collect()
    }
    assert set(out) == {1, 2}  # doc 3 has no hit
    idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0)
    avgdl = 10 / 3

    def s(tf, dl):
        return round(
            idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)), 4
        )

    assert out[1] == (1, s(2, 4))
    assert out[2] == (1, s(1, 4))
    # higher tf at equal length ranks higher
    assert out[1][1] > out[2][1]


def test_bm25_length_normalization(spark):
    from pipeline_dataengineer_spark.operators.text_features import bm25_rank

    # same tf, shorter doc wins under b>0; tie under b=0
    df = spark.createDataFrame(
        [(1, "cat dog"), (2, "cat dog bird fish mouse wolf")],
        "doc_id long, text string",
    )
    norm = {
        r["doc_id"]: r["score"]
        for r in bm25_rank(df, ["cat"], b=0.75).collect()
    }
    flat = {
        r["doc_id"]: r["score"]
        for r in bm25_rank(df, ["cat"], b=0.0).collect()
    }
    assert norm[1] > norm[2]
    assert flat[1] == flat[2]


def test_bm25_multi_term_and_case(spark):
    from pipeline_dataengineer_spark.operators.text_features import bm25_rank

    df = spark.createDataFrame(
        [(1, "Cat DOG"), (2, "cat"), (3, "dog")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n_hits"]
        for r in bm25_rank(df, ["CAT", "dog", "dog"]).collect()
    }
    # query terms lowercase + dedup; doc text lowercased by terms()
    assert out == {1: 2, 2: 1, 3: 1}


def test_phrase_search_consecutive_only(spark):
    from pipeline_dataengineer_spark.operators.text_features import (
        phrase_search,
        positional_index,
    )

    df = spark.createDataFrame(
        [
            (1, "big red fox and big red fox again"),
            (2, "big fox red"),          # terms present, not consecutive
            (3, "red big red fox"),      # one match at pos 2
            (4, "nothing relevant"),
        ],
        "doc_id long, text string",
    )
    idx = positional_index(df)
    out = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(idx, ["big", "red", "fox"]).collect()
    }
    assert out == {1: (2, 1), 3: (1, 2)}
    # single-term phrase degenerates to term lookup
    single = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search(idx, ["fox"]).collect()
    }
    assert single == {1: 2, 2: 1, 3: 1}


def test_hashed_doc_vectors_properties(spark):
    from pipeline_dataengineer_spark.functions.vectors import (
        cosine_similarity,
    )
    from pipeline_dataengineer_spark.operators.text_features import (
        hashed_doc_vectors,
    )

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha"),
            (2, "alpha beta gamma alpha"),   # identical -> same vector
            (3, "delta epsilon zeta eta theta iota"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["vector"] for r in hashed_doc_vectors(df, dim=16).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]
    assert all(len(v) == 16 for v in out.values())
    # counts live in the vector: total |mass| of doc 1 = 4 terms
    assert sum(abs(x) for x in out[1]) <= 4  # signed collisions may cancel
    # identical docs are cosine-1 through the existing similarity stack
    vec = hashed_doc_vectors(df, dim=16)
    a = vec.filter("doc_id = 1").select(F.col("vector").alias("va"))
    sim = (
        vec.filter("doc_id = 2")
        .crossJoin(a)
        .select(cosine_similarity("vector", "va").alias("cs"))
        .collect()[0]["cs"]
    )
    assert abs(sim - 1.0) < 1e-9


def test_compression_ratio_discriminates(spark):
    from pipeline_dataengineer_spark.operators.text_features import (
        compression_ratio,
    )

    import random

    rng = random.Random(5)
    noise = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(800))
    rows = [
        (1, "spam spam spam " * 60),            # loop: compresses hard
        (2, noise),                             # high entropy
        (3, ""),                                # empty -> NULL ratio
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_bytes"], r["ratio"])
        for r in compression_ratio(df).collect()
    }
    assert out[1][1] < 0.1          # repetitive junk
    assert out[2][1] > 0.5          # noise barely compresses
    assert out[3] == (0, None)


def test_kn_bigram_lm_properties(spark):
    """KN smoothing: seen bigrams beat unseen-with-known-context,
    which beat unknown contexts; per-context probabilities sum to ~1
    over the full vocabulary (the interpolation is a proper
    distribution)."""
    import math

    from pyspark.sql import functions as F

    from pipeline_dataengineer_spark.operators.text_features import (
        kn_score,
        train_kn_bigram_lm,
    )

    train = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the cat ate the fish"),
         (3, "a dog sat on a log")],
        "doc_id long, text string",
    )
    bigrams, contexts, cont = train_kn_bigram_lm(train)
    b = {(r["v"], r["w"]): r["p_seen"] for r in bigrams.collect()}
    lam = {r["v"]: r["lam"] for r in contexts.collect()}
    pc = {r["w"]: r["p_cont"] for r in cont.collect()}
    # proper distribution per context: sum over vocab of
    # p_seen + lam*p_cont = 1 (KN mass conservation)
    for v in lam:
        total = sum(
            b.get((v, w), 0.0) + lam[v] * pc.get(w, 0.0) for w in pc
        )
        assert abs(total - 1.0) < 1e-9, (v, total)

    test = spark.createDataFrame(
        [(10, "the cat sat"),          # all seen bigrams
         (11, "the dog sat"),          # known context, unseen bigram
         (12, "zzz qqq www")],         # unknown everything
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["ppl"] for r in
           kn_score(test, (bigrams, contexts, cont)).collect()}
    assert got[10] < got[11] < got[12]
    assert got[12] == round(math.exp(16.11809565095832), 4)
