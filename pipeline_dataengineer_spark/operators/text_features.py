"""Corpus-level text featurization: TF-IDF, document frequency.

The per-document stats in ``functions/textstats.py`` are narrow maps;
TF-IDF is the first *corpus-relative* feature — a term's weight
depends on how many documents contain it. Shape: one explode, one
(id, term) aggregate, a partial-aggregable document-frequency
aggregate joined back on ``term``, and one broadcast of the (tiny)
corpus size.
North-star text-analysis extension (no analog in the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def terms(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term) rows: lowercase, split on single spaces, drop
    empties. Deliberately the simplest portable tokenizer — identical
    semantics in any engine's string_split (oracle parity)."""
    from pipeline_dataengineer_spark.catalog import scale_out

    return scale_out(df.select(id_col, text_col)).select(
        id_col,
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
    ).filter(F.col("term") != "")


def tf_idf(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", round_to: int = 4
) -> DataFrame:
    """(id, term, tf, df, tfidf) with tfidf = tf * ln(N / df).

    N arrives via a 1-row cross join (broadcast NL join of a scalar —
    never a driver collect), so the whole computation stays lazy and
    distributed.
    """
    t = terms(df, id_col, text_col)
    tf = t.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    # Document frequency as a groupBy aggregate joined back on term —
    # NOT a window count. A window over `term` has no partial
    # aggregation: every (id, term) row for a stopword lands in one
    # task's buffer, the classic skew killer on exactly the hottest
    # keys. The groupBy is map-side combinable (only partial counts
    # shuffle), and the join back on term is AQE-skew-splittable,
    # which a window exchange never is.
    docfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    tf = tf.join(docfreq, "term")
    n_docs = df.select(
        F.count_distinct(F.col(id_col)).cast("double").alias("_n")
    )
    return (
        tf.crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            "df",
            F.round(F.col("tf") * F.log(F.col("_n") / F.col("df")), round_to).alias(
                "tfidf"
            ),
        )
    )


def inverted_index(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Posting lists: (term, doc_freq, postings) with postings the
    sorted distinct doc ids containing the term — the retrieval-side
    complement of tf_idf.

    One shuffle on term with partial aggregation (collect_set combines
    map-side). Posting lists for stopword-grade terms are the classic
    giant-row risk at 100 TB; cap them by pre-filtering high-df terms
    with a first cheap count pass (same two-phase shape as the LSH
    bucket cap) when the corpus is web-scale."""
    t = terms(df, id_col, text_col)
    return t.groupBy("term").agg(
        F.count_distinct(F.col(id_col)).alias("doc_freq"),
        F.sort_array(F.collect_set(F.col(id_col))).alias("postings"),
    )


def word_repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", round_to: int = 4
) -> DataFrame:
    """Per-document repetition diagnostics (the Gopher-rules family):
    (id, n_words, n_distinct, dup_word_frac, top_word_frac).

    dup_word_frac = 1 - distinct/total; top_word_frac = most frequent
    word's share. Highly repetitive documents (boilerplate, SEO spam,
    generation loops) score high on both and get filtered before
    training. Two chained aggregations, both map-side combinable; the
    only wide exchange is on (id, term), same as tf_idf."""
    t = terms(df, id_col, text_col)
    wc = t.groupBy(id_col, "term").agg(F.count("*").alias("cnt"))
    total = F.sum("cnt")
    return wc.groupBy(id_col).agg(
        total.alias("n_words"),
        F.count("*").alias("n_distinct"),
        F.round(F.lit(1.0) - F.count("*") / total, round_to).alias("dup_word_frac"),
        F.round(F.max("cnt") / total, round_to).alias("top_word_frac"),
    )
