"""Dataset card: the one-row corpus "nutrition label" a training-data
release ships with — sizes, language mix, duplication rate, length
distribution — computed in two combinable aggregate passes (one over
documents for the scalars, one tiny per-language rollup broadcast
back). Nothing fact-sized leaves the executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_dataset_card(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str | None = "lang",
) -> DataFrame:
    """ONE summary row: (n_docs, total_chars, total_tokens,
    median_tokens, p90_tokens, distinct_text_rate, langs) where
    ``langs`` is a lang-sorted array<struct<lang, n_docs>> and
    ``distinct_text_rate`` = exact distinct texts / docs (1.0 means
    no verbatim duplicates). Tokens are whitespace tokens (the same
    definition the token-count oracles replay).

    Scale: the scalar pass is one combinable aggregate (exact
    percentiles partial-aggregate in Spark 3.4+); distinct-text is
    the one genuinely shuffling term (count-distinct on the text —
    swap in a fingerprint column upstream if texts are huge); the
    language histogram is a language-cardinality-sized aggregate
    broadcast back onto the 1-row frame."""
    toks = F.size(
        F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"),
            lambda t: t != "",
        )
    ).cast("double")
    base = df.select(
        F.col(text_col).alias("__t"),
        toks.alias("__ntok"),
        F.length(text_col).cast("long").alias("__nch"),
        *([F.col(lang_col).alias("__lang")] if lang_col else []),
    )
    scalars = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__nch").alias("total_chars"),
        F.sum("__ntok").cast("long").alias("total_tokens"),
        F.round(F.percentile("__ntok", F.lit(0.5)), 4).alias(
            "median_tokens"
        ),
        F.round(F.percentile("__ntok", F.lit(0.9)), 4).alias(
            "p90_tokens"
        ),
        F.round(
            F.count_distinct(F.col("__t")) / F.count(F.lit(1)), 6
        ).alias("distinct_text_rate"),
    )
    if not lang_col:
        return scalars
    langs = (
        base.groupBy("__lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("__lang").alias("lang"),
                        F.col("n").alias("n_docs"),
                    )
                )
            ).alias("langs")
        )
    )
    return scalars.crossJoin(F.broadcast(langs))
