"""End-to-end pretraining-corpus cleaning.

Composes the north-star text primitives (language filter, quality
score, token bounds, exact dedup) into the single pass a corpus build
actually runs. Operator order is the scale order: cheap narrow
filters (lang, token count, quality — all codegen'd expressions)
eliminate rows BEFORE the one shuffle (dedup by text hash), so the
exchange moves only surviving documents. Dedup keys on the full text
grouped by xxhash64 prefix? No — plain partition-by-text window; at
100 TB swap the partition key to ``xxhash64(text)`` to keep shuffle
keys 8 bytes (collision-checked by the canonical row's text equality).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pipeline_dataengineer_spark.functions.textstats import (
    quality_score,
    token_count,
)


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    langs: list[str] | None = None,
    min_quality: float = 0.5,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
) -> DataFrame:
    """Filter + dedup a document table; returns surviving rows with
    ``n_tokens`` and ``quality`` columns attached. Keeps the min-id
    duplicate (deterministic canonical pick)."""
    from pipeline_dataengineer_spark.catalog import scale_out

    out = scale_out(df).withColumn(
        "n_tokens", token_count(text_col).cast("long")
    ).withColumn("quality", quality_score(text_col))
    if langs is not None:
        out = out.filter(F.col(lang_col).isin(langs))
    out = out.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("quality") >= min_quality)
    )
    w = Window.partitionBy(text_col).orderBy(F.col(id_col).asc())
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def cap_per_key(
    df: DataFrame,
    key_cols: list[str],
    max_rows: int,
    order_col: str | Column,
    descending: bool = False,
) -> DataFrame:
    """Keep at most ``max_rows`` rows per key, chosen by ``order_col``
    (the web-corpus "cap documents per domain" rule — unbounded hosts
    like link farms otherwise dominate the token budget).

    One shuffle on the key, rank inside the partition, filter. The
    order column makes the cap DETERMINISTIC — capping by arrival
    order would silently change membership on every re-run/layout
    (same reason dedup_last_wins takes an explicit order). Skewed
    keys (the very domains being capped) are split by AQE skew
    handling; the filter drops their tail before anything downstream
    shuffles again."""
    oc = F.col(order_col) if isinstance(order_col, str) else order_col
    w = Window.partitionBy(*key_cols).orderBy(oc.desc() if descending else oc.asc())
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= max_rows)
        .drop("__rank")
    )
