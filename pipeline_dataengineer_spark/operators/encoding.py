"""Leakage-safe categorical feature encoding.

Target (mean) encoding replaces a high-cardinality categorical with
the mean of the label within its category — the workhorse encoding
for tree models on web-scale categoricals (domains, publishers, user
cohorts) where one-hot would explode. Done naively it LEAKS: a row's
own label contributes to its own feature. Both standard remedies are
implemented, each as combinable aggregates joined back broadcast —
the fact table never shuffles (same plan discipline as
``operators/scaling.py``):

- **leave-one-out**: (category sum − own label) / (category count −
  1); NULL for singleton categories (no peer information exists).
- **K-fold**: a row's feature uses only OTHER folds' statistics;
  fold assignment is the deterministic Lehmer bucket so reruns and
  other engines agree exactly. Per-(category, fold) partials are one
  aggregate; the out-of-fold statistic is the category total minus
  the own-fold partial — no per-fold scan repetition.

Smoothing (``prior_weight``) shrinks small categories toward the
global prior — the standard variance control.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipeline_dataengineer_spark.operators.sampling import portable_bucket


def target_encode_loo(
    df: DataFrame,
    category_col: str,
    label_col: str,
    out_col: str = "te",
    prior_weight: float = 0.0,
) -> DataFrame:
    """Leave-one-out target encoding with optional smoothing toward
    the global mean: ((sum−own) + w·prior) / ((n−1) + w). With
    w = 0, singleton categories yield NULL."""
    stats = df.groupBy(category_col).agg(
        F.sum(label_col).alias("__s"), F.count(label_col).alias("__n")
    )
    prior = df.agg(F.avg(label_col)).collect()[0][0]
    enc = df.join(F.broadcast(stats), category_col)
    num = (F.col("__s") - F.col(label_col)) + F.lit(prior_weight) * F.lit(prior)
    den = (F.col("__n") - 1) + F.lit(prior_weight)
    return enc.withColumn(
        out_col, F.when(den > 0, num / den)
    ).drop("__s", "__n")


def target_encode_kfold(
    df: DataFrame,
    category_col: str,
    id_col: str,
    label_col: str,
    n_folds: int = 5,
    out_col: str = "te",
    fold_col: str = "fold",
) -> DataFrame:
    """K-fold target encoding: each row's feature is the category
    mean over the OTHER folds. Deterministic folds (Lehmer bucket of
    ``id_col``); categories entirely inside one fold yield NULL for
    that fold's rows."""
    with_fold = df.withColumn(
        fold_col, portable_bucket(F.col(id_col), n_folds)
    )
    per_fold = with_fold.groupBy(category_col, fold_col).agg(
        F.sum(label_col).alias("__fs"), F.count(label_col).alias("__fn")
    )
    totals = per_fold.groupBy(category_col).agg(
        F.sum("__fs").alias("__s"), F.sum("__fn").alias("__n")
    )
    oof = (
        per_fold.join(F.broadcast(totals), category_col)
        .select(
            category_col,
            fold_col,
            (F.col("__s") - F.col("__fs")).alias("__oof_s"),
            (F.col("__n") - F.col("__fn")).alias("__oof_n"),
        )
    )
    return (
        with_fold.join(F.broadcast(oof), [category_col, fold_col])
        .withColumn(
            out_col,
            F.when(F.col("__oof_n") > 0, F.col("__oof_s") / F.col("__oof_n")),
        )
        .drop("__oof_s", "__oof_n")
    )


def woe_encode(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    smoothing: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Weight-of-evidence category encoding (credit-risk scorecards,
    churn models): WoE(c) = ln( (pos_c + s)/(pos + 2s) /
    ((neg_c + s)/(neg + 2s)) ) with additive smoothing so single-class
    categories stay finite; IV contribution per category reported
    alongside (sum it for the feature's information value). One
    combinable aggregate over (category, label counts); the result is
    category-cardinality-sized — broadcast it back onto facts."""
    lbl = F.col(label_col).cast("double")
    per_cat = df.groupBy(cat_col).agg(
        F.sum(lbl).alias("__pos"),
        F.sum(1 - lbl).alias("__neg"),
    )
    tot = per_cat.agg(
        F.sum("__pos").alias("__tp"), F.sum("__neg").alias("__tn")
    )
    s = float(smoothing)
    j = per_cat.crossJoin(F.broadcast(tot))
    p_pos = (F.col("__pos") + s) / (F.col("__tp") + 2 * s)
    p_neg = (F.col("__neg") + s) / (F.col("__tn") + 2 * s)
    woe = F.log(p_pos / p_neg)
    return j.select(
        cat_col,
        F.col("__pos").cast("long").alias("n_pos"),
        F.col("__neg").cast("long").alias("n_neg"),
        F.round(woe, round_to).alias("woe"),
        F.round((p_pos - p_neg) * woe, round_to).alias("iv_term"),
    )


def one_hot(
    df: DataFrame,
    cat_col: str,
    top_n: int = 20,
    other_label: str = "other",
) -> DataFrame:
    """One-hot (dummy) encoding with a VOCABULARY CAP: indicator
    columns ``<cat_col>__<value>`` for the ``top_n`` most frequent
    values (deterministic tie-break on the value), everything else
    folded into ``<cat_col>__other`` — unbounded category domains
    are the classic accidental-wide-schema bug. The vocabulary is one
    combinable count aggregate collected as a ≤ top_n driver list;
    encoding is a fused codegen projection, no join, no shuffle."""
    vocab_rows = (
        df.groupBy(cat_col)
        .agg(F.count("*").alias("__n"))
        .orderBy(F.col("__n").desc(), F.col(cat_col).asc())
        .limit(top_n)
        .collect()
    )
    vocab = [r[cat_col] for r in vocab_rows if r[cat_col] is not None]
    out = df
    seen: dict[str, int] = {}
    for v in vocab:
        safe = str(v).replace(" ", "_")
        # distinct categories can sanitize to the same name ('a b' vs
        # 'a_b') — the second withColumn would silently overwrite the
        # first indicator; suffix collided names with an ordinal
        if safe in seen:
            seen[safe] += 1
            safe = f"{safe}__{seen[safe]}"
        else:
            seen[safe] = 0
        out = out.withColumn(
            f"{cat_col}__{safe}",
            # NULL category -> 0 on every indicator (== yields NULL)
            F.coalesce((F.col(cat_col) == F.lit(v)).cast("int"), F.lit(0)),
        )
    out = out.withColumn(
        f"{cat_col}__{other_label}",
        (
            F.col(cat_col).isNotNull()
            & ~F.col(cat_col).isin(*vocab) if vocab else F.col(cat_col).isNotNull()
        ).cast("int"),
    )
    return out
