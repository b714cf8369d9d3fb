"""Classification evaluation — the confusion-matrix family that
complements the threshold-free metrics in operators/calibration.py
(ROC-AUC / AP / Brier / ECE score the probabilities; these score the
DECISIONS).

All pure relational algebra over one |labels|²-bounded cell table:
ONE combinable hash agg over the facts, then every metric — per-class
precision/recall/F1, accuracy, macro/micro/weighted averages — is
cell-sized arithmetic. No window, no join over the facts, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_matrix(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """(label, pred, n) cells — the raw contingency. NULLs are real
    levels (a model that predicts NULL is a bug worth counting)."""
    return df.groupBy(
        F.col(label_col).alias("label"), F.col(pred_col).alias("pred")
    ).agg(F.count(F.lit(1)).alias("n"))


def classification_report(
    df: DataFrame,
    label_col: str,
    pred_col: str,
    round_to: int = 6,
) -> DataFrame:
    """One row per class: (class, tp, fp, fn, support, precision,
    recall, f1) — sklearn.metrics.classification_report semantics
    (zero_division=0 → NULL here, via try_divide: a class never
    predicted has NULL precision, which is more honest than 0).
    Classes = union of observed labels and predictions."""
    cells = confusion_matrix(df, label_col, pred_col)
    per_label = cells.groupBy("label").agg(
        F.sum("n").alias("support"),
        F.sum(
            F.when(F.col("label").eqNullSafe(F.col("pred")), F.col("n"))
            .otherwise(0)
        ).alias("tp"),
    )
    per_pred = cells.groupBy("pred").agg(F.sum("n").alias("__pred_n"))
    classes = (
        per_label.select(F.col("label").alias("class"))
        .unionByName(per_pred.select(F.col("pred").alias("class")))
        .distinct()
    )
    out = (
        classes.join(
            per_label.withColumnRenamed("label", "class"),
            "class",
            "left",
        )
        .join(
            per_pred.withColumnRenamed("pred", "class"), "class", "left"
        )
        .select(
            "class",
            F.coalesce(F.col("tp"), F.lit(0)).cast("long").alias("tp"),
            (
                F.coalesce(F.col("__pred_n"), F.lit(0))
                - F.coalesce(F.col("tp"), F.lit(0))
            )
            .cast("long")
            .alias("fp"),
            (
                F.coalesce(F.col("support"), F.lit(0))
                - F.coalesce(F.col("tp"), F.lit(0))
            )
            .cast("long")
            .alias("fn"),
            F.coalesce(F.col("support"), F.lit(0))
            .cast("long")
            .alias("support"),
        )
    )
    prec = F.try_divide(F.col("tp").cast("double"), F.col("tp") + F.col("fp"))
    rec = F.try_divide(F.col("tp").cast("double"), F.col("tp") + F.col("fn"))
    f1 = F.try_divide(2 * prec * rec, prec + rec)
    return out.select(
        "class",
        "tp",
        "fp",
        "fn",
        "support",
        F.round(prec, round_to).alias("precision"),
        F.round(rec, round_to).alias("recall"),
        F.round(f1, round_to).alias("f1"),
    )


def classification_summary(
    df: DataFrame,
    label_col: str,
    pred_col: str,
    round_to: int = 6,
) -> DataFrame:
    """One row: (accuracy, macro_precision, macro_recall, macro_f1,
    weighted_f1, n, n_classes). Macro averages over classes with
    support > 0 (sklearn's convention: prediction-only classes count
    in the report but not the macro denominators); NULL per-class
    metrics (never-predicted classes) count as 0 in the averages —
    sklearn zero_division=0 parity."""
    rep = classification_report(df, label_col, pred_col, round_to=12)
    sup = rep.filter(F.col("support") > 0)
    agg = sup.agg(
        F.sum("tp").alias("__tp"),
        F.sum("support").alias("n"),
        F.count(F.lit(1)).alias("n_classes"),
        F.avg(F.coalesce(F.col("precision"), F.lit(0.0))).alias(
            "__mp"
        ),
        F.avg(F.coalesce(F.col("recall"), F.lit(0.0))).alias("__mr"),
        F.avg(F.coalesce(F.col("f1"), F.lit(0.0))).alias("__mf"),
        (
            F.sum(
                F.coalesce(F.col("f1"), F.lit(0.0)) * F.col("support")
            )
            / F.sum("support")
        ).alias("__wf"),
    )
    return agg.select(
        F.round(F.col("__tp") / F.col("n").cast("double"), round_to)
        .alias("accuracy"),
        F.round("__mp", round_to).alias("macro_precision"),
        F.round("__mr", round_to).alias("macro_recall"),
        F.round("__mf", round_to).alias("macro_f1"),
        F.round("__wf", round_to).alias("weighted_f1"),
        F.col("n").cast("long").alias("n"),
        F.col("n_classes").cast("long").alias("n_classes"),
    )
