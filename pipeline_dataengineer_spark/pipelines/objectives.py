"""Mixture-of-denoisers corpus builder (UL2, Tay et al. 2022): each
document is deterministically assigned ONE training objective —
causal LM, fill-in-middle, span corruption, or prefix-LM — and
transformed accordingly, yielding the (input_text, target_text)
pairs a mixed-objective pretraining run consumes.

Assignment comes from a portable-scramble bucket over the cumulative
mixture weights (layout/engine-independent, a different salt from
the transforms' own internal draws so assignment and split points
stay uncorrelated). A document too short for its assigned transform
(empty, or a 1-char doc drawn for prefix-LM) falls back to causal —
every input row produces exactly one output row.

Plan shape: the source is scanned once per branch (four narrow
projections, no shuffle in any of them) and unioned; Catalyst
collapses each branch to a filter + fused projection, so the whole
builder costs four scan passes and zero exchanges — at 100 TB it is
still embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipeline_dataengineer_spark.operators.corpus import (
    fim_transform,
    prefix_lm_split,
    span_corruption,
)

_B = 1_000_000
_SALT = 7919  # assignment salt — distinct from transform-level draws


def build_objectives_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mix: dict[str, float] | None = None,
    n_spans: int = 3,
) -> DataFrame:
    """documents → (id, objective, input_text, target_text,
    input_len, target_len). ``mix`` maps objective name → weight over
    {causal, fim, span, prefix}; weights must sum to 1 (±1e-9)."""
    from pipeline_dataengineer_spark.operators.sampling import (
        portable_scramble,
    )

    mix = mix or {"causal": 0.4, "fim": 0.2, "span": 0.2, "prefix": 0.2}
    order = ["causal", "fim", "span", "prefix"]
    if set(mix) - set(order):
        raise ValueError(f"unknown objectives: {set(mix) - set(order)}")
    if abs(sum(mix.values()) - 1.0) > 1e-9:
        raise ValueError("mixture weights must sum to 1")
    draw = F.pmod(
        portable_scramble(F.col(id_col).cast("long") + _SALT),
        F.lit(_B),
    )
    acc = 0.0
    cond = {}
    for name in order:
        w = mix.get(name, 0.0)
        cond[name] = (draw >= F.lit(int(acc * _B))) & (
            draw < F.lit(int((acc + w) * _B))
        )
        acc += w
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )

    def row(objective, input_col, target_col):
        return F.struct(
            F.lit(objective).alias("objective"),
            input_col.alias("input_text"),
            target_col.alias("target_text"),
        )

    causal = base.filter(cond["causal"]).select(
        "doc_id", row("causal", F.col("text"), F.lit("")).alias("__r")
    )
    f = fim_transform(
        base.filter(cond["fim"]), "doc_id", "text", fim_rate=1.0
    )
    fim = f.select(
        "doc_id",
        F.when(
            F.col("fim_applied"),
            row("fim", F.col("fim_text"), F.lit("")),
        )
        .otherwise(row("causal", F.col("text"), F.lit("")))
        .alias("__r"),
    )
    s = span_corruption(
        base.filter(cond["span"]), "doc_id", "text", n_spans=n_spans
    )
    span = s.select(
        "doc_id",
        F.when(
            F.col("span_len").isNotNull(),
            row("span", F.col("corrupted"), F.col("targets")),
        )
        .otherwise(row("causal", F.col("text"), F.lit("")))
        .alias("__r"),
    )
    p = prefix_lm_split(base.filter(cond["prefix"]), "doc_id", "text")
    prefix = p.select(
        "doc_id",
        F.when(
            F.col("split_pos").isNotNull(),
            row("prefix", F.col("context"), F.col("continuation")),
        )
        .otherwise(row("causal", F.col("text"), F.lit("")))
        .alias("__r"),
    )
    out = causal.unionByName(fim).unionByName(span).unionByName(prefix)
    return out.select(
        "doc_id",
        F.col("__r.objective").alias("objective"),
        F.col("__r.input_text").alias("input_text"),
        F.col("__r.target_text").alias("target_text"),
        F.length("__r.input_text").alias("input_len"),
        F.length("__r.target_text").alias("target_len"),
    )
