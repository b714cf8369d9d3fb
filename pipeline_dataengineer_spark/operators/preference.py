"""Preference-pair construction — the RLHF/DPO data-prep step that
turns scored candidate responses into (chosen, rejected) training
pairs.

Input shape: one row per (group, item) with a score — e.g. prompt ×
sampled response × reward-model score. Two pairing policies:

- best_worst_pairs: ONE pair per group, chosen = argmax score,
  rejected = argmin (the standard DPO recipe when k responses were
  sampled per prompt). One combinable hash aggregate over the facts —
  no window, no join; ties broken deterministically by item id folded
  into a struct ordering (max side: higher id wins; min side: lower
  id wins), so re-runs and engines agree.
- all_pairs: every (higher, lower) pair within a group whose score
  gap ≥ min_margin — the dense variant for listwise data. This is a
  within-group self-join (quadratic in group size), so the group size
  is capped by ``max_group_size``: oversized groups are DROPPED with
  an audited count (same enforced-cap + reported-audit pattern as
  link_records / the LSH bucket cap), never silently exploded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def best_worst_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    score_col: str,
    min_margin: float = 0.0,
) -> DataFrame:
    """One row per group: (group, chosen, chosen_score, rejected,
    rejected_score, margin), keeping only groups with ≥ 2 items and
    margin ≥ min_margin. Deterministic under score ties (struct
    ordering carries the item id)."""
    s = F.col(score_col).cast("double")
    hi = F.max(F.struct(s.alias("s"), F.col(item_col).alias("i")))
    lo = F.min(F.struct(s.alias("s"), F.col(item_col).alias("i")))
    agg = df.groupBy(group_col).agg(
        hi.alias("__hi"), lo.alias("__lo"), F.count(F.lit(1)).alias("__n")
    )
    return (
        agg.filter(F.col("__n") >= 2)
        .select(
            group_col,
            F.col("__hi.i").alias("chosen"),
            F.col("__hi.s").alias("chosen_score"),
            F.col("__lo.i").alias("rejected"),
            F.col("__lo.s").alias("rejected_score"),
            (F.col("__hi.s") - F.col("__lo.s")).alias("margin"),
        )
        .filter(F.col("margin") >= min_margin)
    )


def all_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    score_col: str,
    min_margin: float = 0.0,
    max_group_size: int = 64,
) -> DataFrame:
    """Every within-group (chosen, rejected) pair with
    chosen_score − rejected_score ≥ min_margin (strictly positive
    margins only when min_margin == 0 — equal scores express no
    preference). Groups larger than ``max_group_size`` are dropped
    and reported on the returned frame's ``.pair_audit``
    ``{"dropped_groups", "dropped_rows", "max_dropped_group"}`` —
    a quadratic group is a data bug upstream, not a packing job."""
    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(item_col).alias("__i"),
        F.col(score_col).cast("double").alias("__s"),
    )
    sizes = base.groupBy("__g").agg(F.count(F.lit(1)).alias("__n"))
    oversized = sizes.filter(F.col("__n") > max_group_size).persist()
    stats = oversized.agg(
        F.count(F.lit(1)).alias("g"),
        F.coalesce(F.sum("__n"), F.lit(0)).alias("r"),
        F.coalesce(F.max("__n"), F.lit(0)).alias("m"),
    ).collect()[0]
    audit = {
        "dropped_groups": int(stats["g"]),
        "dropped_rows": int(stats["r"]),
        "max_dropped_group": int(stats["m"]),
    }
    if audit["dropped_groups"]:
        import logging

        logging.getLogger(__name__).warning(
            "all_pairs: dropped %d groups larger than %d items "
            "(largest %d) — pairs within them would be quadratic.",
            audit["dropped_groups"],
            max_group_size,
            audit["max_dropped_group"],
        )
        base = base.join(
            F.broadcast(oversized.select("__g")), "__g", "left_anti"
        )
    oversized.unpersist()
    a, b = base.alias("a"), base.alias("b")
    margin = F.col("a.__s") - F.col("b.__s")
    floor = (
        margin >= min_margin if min_margin > 0 else margin > 0.0
    )
    out = (
        a.join(b, F.col("a.__g") == F.col("b.__g"))
        .filter(floor)
        .select(
            F.col("a.__g").alias(group_col),
            F.col("a.__i").alias("chosen"),
            F.col("a.__s").alias("chosen_score"),
            F.col("b.__i").alias("rejected"),
            F.col("b.__s").alias("rejected_score"),
            margin.alias("margin"),
        )
    )
    out.pair_audit = audit
    return out
