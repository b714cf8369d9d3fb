"""Inter-rater agreement and pairwise-preference rating — the
annotation-quality half of an RLHF data pipeline (how much do the
raters agree?) and its model-ranking half (what do the pairwise
outcomes say about relative strength?).

- cohen_kappa: two fixed raters, chance-corrected agreement over the
  label contingency — κ = (p_o − p_e)/(1 − p_e). Facts reduce to one
  |labels|² cell table (combinable hash agg); everything after is
  cell-sized.
- fleiss_kappa: any number of raters per item (possibly varying —
  the generalized / Gwet formulation restricted to the classic
  equal-n case matches Fleiss exactly; this implementation requires
  a CONSTANT number of ratings per item and raises otherwise,
  because the classic κ is undefined for ragged panels). Facts →
  (item, label) counts → per-item agreement — two combinable aggs.
- bradley_terry: maximum-likelihood strengths from (winner, loser)
  pair counts via the classic MM update
  p_i ← W_i / Σ_j n_ij/(p_i + p_j), normalized each round
  (Hunter 2004). Each iteration is ONE aggregate over the PAIR-COUNT
  table (|items|² at worst, usually far sparser) with strengths
  broadcast as a literal map — the facts are touched once, at the
  initial pair-count reduction. Deterministic: fixed iterations,
  fixed init, no RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohen_kappa(
    df: DataFrame,
    rater_a_col: str,
    rater_b_col: str,
    round_to: int = 6,
) -> DataFrame:
    """One row: (kappa, p_observed, p_expected, n) over paired labels
    (one row per item with both raters' labels; NULL labels are real
    levels, matching chi2_association's convention)."""
    cells = df.groupBy(
        F.col(rater_a_col).alias("__a"), F.col(rater_b_col).alias("__b")
    ).agg(F.count(F.lit(1)).alias("__o"))
    row_m = cells.groupBy("__a").agg(F.sum("__o").alias("__ra"))
    col_m = cells.groupBy("__b").agg(F.sum("__o").alias("__cb"))
    # p_e sums ra(l)*cb(l) over ALL labels, including those where the
    # raters never agree (no observed (l,l) cell) — NOT a filter of
    # observed diagonal cells (which would drop those terms and
    # inflate kappa; disjoint raters must yield kappa = -p_e/(1-p_e),
    # e.g. -1 for a 2-label swap). Join-free: tag-union the two
    # margin tables and re-group by label (NULL is a real level —
    # groupBy keeps it, matching eqNullSafe margin alignment), then
    # one cell-sized product aggregate.
    tagged = row_m.select(
        F.col("__a").alias("__l"),
        F.col("__ra").alias("__mra"),
        F.lit(0).alias("__mcb"),
    ).unionByName(
        col_m.select(
            F.col("__b").alias("__l"),
            F.lit(0).alias("__mra"),
            F.col("__cb").alias("__mcb"),
        )
    )
    exp_num = (
        tagged.groupBy("__l")
        .agg(
            F.sum("__mra").alias("__ra"),
            F.sum("__mcb").alias("__cb"),
        )
        .agg(
            F.sum(
                F.col("__ra").cast("double") * F.col("__cb")
            ).alias("__exp_num")
        )
    )
    agg = (
        cells.agg(
            F.sum(
                F.when(
                    F.col("__a").eqNullSafe(F.col("__b")), F.col("__o")
                ).otherwise(0)
            ).alias("__agree"),
            F.sum("__o").alias("n"),
        )
        .crossJoin(F.broadcast(exp_num))
    )
    po = F.col("__agree") / F.col("n").cast("double")
    pe = F.col("__exp_num") / (
        F.col("n").cast("double") * F.col("n")
    )
    return agg.select(
        F.round(F.try_divide(po - pe, 1.0 - pe), round_to).alias(
            "kappa"
        ),
        F.round(po, round_to).alias("p_observed"),
        F.round(pe, round_to).alias("p_expected"),
        F.col("n").cast("long").alias("n"),
    )


def fleiss_kappa(
    df: DataFrame,
    item_col: str,
    label_col: str,
    round_to: int = 6,
) -> DataFrame:
    """One row: (kappa, p_observed, p_expected, n_items, n_raters)
    from long-form ratings (one row per (item, rating)). Requires
    every item to carry the same number of ratings (the classic
    Fleiss design); raises ValueError otherwise."""
    counts = df.groupBy(
        F.col(item_col).alias("__it"), F.col(label_col).alias("__l")
    ).agg(F.count(F.lit(1)).alias("__c"))
    per_item = counts.groupBy("__it").agg(
        F.sum("__c").alias("__ni"),
        F.sum(F.col("__c") * (F.col("__c") - 1)).alias("__pairs"),
    )
    spread = per_item.agg(
        F.min("__ni").alias("lo"), F.max("__ni").alias("hi")
    ).collect()[0]
    if spread["lo"] != spread["hi"]:
        raise ValueError(
            "fleiss_kappa: ratings per item vary "
            f"({spread['lo']}..{spread['hi']}); the classic Fleiss "
            "kappa requires a constant panel size per item."
        )
    n_rat = int(spread["hi"])
    if n_rat < 2:
        raise ValueError("fleiss_kappa: need >= 2 ratings per item")
    # P_i = Σ_c n_ic(n_ic - 1) / (n(n-1)); P̄_e = Σ_c p_c²
    p_obs = per_item.agg(
        F.avg(
            F.col("__pairs").cast("double") / (n_rat * (n_rat - 1))
        ).alias("po"),
        F.count(F.lit(1)).alias("n_items"),
    )
    # P̄_e = Σ_c p_c² = Σ_c tc² / (Σ_c tc)² — one cell-sized agg
    p_exp = (
        counts.groupBy("__l")
        .agg(F.sum("__c").alias("__tc"))
        .agg(
            (
                F.sum(
                    F.col("__tc").cast("double") * F.col("__tc")
                )
                / (F.sum("__tc") * F.sum("__tc")).cast("double")
            ).alias("pe")
        )
    )
    out = p_obs.crossJoin(F.broadcast(p_exp))
    return out.select(
        F.round(
            F.try_divide(
                F.col("po") - F.col("pe"), 1.0 - F.col("pe")
            ),
            round_to,
        ).alias("kappa"),
        F.round("po", round_to).alias("p_observed"),
        F.round("pe", round_to).alias("p_expected"),
        F.col("n_items").cast("long").alias("n_items"),
        F.lit(n_rat).cast("long").alias("n_raters"),
    )


def bradley_terry(
    df: DataFrame,
    winner_col: str,
    loser_col: str,
    iters: int = 20,
    round_to: int = 6,
    max_items: int = 100_000,
) -> DataFrame:
    """Bradley-Terry strengths from raw (winner, loser) rows via
    Hunter's MM algorithm. Returns (item, strength, wins, games),
    strengths normalized to mean 1 — the canonical gauge fixing.
    Items that only win or only lose have divergent/zero MLE
    strengths; the MM iteration keeps them finite for finite
    ``iters`` (document-and-cap, not epsilon-fudge).

    Scale shape: the facts reduce ONCE to (i, j, n_ij) unordered-pair
    counts plus per-item win counts (two combinable hash aggs). Each
    MM iteration aggregates the PAIR table against the current
    strengths broadcast as a literal MAP — cost per iteration is
    |pairs|, never |facts|, and only |items| doubles cross the
    driver per round (capped by ``max_items``, raising loudly
    beyond — rating a corpus-sized item set needs the sparse solver
    offline, not a silent 10⁸-entry literal)."""
    pairs = (
        df.select(
            F.col(winner_col).alias("__w"),
            F.col(loser_col).alias("__l"),
        )
        .filter(F.col("__w") != F.col("__l"))
        .groupBy("__w", "__l")
        .agg(F.count(F.lit(1)).alias("__n"))
        .persist()
    )
    wins = {
        r["__w"]: int(r["n"])
        for r in pairs.groupBy("__w")
        .agg(F.sum("__n").alias("n"))
        .collect()
    }
    games_pairs = (
        pairs.select(
            F.least("__w", "__l").alias("a"),
            F.greatest("__w", "__l").alias("b"),
            "__n",
        )
        .groupBy("a", "b")
        .agg(F.sum("__n").alias("n"))
        .collect()
    )
    items = sorted(
        set(wins)
        | {r["a"] for r in games_pairs}
        | {r["b"] for r in games_pairs}
    )
    if len(items) > max_items:
        pairs.unpersist()
        raise ValueError(
            f"bradley_terry: {len(items)} items exceeds "
            f"max_items={max_items}"
        )
    # driver-side MM over the collected pair counts: the pair table
    # is items²-bounded and already reduced; iterating in numpy on
    # ≤ max_items doubles beats 20 broadcast-rebuild Spark rounds
    # for anything that fits the cap (same bounded-driver contract
    # as the d×d covariance collect).
    import numpy as np

    idx = {it: i for i, it in enumerate(items)}
    m = len(items)
    w_arr = np.zeros(m)
    for it, n in wins.items():
        w_arr[idx[it]] = n
    a_idx = np.array([idx[r["a"]] for r in games_pairs], dtype=np.int64)
    b_idx = np.array([idx[r["b"]] for r in games_pairs], dtype=np.int64)
    n_ab = np.array([float(r["n"]) for r in games_pairs])
    p = np.ones(m)
    for _ in range(iters):
        denom = np.zeros(m)
        contrib = n_ab / (p[a_idx] + p[b_idx])
        np.add.at(denom, a_idx, contrib)
        np.add.at(denom, b_idx, contrib)
        with np.errstate(divide="ignore", invalid="ignore"):
            p_new = np.where(denom > 0, w_arr / denom, 0.0)
        mean = p_new[p_new > 0].mean() if (p_new > 0).any() else 1.0
        p = p_new / mean if mean > 0 else p_new
    games = np.zeros(m)
    np.add.at(games, a_idx, n_ab)
    np.add.at(games, b_idx, n_ab)
    pairs.unpersist()
    spark = df.sparkSession
    rows = [
        (items[i], round(float(p[i]), round_to), int(w_arr[i]),
         int(games[i]))
        for i in range(m)
    ]
    id_type = df.select(F.col(winner_col)).schema[0].dataType.simpleString()
    return spark.createDataFrame(
        rows,
        f"item {id_type}, strength double, wins long, games long",
    )


def krippendorff_alpha(
    df: DataFrame,
    item_col: str,
    label_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Krippendorff's α for NOMINAL data over long-form ratings (one
    row per (item, rating)) — the agreement coefficient that, unlike
    Fleiss' κ, accepts RAGGED panels (items rated by different
    numbers of raters; items with a single rating contribute nothing
    and are excluded, per the standard formulation).

        α = 1 − D_o / D_e, with (nominal metric)
        D_o = Σ_i [n_i(n_i−1) − Σ_c n_ic(n_ic−1)] / (n_i − 1) / N
        D_e = [N(N−1) − Σ_c n_c(n_c−1)] / (N(N−1))

    where N = Σ pairable ratings. Everything is two combinable
    hash aggs over (item, label) counts — the facts are touched
    once, cells after."""
    counts = (
        df.groupBy(
            F.col(item_col).alias("__it"), F.col(label_col).alias("__l")
        )
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    per_item = counts.groupBy("__it").agg(
        F.sum("__c").alias("__ni"),
        F.sum(F.col("__c") * (F.col("__c") - 1)).alias("__match"),
    ).filter(F.col("__ni") >= 2)
    obs = per_item.agg(
        F.sum(
            (
                F.col("__ni") * (F.col("__ni") - 1) - F.col("__match")
            ).cast("double")
            / (F.col("__ni") - 1)
        ).alias("__do_num"),
        F.sum("__ni").alias("__N"),
        F.count(F.lit(1)).alias("n_items"),
    )
    # pairable label totals: recompute label counts over ONLY items
    # with >= 2 ratings (single-rating items are excluded everywhere)
    lbl = (
        counts.join(
            F.broadcast(per_item.select("__it")), "__it", "left_semi"
        )
        .groupBy("__l")
        .agg(F.sum("__c").alias("__tc"))
        .agg(
            F.sum(
                F.col("__tc").cast("double") * (F.col("__tc") - 1)
            ).alias("__match_e")
        )
    )
    out = obs.crossJoin(F.broadcast(lbl))
    n = F.col("__N").cast("double")
    d_o = F.col("__do_num") / n
    d_e = (n * (n - 1) - F.col("__match_e")) / (n * (n - 1))
    return out.select(
        F.round(
            1.0 - F.try_divide(d_o, d_e), round_to
        ).alias("alpha"),
        F.round(d_o, round_to).alias("d_observed"),
        F.round(d_e, round_to).alias("d_expected"),
        F.col("__N").cast("long").alias("n_ratings"),
        F.col("n_items").cast("long").alias("n_items"),
    )
