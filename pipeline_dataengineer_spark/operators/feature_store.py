"""Point-in-time training-matrix assembly (feature-store retrieval).

The ML-platform staple: given a SPINE of (entity, as_of_time) label
rows and N feature tables of timestamped observations, attach to
each spine row the most recent value of every feature AT OR BEFORE
its as_of time — never after (future leakage silently inflates
offline metrics and dies in production; the as-of bound is the whole
point). Feast/Tecton call this "point-in-time correct join"; the
SCD2 equivalent is ``operators/scd.py:scd2_lookup``.

Spark shape: one ``asof_join`` per feature table — each is a single
shuffle on the entity key (union + ordered window, no range
explosion; see joins.py). Feature tables join one after another, so
the spine is sequentially enriched; Catalyst pipelines the per-key
windows, and every stage keys on the same entity column so AQE
reuses the partitioning where it can. ``max_age`` turns a stale
match into NULL (a feature older than the horizon is usually worse
than missing)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pipeline_dataengineer_spark.operators.joins import asof_join


@dataclass
class FeatureTable:
    df: DataFrame
    key: str            # entity column (must match the spine's)
    ts: str             # observation time column
    values: list[str]   # feature columns to carry
    prefix: str = ""    # output name prefix (collision control)
    max_age: str | None = None  # e.g. "30 days": older matches -> NULL


def build_training_matrix(
    spine: DataFrame,
    key: str,
    as_of: str,
    features: list[FeatureTable],
) -> DataFrame:
    """Attach every feature table's point-in-time values to the spine.
    Output = spine columns + per-feature ``<prefix><value>`` columns
    (+ ``<prefix>__ts`` observation time, for staleness audits)."""
    out = spine
    for i, ft in enumerate(features):
        p = ft.prefix or f"f{i}_"
        ts_out = f"{p}__ts"
        right = ft.df.select(
            F.col(ft.key).alias(key),
            F.col(ft.ts).alias(ts_out),
            *[F.col(v).alias(f"{p}{v}") for v in ft.values],
        )
        out = asof_join(out, right, key, as_of, ts_out)
        if ft.max_age is not None:
            fresh = F.col(ts_out) >= F.col(as_of) - F.expr(
                f"INTERVAL {ft.max_age}"
            )
            for v in ft.values:
                out = out.withColumn(
                    f"{p}{v}",
                    F.when(fresh, F.col(f"{p}{v}")),
                )
            out = out.withColumn(
                ts_out, F.when(fresh, F.col(ts_out))
            )
    return out


def make_lag_features(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    lags: tuple[int, ...] = (1, 7),
    roll_windows: tuple[int, ...] = (7,),
    round_to: int = 6,
) -> DataFrame:
    """The standard supervised-learning feature bundle over a keyed
    series: per (key, t) adds lag_{k} (value k steps back), diff_1
    (value − lag_1), and roll{w}_mean / roll{w}_min / roll{w}_max
    over the TRAILING w rows EXCLUDING the current one (no target
    leakage — every feature is computable strictly before t).

    One shuffle on the key; every feature rides the same sorted
    window, so the whole bundle costs exactly one WindowExec pass.
    NULL where history is short (model code decides imputation)."""
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    out = df
    v = F.col(value_col)
    for k in lags:
        out = out.withColumn(f"lag_{k}", F.lag(v, k).over(w))
    out = out.withColumn(
        "diff_1", F.round(v - F.col("lag_1"), round_to)
        if 1 in lags
        else F.round(v - F.lag(v, 1).over(w), round_to)
    )
    for win in roll_windows:
        frame = w.rowsBetween(-win, -1)
        out = (
            out.withColumn(
                f"roll{win}_mean",
                F.round(F.avg(v).over(frame), round_to),
            )
            .withColumn(f"roll{win}_min", F.min(v).over(frame))
            .withColumn(f"roll{win}_max", F.max(v).over(frame))
        )
    return out
