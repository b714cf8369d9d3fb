"""Slowly-changing-dimension (SCD type 2) construction from a change
stream.

Generalizes the reference's incremental-ingest pattern (watermark +
anti-join append, ``src/spark_pgsql/spark_streaming.py:80-90``) to the
warehouse-standard history table: instead of keeping only the latest
row per key, keep every *change* with a validity interval
[valid_from, valid_to) and an is_current flag.

Plan shape: one shuffle on the key (both window passes share the same
partitioning, so Catalyst plans a single Exchange), narrow everywhere
else — holds at 100 TB as long as per-key history fits a partition,
which AQE skew-split handles for hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changes(
    df: DataFrame,
    key: str | list[str],
    order_col: str,
    attrs: list[str],
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Build SCD2 validity intervals from a change/event stream.

    1. Collapse no-change rows: a row opens a new version only when at
       least one tracked attribute differs (null-safely) from the
       previous row of the same key — or it is the key's first row.
    2. Interval close: valid_to = next version's valid_from (half-open
       interval); the open version has valid_to NULL / is_current.

    ``order_col`` must be unique per key (event id, ingest sequence) —
    the reference's arrival-order semantics made deterministic, same
    move as dedup_last_wins.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(order_col)

    prev_cols = [F.lag(F.col(a)).over(w).alias(f"__prev_{a}") for a in attrs]
    base = df.select(*keys, order_col, *attrs).select(
        "*", F.row_number().over(w).alias("__rn"), *prev_cols
    )
    changed = F.col("__rn") == 1
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.col(f"__prev_{a}"))

    versions = base.filter(changed).select(
        *keys, F.col(order_col).alias(valid_from), *attrs
    )
    w2 = Window.partitionBy(*keys).orderBy(valid_from)
    return versions.withColumn(
        valid_to, F.lead(valid_from).over(w2)
    ).withColumn(current_col, F.col(valid_to).isNull())


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key: str | list[str],
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Point-in-time (as-at) join: attach to each fact row the dim
    version whose half-open validity interval ``[valid_from,
    valid_to)`` contains the fact's ``ts_col`` (open version matches
    everything at or after its valid_from).

    This is the lookup side of SCD2 — the fact stream never sees
    future attribute values (no leakage), the standard requirement
    for training-feature backfills. Implementation is a plain
    equi-join on the business key with the interval predicate as a
    residual: per-key version counts are small and bounded (version
    history, not data volume), so the equi-join shuffle on ``key`` IS
    the scale plan — no bucketing machinery needed, unlike the
    unkeyed ``range_join``. Validity intervals per key are disjoint
    by construction (scd2_from_changes), so each fact matches at most
    one version and row multiplicity is preserved.

    ``how='left'`` keeps facts dated before their key's first version
    (dim columns NULL), matching LEFT JOIN semantics in the oracle.
    """
    keys = [key] if isinstance(key, str) else list(key)
    # alias both sides: facts and dim often share lineage (dim built
    # from the same base frame), which otherwise makes facts[k] ==
    # dim[k] ambiguous / trivially-true in Spark's resolver
    f = facts.alias("__scd_f")
    d = dim.alias("__scd_d")
    cond = None
    for k in keys:
        c = F.col(f"__scd_f.{k}") == F.col(f"__scd_d.{k}")
        cond = c if cond is None else cond & c
    ts = F.col(f"__scd_f.{ts_col}")
    vf = F.col(f"__scd_d.{valid_from}")
    vt = F.col(f"__scd_d.{valid_to}")
    cond = cond & (ts >= vf) & (vt.isNull() | (ts < vt))
    out = f.join(d, cond, how)
    return out.drop(*[F.col(f"__scd_d.{k}") for k in keys])
