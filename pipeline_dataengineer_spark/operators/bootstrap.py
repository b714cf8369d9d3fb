"""Deterministic Poisson bootstrap: confidence intervals at scale.

The classic bootstrap resamples n rows WITH replacement B times —
impossible to do literally on a distributed table (a resample is a
global permutation). The industry answer is the Poisson bootstrap:
each row enters replicate r with multiplicity ~ Poisson(1), which is
i.i.d. PER ROW — so a replicate is just a weighted aggregate, needs
no global coordination, and B replicates are ONE combinable
aggregation pass over ``rows × B`` exploded pairs (map-side combine
collapses them before the shuffle; the shuffle carries
``groups × B`` partials).

This implementation is additionally DETERMINISTIC and
engine-portable: the Poisson multiplicity comes from inverting the
Poisson(1) CDF on a Lehmer-hash uniform of (row id, replicate) —
``operators/sampling.py:portable_scramble`` arithmetic — with the CDF
thresholds written as exact double literals. Any engine replaying
the same integer hash and the same CASE ladder reproduces the exact
resamples, which is how the q_bootstrap_ci oracle hash-checks a
procedure that is textbook-"random".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pipeline_dataengineer_spark.operators.sampling import portable_scramble

# P(Poisson(1) <= k) for k = 0..7, as exact double literals (e^-1
# partial sums). Truncation at 8 biases P by < 1e-5 — far below
# bootstrap resolution at any practical B.
POISSON1_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
    0.9999897508033253,
]
_BUCKETS = 1_000_000


def poisson_multiplicity(u: Column) -> Column:
    """Poisson(1) multiplicity from a uniform in [0, 1) via the CDF
    ladder — identical CASE both engines."""
    expr = F.lit(len(POISSON1_CDF))
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        expr = F.when(u < F.lit(POISSON1_CDF[k]), F.lit(k)).otherwise(expr)
    return expr


def bootstrap_mean_ci(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    value_col: str,
    n_replicates: int = 200,
    lower_q: float = 0.025,
    upper_q: float = 0.975,
) -> DataFrame:
    """Per-group mean with a bootstrap CI:
    (group..., mean, ci_lo, ci_hi, n_replicates_used).

    One exploded combinable aggregate builds every replicate's
    weighted mean; percentiles over the B means give the interval
    (percentile bootstrap). Replicates whose Poisson weights sum to
    zero (only possible for tiny groups) yield NULL means and are
    excluded by the percentile — reported via n_replicates_used."""
    rep = F.explode(F.sequence(F.lit(0), F.lit(n_replicates - 1))).alias("__rep")
    base = df.select(*group_cols, id_col, value_col).select(
        *group_cols, id_col, value_col, rep
    )
    # NON-LINEAR scramble, not the affine Lehmer bucket: the affine
    # step is order-preserving with a constant stride, so within one
    # replicate consecutive ids would receive a fixed low-discrepancy
    # weight pattern (anticorrelated weights understate the bootstrap
    # variance) — the same hazard class fixed in sample_negatives.
    u = (
        F.pmod(
            portable_scramble(
                F.col(id_col).cast("long") * n_replicates
                + F.col("__rep")
            ),
            F.lit(_BUCKETS),
        ).cast("double")
        / _BUCKETS
    )
    weighted = base.withColumn("__w", poisson_multiplicity(u).cast("double"))
    # try_divide: a replicate whose Poisson weights all drew 0 (only
    # realistic for tiny groups — a 1-row group zeroes ~37% of
    # replicates) must yield the documented NULL mean, not ANSI
    # DIVIDE_BY_ZERO (doubles raise too — SCALE_NOTES round-6 note).
    rep_means = weighted.groupBy(*group_cols, "__rep").agg(
        F.try_divide(
            F.sum(F.col("__w") * F.col(value_col)), F.sum("__w")
        ).alias("__m")
    )
    cis = rep_means.groupBy(*group_cols).agg(
        F.round(F.percentile("__m", F.lit(lower_q)), 4).alias("ci_lo"),
        F.round(F.percentile("__m", F.lit(upper_q)), 4).alias("ci_hi"),
        F.count("__m").cast("long").alias("n_replicates_used"),
    )
    point = df.groupBy(*group_cols).agg(
        F.round(F.avg(value_col), 4).alias("mean")
    )
    return point.join(F.broadcast(cis), group_cols).select(
        *group_cols, "mean", "ci_lo", "ci_hi", "n_replicates_used"
    )
