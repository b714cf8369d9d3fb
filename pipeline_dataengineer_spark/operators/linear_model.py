"""Distributed linear-model training as combinable aggregates.

text_model.train_linear_classifier fits a text classifier on a
bounded driver-side sample (the right call for its 32k-dim sparse
hash space). This module is the complementary SCALE path: full-batch
gradient descent where each iteration is ONE map-side-combinable
aggregate over the entire dataset — the driver only ever holds the
d+1 coefficient scalars, never a row. The same shape Spark MLlib uses
under the hood (treeAggregate of per-partition gradient partials),
expressed in plain DataFrame aggregates so the plan is auditable:
no sample, no collect of data, iterations × one-pass jobs.

Determinism: fixed zero init, full-batch gradients (no SGD
shuffling), and every per-row expression is built-in JVM math — so a
fixed iteration count is exactly replayable, which is how the
contract oracle checks it (3 unrolled iterations in pure SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fit_logistic(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float,
    l2: float,
    iterations: int,
) -> tuple[list[float], float]:
    """The raw full-batch GD loop behind logistic_gd — returns the
    UNROUNDED (weights, bias) so composers (aipw_ate's propensity
    model) train on full precision; logistic_gd rounds only at its
    output edge."""
    d = len(feature_cols)
    if d == 0:
        raise ValueError("feature_cols must be non-empty")
    xs = [F.col(c).cast("double") for c in feature_cols]
    y = F.col(label_col).cast("double")
    w = [0.0] * d
    b = 0.0
    for _ in range(iterations):
        z = F.lit(b)
        for j in range(d):
            z = z + F.lit(w[j]) * xs[j]
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        r = df.agg(
            *[F.avg((p - y) * xs[j]).alias(f"g{j}") for j in range(d)],
            F.avg(p - y).alias("gb"),
        ).collect()[0]
        if r["gb"] is None:
            raise ValueError(
                "gradient fit: empty input (no non-NULL rows) - nothing to fit"
            )
        w = [w[j] - lr * (r[f"g{j}"] + l2 * w[j]) for j in range(d)]
        b = b - lr * r["gb"]
    return w, b


def logistic_gd(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = 0.5,
    l2: float = 0.0,
    iterations: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Full-batch logistic regression by gradient descent, fully
    distributed: per iteration,

        p_i = sigmoid(b + w·x_i)
        grad_j = mean((p_i − y_i)·x_ij) + l2·w_j
        w_j ← w_j − lr·grad_j          (bias: no l2)

    Labels must be 0/1. Returns ONE row:
    (n, w_<feature>..., bias, log_loss) with log_loss the final
    clipped binary cross-entropy under the trained weights.

    Scale: each iteration is a single combinable aggregate of d+1
    means — partial aggregation shrinks every partition to d+1
    doubles before the (1-row) shuffle; the driver holds only the
    coefficient vector between iterations, exactly the
    bounded-aggregate posture of pagerank/kmeans. d is the COLUMN
    count here (right up to hundreds of features); for very wide
    sparse spaces use text_model.train_linear_classifier's hashed
    representation instead."""
    w, b = _fit_logistic(df, feature_cols, label_col, lr, l2, iterations)
    d = len(feature_cols)
    xs = [F.col(c).cast("double") for c in feature_cols]
    y = F.col(label_col).cast("double")
    z = F.lit(b)
    for j in range(d):
        z = z + F.lit(w[j]) * xs[j]
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    eps = 1e-12
    pc = F.least(F.greatest(p, F.lit(eps)), F.lit(1.0 - eps))
    out = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.avg(-(y * F.ln(pc) + (F.lit(1.0) - y) * F.ln(1.0 - pc))),
            round_to,
        ).alias("log_loss"),
    )
    sel = [F.col("n")]
    for j, c in enumerate(feature_cols):
        sel.append(F.lit(round(w[j], round_to)).alias(f"w_{c}"))
    sel.append(F.lit(round(b, round_to)).alias("bias"))
    sel.append(F.col("log_loss"))
    return out.select(*sel)


def logistic_predict(
    df: DataFrame,
    weights: dict[str, float],
    bias: float,
    round_to: int = 6,
    out_col: str = "score",
) -> DataFrame:
    """Score rows under trained coefficients: one narrow projection,
    no shuffle — the apply side of logistic_gd (weights come from its
    single output row, or anywhere else)."""
    z = F.lit(bias)
    for c, wv in weights.items():
        z = z + F.lit(wv) * F.col(c).cast("double")
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return df.withColumn(out_col, F.round(p, round_to))


def quantile_regression_gd(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    tau: float = 0.5,
    lr: float = 0.5,
    iterations: int = 20,
    round_to: int = 6,
) -> DataFrame:
    """Linear quantile regression (pinball loss) by full-batch
    subgradient descent — fit the τ-th conditional quantile instead
    of the mean (p50/p95 latency curves, robust trend fits where OLS
    chases outliers):

        subgrad_j = mean((1{ŷ_i > y_i} − τ)·x_ij)
        (bias term: same with x ≡ 1)

    Same distributed shape as logistic_gd: each iteration is ONE
    combinable aggregate of d+1 means, driver holds only the
    coefficients. The indicator subgradient makes every per-row term
    one of two exactly-representable values times x, so a fixed
    iteration count replays exactly in SQL (the contract oracle
    unrolls it). Returns one row: (n, w_<f>..., bias, pinball)."""
    d = len(feature_cols)
    if d == 0:
        raise ValueError("feature_cols must be non-empty")
    xs = [F.col(c).cast("double") for c in feature_cols]
    y = F.col(label_col).cast("double")
    w = [0.0] * d
    b = 0.0
    for _ in range(iterations):
        pred = F.lit(b)
        for j in range(d):
            pred = pred + F.lit(w[j]) * xs[j]
        ind = F.when(pred > y, F.lit(1.0)).otherwise(F.lit(0.0))
        g = ind - F.lit(tau)
        r = df.agg(
            *[F.avg(g * xs[j]).alias(f"g{j}") for j in range(d)],
            F.avg(g).alias("gb"),
        ).collect()[0]
        if r["gb"] is None:
            raise ValueError(
                "gradient fit: empty input (no non-NULL rows) - nothing to fit"
            )
        w = [w[j] - lr * r[f"g{j}"] for j in range(d)]
        b = b - lr * r["gb"]
    pred = F.lit(b)
    for j in range(d):
        pred = pred + F.lit(w[j]) * xs[j]
    err = y - pred
    pin = F.when(err >= 0, F.lit(tau) * err).otherwise(
        (F.lit(tau) - 1.0) * err
    )
    out = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg(pin), round_to).alias("pinball"),
    )
    sel = [F.col("n")]
    for j, c in enumerate(feature_cols):
        sel.append(F.lit(round(w[j], round_to)).alias(f"w_{c}"))
    sel.append(F.lit(round(b, round_to)).alias("bias"))
    sel.append(F.col("pinball"))
    return out.select(*sel)


def poisson_gd(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = 0.1,
    iterations: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Poisson regression (log link) by full-batch gradient descent —
    count targets (events per user, defects per batch) where squared
    loss is wrong and logistic doesn't apply:

        μ_i = exp(b + w·x_i),  grad_j = mean((μ_i − y_i)·x_ij)

    Same one-combinable-aggregate-per-iteration shape as
    logistic_gd; deviance reported as the fit metric (y·ln(y/μ) −
    (y−μ), with the y=0 limit). Returns one row:
    (n, w_<f>..., bias, deviance)."""
    d = len(feature_cols)
    if d == 0:
        raise ValueError("feature_cols must be non-empty")
    xs = [F.col(c).cast("double") for c in feature_cols]
    y = F.col(label_col).cast("double")
    w = [0.0] * d
    b = 0.0
    for _ in range(iterations):
        z = F.lit(b)
        for j in range(d):
            z = z + F.lit(w[j]) * xs[j]
        mu = F.exp(z)
        r = df.agg(
            *[F.avg((mu - y) * xs[j]).alias(f"g{j}") for j in range(d)],
            F.avg(mu - y).alias("gb"),
        ).collect()[0]
        if r["gb"] is None:
            raise ValueError(
                "gradient fit: empty input (no non-NULL rows) - nothing to fit"
            )
        w = [w[j] - lr * r[f"g{j}"] for j in range(d)]
        b = b - lr * r["gb"]
    z = F.lit(b)
    for j in range(d):
        z = z + F.lit(w[j]) * xs[j]
    mu = F.exp(z)
    dev_term = (
        F.when(y > 0, y * F.ln(y / mu)).otherwise(F.lit(0.0))
        - (y - mu)
    )
    out = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.lit(2.0) * F.avg(dev_term), round_to).alias(
            "deviance"
        ),
    )
    sel = [F.col("n")]
    for j, c in enumerate(feature_cols):
        sel.append(F.lit(round(w[j], round_to)).alias(f"w_{c}"))
    sel.append(F.lit(round(b, round_to)).alias("bias"))
    sel.append(F.col("deviance"))
    return out.select(*sel)
