"""Linear text classifiers at corpus scale — the fastText/CCNet-family
quality filter.

LLM data pipelines gate documents with cheap linear models over
bag-of-words features (fastText quality classifiers in CCNet, GPT-3's
WebText-vs-CommonCrawl filter, Dolma's taggers). The expensive part is
APPLYING the model to 100 TB, not training it — industry practice
trains on a bounded sample. The shape here mirrors the in-repo BPE
tokenizer (operators/bpe.py): learn driver-side on a sample, apply
corpus-wide as pure JVM relational algebra.

Apply path (zero Python in the hot loop):
  tokenize (codegen regexp split) → explode → feature id (xxhash64 %
  dim, JVM-side) → broadcast-join the (feature, weight) table → one
  map-side-combinable groupBy sum per doc → sigmoid. The corpus
  shuffles ONCE on doc_id for the sum (and that aggregation is
  partial/combinable); weights are model-sized, always broadcast.

Training: featurize the SAMPLE in Spark with the SAME hash pipeline
(so train/apply can never disagree on feature ids), collect only the
sample's sparse features, run logistic regression in numpy on the
driver. Weights go back out as a broadcast table, never a closure
over a big array.

No reference counterpart (SURVEY.md §2 — the reference has no ML
surface); north-star extension alongside dedup/quality scoring.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^\\p{L}\\p{Nd}]+"


def _doc_features(df: DataFrame, id_col: str, text_col: str, dim: int) -> DataFrame:
    """(id, feature, n) sparse counts: lowercase → split → explode →
    xxhash64 bucket. Pure codegen; rides the scan."""
    return (
        df.select(
            F.col(id_col).alias("__id"),
            F.explode(
                F.split(F.lower(F.col(text_col)), TOKEN_SPLIT)
            ).alias("__tok"),
        )
        .filter(F.col("__tok") != "")
        .select(
            "__id", F.pmod(F.xxhash64("__tok"), F.lit(dim)).alias("feature")
        )
        .groupBy("__id", "feature")
        .agg(F.count("*").alias("n"))
    )


def apply_linear_text_model(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: DataFrame,
    bias: float = 0.0,
    dim: int = 2**18,
    score_col: str = "score",
) -> DataFrame:
    """Score every document with a linear model over hashed
    bag-of-words counts: sigmoid(bias + sum_t n_t * w[h(t)]).

    ``weights`` is a (feature: long, weight: double) DataFrame —
    model-sized, so it broadcasts; the corpus side never shuffles for
    the join. Tokens whose bucket is absent from ``weights`` score 0.
    Output: (id_col, score_col) — one row per input document; docs
    with no tokens score sigmoid(bias).
    """
    feats = _doc_features(df, id_col, text_col, dim)
    scored = (
        feats.join(F.broadcast(weights), "feature", "left")
        .groupBy("__id")
        .agg(
            F.sum(
                F.col("n") * F.coalesce(F.col("weight"), F.lit(0.0))
            ).alias("__dot")
        )
    )
    # left join back to the id spine so token-free docs still score
    ids = df.select(F.col(id_col).alias("__id")).distinct()
    out = ids.join(scored, "__id", "left").select(
        F.col("__id").alias(id_col),
        (
            F.lit(1.0)
            / (1.0 + F.exp(-(F.coalesce(F.col("__dot"), F.lit(0.0)) + bias)))
        ).alias(score_col),
    )
    return out


def train_linear_classifier(
    spark: SparkSession,
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    dim: int = 2**15,
    sample_n: int = 20_000,
    l2: float = 1e-4,
    lr: float = 0.5,
    iters: int = 200,
) -> tuple[DataFrame, float]:
    """Learn (weights DataFrame, bias) by logistic regression on a
    bounded deterministic sample. Featurization runs IN SPARK through
    the same ``_doc_features`` hash pipeline as apply — train and
    apply cannot disagree on feature ids. Only the sample's sparse
    triples (≤ sample_n docs' tokens) and the final dim-sized weight
    vector cross the driver boundary.

    Labels must be 0/1. Deterministic: fixed init, full-batch
    gradient descent, ordered sample (no RNG anywhere).
    """
    sample = (
        df.select(id_col, text_col, label_col)
        .orderBy(id_col)
        .limit(sample_n)
    )
    sample = sample.localCheckpoint(eager=True)  # cut lineage; read twice
    feats = _doc_features(sample, id_col, text_col, dim)
    rows = feats.orderBy("__id", "feature").collect()
    labels = {
        r[id_col]: float(r[label_col])
        for r in sample.select(id_col, label_col).collect()
    }
    ids = sorted(labels)
    idx = {d: i for i, d in enumerate(ids)}
    n_docs = len(ids)
    # COO sparse triples, not a dense n_docs x dim matrix: the doc
    # features are >99% zeros, and the dense buffer at the default
    # 20k x 32768 was ~5.2 GB of driver heap for ~50 MB of payload
    # (round-5 VERDICT item 4). All the GD matvecs below are exact
    # bincount scatter-adds over the nnz triples — O(nnz) memory and
    # time, no scipy dependency.
    nnz = len(rows)
    r_idx = np.fromiter(
        (idx[r["__id"]] for r in rows), dtype=np.int64, count=nnz
    )
    c_idx = np.fromiter(
        (r["feature"] for r in rows), dtype=np.int64, count=nnz
    )
    vals = np.fromiter(
        (float(r["n"]) for r in rows), dtype=np.float64, count=nnz
    )
    # L2-normalize counts per doc (fastText-style) so long docs don't
    # dominate the gradient
    norms = np.sqrt(
        np.bincount(r_idx, weights=vals * vals, minlength=n_docs)
    )
    norms[norms == 0] = 1.0
    vals = vals / norms[r_idx]
    y = np.array([labels[d] for d in ids])
    w = np.zeros(dim)
    b = 0.0
    for _ in range(iters):
        # z = X @ w  (scatter-add of the nnz products per doc row)
        z = np.bincount(
            r_idx, weights=vals * w[c_idx], minlength=n_docs
        ) + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        # gw = X.T @ g (scatter-add per feature column)
        gw = (
            np.bincount(c_idx, weights=vals * g[r_idx], minlength=dim)
            / n_docs
            + l2 * w
        )
        gb = float(g.mean())
        w -= lr * gw
        b -= lr * gb
    nz = np.flatnonzero(w)
    weights = spark.createDataFrame(
        [(int(f), float(w[f])) for f in nz], "feature long, weight double"
    )
    return weights, float(b)


def lexicon_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lexicon: DataFrame,
    score_col: str = "score",
) -> DataFrame:
    """Interpretable cousin of the hashed model: sum the weights of
    lexicon terms present (with multiplicity) in each document.
    ``lexicon`` is (term: string, weight: double) — dictionary-sized,
    broadcast. Same plan shape as ``apply_linear_text_model`` but
    joined on the raw term, so results are engine-portable (the
    contract oracle replays it in DuckDB SQL exactly).

    ``explode_outer`` over the empty-stripped token array keeps
    token-free documents as a NULL-term row, so ONE broadcast join +
    ONE combinable groupBy covers every doc — no second doc-sized
    spine join (which would be a sort-merge join at corpus scale)."""
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode_outer(
            F.array_remove(
                F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), ""
            )
        ).alias("term"),
    )
    return (
        toks.join(F.broadcast(lexicon), "term", "left")
        .groupBy("__id")
        .agg(
            F.coalesce(
                F.round(F.sum("weight"), 6), F.lit(0.0)
            ).alias(score_col)
        )
        .withColumnRenamed("__id", id_col)
    )
