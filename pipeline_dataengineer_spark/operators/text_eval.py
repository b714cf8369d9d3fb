"""Generation-evaluation metrics over (reference, hypothesis) text
pairs — the eval half of an SFT/RLHF pipeline (the data-prep half is
pipelines/sft_dataset.py and operators/preference.py).

- bleu_corpus: corpus-level BLEU-4 (Papineni 2002), single reference
  per hypothesis, no smoothing (the canonical definition: any empty
  n-gram precision zeroes the score). ENTIRELY JVM array algebra:
  whitespace tokens via split, n-grams via
  transform(sequence)/slice/concat_ws, clipped matches via a
  (row, n, gram)-keyed hash join of the two count tables. No UDF,
  no window, no collect — corpus totals are one combinable agg.
- rouge_l: per-pair ROUGE-L (LCS-based precision/recall/F1).
  LCS is an O(|ref|·|hyp|) dynamic program — not expressible in
  relational algebra — so it runs as an Arrow-batched kernel in
  mapInPandas, O(1) state per pair, embarrassingly parallel.
  ``max_tokens`` truncates both sides first (quadratic cost needs an
  enforced bound, same fail-safe-with-cap convention as the LSH
  bucket caps); truncation is reported per row so it is never
  silent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _tokens(col):
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    return F.filter(
        F.split(c, r"\s+"), lambda t: t != F.lit("")
    )


def _ngrams(tok_col, n: int):
    size = F.size(tok_col)
    return F.when(
        size >= n,
        F.transform(
            F.sequence(F.lit(1), size - n + 1),
            lambda i: F.concat_ws(" ", F.slice(tok_col, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def bleu_corpus(
    df: DataFrame,
    id_col: str,
    ref_col: str,
    hyp_col: str,
    max_n: int = 4,
    round_to: int = 6,
) -> DataFrame:
    """One row: (bleu, brevity_penalty, p_1..p_max_n, hyp_tokens,
    ref_tokens, n_pairs). Whitespace tokenization; modified n-gram
    precision clips each hypothesis n-gram count at its count in
    THAT row's reference."""
    base = df.select(
        F.col(id_col).alias("__id"),
        _tokens(ref_col).alias("__rt"),
        _tokens(hyp_col).alias("__ht"),
    )
    lens = base.agg(
        F.sum(F.size("__ht")).alias("__c"),
        F.sum(F.size("__rt")).alias("__r"),
        F.count(F.lit(1)).alias("n_pairs"),
    )

    def gram_counts(tok: str, out: str):
        arrs = base.select(
            "__id",
            F.explode(
                F.arrays_zip(
                    F.array(*[F.lit(n) for n in range(1, max_n + 1)]),
                    F.array(*[_ngrams(F.col(tok), n) for n in range(1, max_n + 1)]),
                )
            ).alias("__z"),
        ).select(
            "__id",
            F.col("__z.0").alias("__n"),
            F.explode("__z.1").alias("__g"),
        )
        return arrs.groupBy("__id", "__n", "__g").agg(
            F.count(F.lit(1)).alias(out)
        )

    hyp = gram_counts("__ht", "__hc")
    ref = gram_counts("__rt", "__rc")
    joined = hyp.join(ref, ["__id", "__n", "__g"], "left")
    per_n = joined.groupBy("__n").agg(
        F.sum(
            F.least(F.col("__hc"), F.coalesce(F.col("__rc"), F.lit(0)))
        ).alias("__match"),
        F.sum("__hc").alias("__total"),
    )
    # assemble the max_n precisions as one tiny pivoted row
    pivoted = per_n.groupBy().pivot(
        "__n", list(range(1, max_n + 1))
    ).agg(F.first(F.col("__match") / F.col("__total")))
    out = pivoted.crossJoin(F.broadcast(lens))
    log_sum = None
    for n in range(1, max_n + 1):
        p = F.coalesce(F.col(str(n)), F.lit(0.0))
        term = F.when(p > 0, F.log(p)).otherwise(F.lit(None))
        log_sum = term if log_sum is None else log_sum + term
    # try_divide: an all-empty-hypothesis corpus has __c = 0 — the
    # penalty degrades to NULL (bleu coalesces to 0.0) instead of
    # raising ANSI DIVIDE_BY_ZERO (repo convention, cf. lift_gains).
    bp = F.when(F.col("__c") > F.col("__r"), F.lit(1.0)).otherwise(
        F.exp(
            1.0
            - F.try_divide(F.col("__r").cast("double"), F.col("__c"))
        )
    )
    bleu = F.coalesce(
        bp * F.exp(log_sum / float(max_n)), F.lit(0.0)
    )
    sel = [
        F.round(bleu, round_to).alias("bleu"),
        F.round(bp, round_to).alias("brevity_penalty"),
    ]
    for n in range(1, max_n + 1):
        sel.append(
            F.round(
                F.coalesce(F.col(str(n)), F.lit(0.0)), round_to
            ).alias(f"p_{n}")
        )
    sel += [
        F.col("__c").cast("long").alias("hyp_tokens"),
        F.col("__r").cast("long").alias("ref_tokens"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
    ]
    return out.select(*sel)


def rouge_l(
    df: DataFrame,
    id_col: str,
    ref_col: str,
    hyp_col: str,
    max_tokens: int = 512,
    round_to: int = 6,
) -> DataFrame:
    """Per pair: (id, lcs, ref_tokens, hyp_tokens, truncated,
    rouge_l_p, rouge_l_r, rouge_l_f). The DP runs on token lists
    truncated to ``max_tokens`` (flagged per row when it bites)."""
    import numpy as np
    import pandas as pd

    base = df.select(
        F.col(id_col).alias("__id"),
        F.slice(_tokens(ref_col), 1, max_tokens).alias("__rt"),
        F.slice(_tokens(hyp_col), 1, max_tokens).alias("__ht"),
        (
            (F.size(_tokens(ref_col)) > max_tokens)
            | (F.size(_tokens(hyp_col)) > max_tokens)
        ).alias("truncated"),
    )
    id_type = base.schema["__id"].dataType
    schema_out = T.StructType(
        [
            T.StructField("__id", id_type),
            T.StructField("lcs", T.LongType()),
            T.StructField("ref_tokens", T.LongType()),
            T.StructField("hyp_tokens", T.LongType()),
            T.StructField("truncated", T.BooleanType()),
        ]
    )

    def lcs_len(a: list, b: list) -> int:
        if not a or not b:
            return 0
        # rolling 1-D DP, numpy per row of the table
        prev = np.zeros(len(b) + 1, dtype=np.int64)
        for x in a:
            cur = np.zeros(len(b) + 1, dtype=np.int64)
            for j, y in enumerate(b, 1):
                cur[j] = (
                    prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
                )
            prev = cur
        return int(prev[-1])

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pd.DataFrame(
                {
                    "__id": pdf["__id"],
                    "lcs": [
                        lcs_len(list(r), list(h))
                        for r, h in zip(pdf["__rt"], pdf["__ht"])
                    ],
                    "ref_tokens": [len(r) for r in pdf["__rt"]],
                    "hyp_tokens": [len(h) for h in pdf["__ht"]],
                    "truncated": pdf["truncated"],
                }
            )
            yield out

    scored = base.mapInPandas(kernel, schema_out)
    p = F.try_divide(F.col("lcs").cast("double"), F.col("hyp_tokens"))
    r = F.try_divide(F.col("lcs").cast("double"), F.col("ref_tokens"))
    f = F.try_divide(2 * p * r, p + r)
    return scored.select(
        F.col("__id").alias(id_col),
        "lcs",
        "ref_tokens",
        "hyp_tokens",
        "truncated",
        F.round(p, round_to).alias("rouge_l_p"),
        F.round(r, round_to).alias("rouge_l_r"),
        F.round(F.coalesce(f, F.lit(0.0)), round_to).alias("rouge_l_f"),
    )
