"""Byte-pair-encoding tokenizer: sample-side learning, broadcast
distributed apply.

The tokenization step of a training pipeline has an asymmetric
shape that maps cleanly onto Spark:

- LEARNING the merge table touches a bounded SAMPLE (industry
  practice — vocabularies are trained on a few GB, not the corpus),
  so ``learn_bpe_merges`` runs driver-side on sampled texts pulled
  through ``DataFrame.sample().collect()`` with an explicit cap;
- APPLYING the tokenizer touches EVERY byte of the corpus, so
  ``bpe_tokenize`` ships the (small) merge table to executors inside
  an Arrow-batched ``mapInPandas`` closure and the corpus never
  shuffles — tokenization rides the scan, the only scalable shape
  at 100 TB.

The algorithm is classic BPE (Sennrich et al. 2016, public): words
split to character sequences with an end-of-word marker; repeatedly
merge the most frequent adjacent pair; apply = replay merges in
learned priority order. Deterministic: frequency ties break
lexicographically."""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EOW = "▁"  # end-of-word marker (sentencepiece-style visible char)


def learn_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    sample_fraction: float = 1.0,
    max_sample_rows: int = 50_000,
    seed: int = 7,
) -> list[tuple[str, str]]:
    """Learn a merge table from a bounded sample. Driver memory is
    capped by ``max_sample_rows`` texts (enforced with ``limit``);
    at corpus scale pass a small ``sample_fraction``."""
    rows = (
        df.select(text_col)
        .sample(fraction=sample_fraction, seed=seed)
        .limit(max_sample_rows)
        .collect()
    )
    word_freq: Counter = Counter()
    for r in rows:
        for w in (r[0] or "").lower().split():
            word_freq[w] += 1
    words = {w: tuple(w) + (EOW,) for w in word_freq}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for w, sym in words.items():
            f = word_freq[w]
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += f
        if not pairs:
            break
        # deterministic: max frequency, ties to the lexicographically
        # SMALLEST pair
        maxf = max(pairs.values())
        if maxf < 2:
            break
        best = min(p for p, c in pairs.items() if c == maxf)
        merges.append(best)
        merged = best[0] + best[1]
        for w, sym in words.items():
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[w] = tuple(out)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_tokenize(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a learned merge table to every document: adds
    ``out_col array<string>`` and ``n_bpe_tokens``. The merge table
    rides the serialized closure (broadcast-sized: a few hundred KB
    for a 50k vocab); the corpus is never shuffled — tokenization is
    a map over the scan. Per-word results are memoized per Arrow
    batch, so the cost scales with DISTINCT words per batch (Zipf
    makes that a small fraction of tokens)."""
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField(out_col, T.ArrayType(T.StringType()), True),
            T.StructField("n_bpe_tokens", T.LongType(), True),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks_col, counts = [], []
            for text in pdf[text_col]:
                toks: list[str] = []
                for w in (text or "").lower().split():
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = _encode_word(w, ranks)
                    toks.extend(got)
                toks_col.append(toks)
                counts.append(len(toks))
            yield pdf.assign(**{out_col: toks_col, "n_bpe_tokens": counts})

    return df.mapInPandas(op, out_schema)


def vocab_from_merges(merges: list[tuple[str, str]]) -> list[str]:
    """The token vocabulary a merge table induces (merged symbols in
    priority order) — what a sink writes next to the corpus."""
    return [a + b for a, b in merges]
