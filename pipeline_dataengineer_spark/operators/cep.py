"""Complex event processing: regex pattern matching over event
sequences (MATCH_RECOGNIZE / Flink-CEP family).

Funnels (q_funnel) answer "did A then B then C happen"; CEP answers
the general question — find every non-overlapping occurrence of a
REGEX over the per-key event stream ("views, optional clicks, then a
purchase" = ``v+c*p``). The classic uses: fraud sequences, UX
funnels with optional steps, error-burst detection.

Spark shape: classify each event to a single-character symbol with a
codegen'd CASE (JVM-side), then ONE shuffle on the key and an Arrow
grouped-map that concatenates the ordered symbols and runs the
compiled regex per key — the per-key work is C-speed regex over a
string of len(events-per-key), and match offsets map back to event
order values positionally. Same memory contract as any per-key
sequence model (a key's events fit one executor); match semantics
are leftmost, greedy, non-overlapping — identical to RE2's
``regexp_extract_all``, which is how the oracle replays it in SQL.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def match_event_pattern(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    symbol_col: str,
    pattern: str,
) -> DataFrame:
    """Find non-overlapping regex matches over each key's ordered
    symbol sequence. ``symbol_col`` must hold exactly one character
    per event (build it with a CASE over the event type). Returns one
    row per match: key cols, ``match_seq`` (1-based per key),
    ``match_start``/``match_end`` (order values of the first/last
    matched event), ``matched`` (the symbol substring)."""
    rx = re.compile(pattern)
    key_fields = [df.schema[k] for k in key_cols]
    order_type = df.schema[order_col].dataType
    out_cols = [*key_cols, "match_seq", "match_start", "match_end", "matched"]
    schema_out = T.StructType(
        key_fields
        + [
            T.StructField("match_seq", T.LongType()),
            T.StructField("match_start", order_type),
            T.StructField("match_end", order_type),
            T.StructField("matched", T.StringType()),
        ]
    )

    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        syms = pdf[symbol_col].to_numpy()
        if any(len(s) != 1 for s in syms):
            raise ValueError(
                f"{symbol_col} must be single characters; got "
                f"{[s for s in syms if len(s) != 1][:3]}"
            )
        seq = "".join(syms)
        orders = pdf[order_col].to_numpy()
        rows = [
            (*key, i, orders[m.start()], orders[m.end() - 1], m.group(0))
            for i, m in enumerate(rx.finditer(seq), start=1)
        ]
        return pd.DataFrame(rows, columns=out_cols)

    return df.select(*key_cols, order_col, symbol_col).groupBy(
        *key_cols
    ).applyInPandas(fn, schema_out)
