"""SFT dataset assembly: the conversation-side twin of
build_pretraining_corpus — gate, dedupe, budget, and render chat data
into training rows with loss-mask spans, as ONE lazy Catalyst plan.

Stage by stage (each piece individually oracle-checked through its
own contract query):

1. gate     — structural validation (operators/chat.py): role
              vocabulary, single leading system turn, strict
              user/assistant alternation, ends on the assistant,
              non-blank content;
2. dedupe   — exact-duplicate conversations collapse on the
              whitespace-normalized fingerprint of the flattened
              rendering (keep-first by id for deterministic output);
3. budget   — optional per-source token budget in portable-scramble
              order (operators/corpus.py:token_budget_sample), the
              mixture-control step;
4. render   — flat_text + assistant loss spans + per-role token
              counts, ready for the tokenizer/packer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipeline_dataengineer_spark.functions.textstats import fingerprint64
from pipeline_dataengineer_spark.operators.chat import (
    assistant_spans,
    conversation_stats,
)
from pipeline_dataengineer_spark.operators.dedup import dedup_keep_first


def build_sft_dataset(
    conversations: DataFrame,
    id_col: str = "conv_id",
    messages_col: str = "messages",
    source_col: str | None = None,
    token_budgets: dict[str, int] | None = None,
) -> DataFrame:
    """(id, source?, flat_text, loss_spans, n_turns, user_tokens,
    assistant_tokens) for every VALID, deduplicated conversation —
    optionally budget-capped per source. Rejected rows simply drop
    (run conversation_stats separately for a rejection report)."""
    stats = conversation_stats(conversations, messages_col)
    valid = stats.filter(F.col("valid"))
    deduped = dedup_keep_first(
        valid.withColumn("__fp", fingerprint64("flat_text")),
        ["__fp"],
        id_col,
    ).drop("__fp")
    if token_budgets is not None:
        if source_col is None:
            raise ValueError("token_budgets requires source_col")
        from pipeline_dataengineer_spark.operators.corpus import (
            token_budget_sample,
        )

        deduped = token_budget_sample(
            deduped.withColumn(
                "__ntok",
                F.col("user_tokens") + F.col("assistant_tokens"),
            ),
            source_col,
            "__ntok",
            token_budgets,
            key_col=id_col,
        ).drop("__ntok")
    out_cols = [id_col]
    if source_col:
        out_cols.append(source_col)
    return deduped.withColumn(
        "loss_spans", assistant_spans(messages_col)
    ).select(
        *out_cols,
        "flat_text",
        "loss_spans",
        "n_turns",
        "user_tokens",
        "assistant_tokens",
    )
