"""Chat/SFT conversation operators: validate and flatten the
``array<struct<role, content>>`` shape instruction-tuning datasets
ship in. All pure array algebra — one fused projection per op, no
UDF, no shuffle; a billion conversations stream map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VALID_ROLES = ("system", "user", "assistant")


def validate_conversation(messages: Column | str) -> Column:
    """Struct of structural checks for one conversation:

    - ``roles_known``: every role ∈ {system, user, assistant};
    - ``system_first_only``: 'system' appears at most once, at index 0;
    - ``alternates``: after the optional system turn, roles strictly
      alternate user/assistant starting with user;
    - ``ends_assistant``: the last turn is the model's (a complete
      training example);
    - ``nonempty``: no blank/NULL content;
    - ``valid``: all of the above.

    The standard admission gate before packing/templating SFT data."""
    m = F.col(messages) if isinstance(messages, str) else messages
    body = F.filter(
        m, lambda x, i: ~((i == 0) & (x["role"] == F.lit("system")))
    )
    n = F.size(m)
    roles_known = F.forall(
        m, lambda x: x["role"].isin(*VALID_ROLES)
    )
    system_first_only = ~F.exists(
        F.filter(m, lambda x, i: i > 0),
        lambda x: x["role"] == F.lit("system"),
    )
    alternates = F.forall(
        F.zip_with(
            body,
            F.sequence(F.lit(0), F.size(body) - 1),
            lambda x, i: x["role"]
            == F.when(i % 2 == 0, F.lit("user")).otherwise(
                F.lit("assistant")
            ),
        ),
        lambda ok: ok,
    ) & (F.size(body) > 0)
    ends_assistant = F.when(
        n > 0, m[n - 1]["role"] == F.lit("assistant")
    ).otherwise(F.lit(False))
    nonempty = F.forall(
        m,
        lambda x: x["content"].isNotNull()
        & (F.length(F.trim(x["content"])) > 0),
    )
    valid = (
        roles_known
        & system_first_only
        & alternates
        & ends_assistant
        & nonempty
    )
    return F.struct(
        n.alias("n_turns"),
        roles_known.alias("roles_known"),
        system_first_only.alias("system_first_only"),
        alternates.alias("alternates"),
        ends_assistant.alias("ends_assistant"),
        nonempty.alias("nonempty"),
        valid.alias("valid"),
    )


def flatten_conversation(
    messages: Column | str,
    turn_sep: str = "\n",
) -> Column:
    """Render a conversation to the flat ``<|role|>content`` training
    string (a neutral template — swap the markers for your model's).
    One aggregate fold over the array, no UDF."""
    m = F.col(messages) if isinstance(messages, str) else messages
    return F.array_join(
        F.transform(
            m,
            lambda x: F.concat(
                F.lit("<|"), x["role"], F.lit("|>"), x["content"]
            ),
        ),
        turn_sep,
    )


def conversation_stats(
    df: DataFrame,
    messages_col: str = "messages",
) -> DataFrame:
    """Per-conversation gate columns: the validation struct flattened
    + assistant/user token totals (whitespace tokens — the budget the
    packer needs). One fused projection."""
    v = validate_conversation(messages_col)

    def role_tokens(role: str) -> Column:
        return F.aggregate(
            F.filter(
                F.col(messages_col),
                lambda x: x["role"] == F.lit(role),
            ),
            F.lit(0),
            lambda acc, x: acc
            + F.size(F.split(F.trim(x["content"]), r"\s+")),
        ).cast("long")

    return (
        df.withColumn("__v", v)
        .withColumn("flat_text", flatten_conversation(messages_col))
        .select(
            "*",
            F.col("__v.n_turns").alias("n_turns"),
            F.col("__v.valid").alias("valid"),
            role_tokens("user").alias("user_tokens"),
            role_tokens("assistant").alias("assistant_tokens"),
        )
        .drop("__v")
    )


def assistant_spans(
    messages: Column | str,
    turn_sep: str = "\n",
) -> Column:
    """Character spans (1-based, inclusive) of ASSISTANT content
    inside ``flatten_conversation``'s rendering — the loss mask an
    SFT packer needs (train on the model's turns, mask the rest).
    One aggregate fold carrying (offset, spans): for each turn the
    rendered width is len('<|role|>') + len(content) (+ separator
    between turns); assistant turns emit (content_start, content_end).

    Returns array<struct<s int, e int>>; slicing flat_text with
    ``substring(flat, s, e - s + 1)`` recovers exactly the assistant
    content (property-tested)."""
    m = F.col(messages) if isinstance(messages, str) else messages
    sep_len = len(turn_sep)

    def step(acc, x):
        marker_len = F.length(x["role"]) + 4  # <| |>
        start = acc["off"] + marker_len + 1
        width = marker_len + F.length(x["content"])
        new_spans = F.when(
            x["role"] == F.lit("assistant"),
            F.array_append(
                acc["spans"],
                F.struct(
                    start.cast("int").alias("s"),
                    (acc["off"] + width).cast("int").alias("e"),
                ),
            ),
        ).otherwise(acc["spans"])
        return F.struct(
            (acc["off"] + width + F.lit(sep_len)).alias("off"),
            new_spans.alias("spans"),
        )

    init = F.struct(
        F.lit(0).cast("bigint").alias("off"),
        F.array().cast("array<struct<s:int,e:int>>").alias("spans"),
    )
    return F.aggregate(m, init, step, lambda acc: acc["spans"])
