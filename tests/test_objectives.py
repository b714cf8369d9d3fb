"""Mixture-of-denoisers builder (pipelines/objectives.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pipeline_dataengineer_spark.pipelines.objectives import (
    build_objectives_corpus,
)


def test_objectives_every_doc_once_and_valid(spark):
    rows = [(i, f"doc {i} " + "alpha beta gamma " * (1 + i % 6))
            for i in range(300)]
    rows += [(300, "a"), (301, "")]  # too short for prefix/span/fim
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = build_objectives_corpus(df).collect()
    assert len(out) == 302  # exactly one row per input doc
    by_obj = {}
    for r in out:
        by_obj.setdefault(r["objective"], []).append(r)
    # all four objectives present at this size, roughly per mix
    assert set(by_obj) == {"causal", "fim", "span", "prefix"}
    assert len(by_obj["causal"]) > len(by_obj["fim"]) * 0.8
    texts = {i: t for i, t in rows}
    for r in out:
        t = texts[r["doc_id"]]
        if r["objective"] == "causal":
            assert r["input_text"] == t and r["target_text"] == ""
        elif r["objective"] == "fim":
            assert r["input_len"] == len(t) + 15
            assert r["input_text"].startswith("<PRE>")
        elif r["objective"] == "span":
            assert r["target_text"].startswith("<extra_id_0>")
            # corrupted = n - 3*sl + 36; targets = 36 + 3*sl
            assert r["input_len"] + r["target_len"] == len(t) + 72
        elif r["objective"] == "prefix":
            assert r["input_text"] + r["target_text"] == t
    # short docs fell back to causal
    for i in (300, 301):
        rr = [r for r in out if r["doc_id"] == i][0]
        assert rr["objective"] == "causal"


def test_objectives_mix_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="sum to 1"):
        build_objectives_corpus(df, mix={"causal": 0.5, "fim": 0.2})
    with pytest.raises(ValueError, match="unknown"):
        build_objectives_corpus(
            df, mix={"causal": 0.5, "weird": 0.5}
        )
