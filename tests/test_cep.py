"""CEP regex pattern matching over event sequences."""

from __future__ import annotations

import pytest

from pipeline_dataengineer_spark.operators.cep import match_event_pattern


def _df(spark, rows):
    return spark.createDataFrame(rows, ["k", "t", "sym"])


def test_matches_map_back_to_order_values(spark):
    rows = [
        ("u1", 10, "v"), ("u1", 20, "v"), ("u1", 30, "c"),
        ("u1", 40, "p"), ("u1", 50, "e"), ("u1", 60, "v"), ("u1", 70, "p"),
    ]
    got = match_event_pattern(
        _df(spark, rows), ["k"], "t", "sym", "v+c*p"
    ).collect()
    by_seq = {(r["k"], r["match_seq"]): r for r in got}
    assert len(got) == 2
    m1 = by_seq[("u1", 1)]
    assert (m1["match_start"], m1["match_end"], m1["matched"]) == (10, 40, "vvcp")
    m2 = by_seq[("u1", 2)]
    assert (m2["match_start"], m2["match_end"], m2["matched"]) == (60, 70, "vp")


def test_non_overlapping_and_order_insensitive_input(spark):
    # input deliberately out of order; matcher must sort by t
    rows = [("u", 3, "p"), ("u", 1, "v"), ("u", 2, "v"), ("u", 5, "p"), ("u", 4, "v")]
    got = sorted(
        (r["match_seq"], r["matched"])
        for r in match_event_pattern(
            _df(spark, rows), ["k"], "t", "sym", "v+p"
        ).collect()
    )
    assert got == [(1, "vvp"), (2, "vp")]


def test_no_match_emits_nothing(spark):
    rows = [("u", 1, "e"), ("u", 2, "e")]
    assert (
        match_event_pattern(_df(spark, rows), ["k"], "t", "sym", "v+p").count()
        == 0
    )


def test_multichar_symbol_rejected(spark):
    rows = [("u", 1, "vv")]
    with pytest.raises(Exception, match="single characters"):
        match_event_pattern(_df(spark, rows), ["k"], "t", "sym", "v").collect()
