"""Interval algebra (merge/gaps/coverage) and the Jaro-Winkler kernel."""

from __future__ import annotations


def test_merge_intervals_islands_and_touching(spark):
    from pipeline_dataengineer_spark.operators.intervals import (
        merge_intervals,
    )

    rows = [
        ("k", 1, 5), ("k", 4, 8), ("k", 8, 10),   # chain: 1-10 (touch)
        ("k", 15, 20), ("k", 16, 17),             # contained: 15-20
        ("k", 30, 31),                            # singleton
        ("j", 2, 3),
    ]
    df = spark.createDataFrame(rows, "key string, s long, e long")
    got = {
        (r["key"], r["s"]): (r["e"], r["n_merged"])
        for r in merge_intervals(df, ["key"], "s", "e").collect()
    }
    assert got[("k", 1)] == (10, 3)   # touching 8 joins under half-open
    assert got[("k", 15)] == (20, 2)
    assert got[("k", 30)] == (31, 1)
    assert got[("j", 2)] == (3, 1)

    strict = {
        (r["key"], r["s"]): r["e"]
        for r in merge_intervals(
            df, ["key"], "s", "e", touch_merges=False
        ).collect()
    }
    assert strict[("k", 1)] == 8 and strict[("k", 8)] == 10


def test_interval_gaps_and_coverage(spark):
    from pipeline_dataengineer_spark.operators.intervals import (
        coverage,
        interval_gaps,
    )

    rows = [("k", 1, 5), ("k", 10, 12), ("k", 20, 21), ("j", 0, 1)]
    df = spark.createDataFrame(rows, "key string, s long, e long")
    gaps = {
        (r["key"], r["gap_start"]): r["gap_end"]
        for r in interval_gaps(df, ["key"], "s", "e").collect()
    }
    assert gaps == {("k", 5): 10, ("k", 12): 20}  # j: single island

    cov = {r["key"]: r for r in coverage(df, ["key"], "s", "e").collect()}
    assert cov["k"]["n_islands"] == 3
    assert cov["k"]["covered"] == 4 + 2 + 1
    assert (cov["k"]["span_start"], cov["k"]["span_end"]) == (1, 21)
    assert cov["j"]["covered"] == 1


def test_jaro_winkler_textbook_and_nulls(spark):
    from pipeline_dataengineer_spark.functions.text import jaro_winkler

    df = spark.createDataFrame(
        [
            ("MARTHA", "MARHTA"),
            ("DIXON", "DICKSONX"),
            ("CRATE", "TRACE"),
            ("abcdef", "cabdef"),   # odd transposition count: floor
            ("f", "f"),
            (None, "x"),
            ("", "x"),
        ],
        "a string, b string",
    )
    from pyspark.sql import functions as F

    got = [
        r["jw"]
        for r in df.select(
            F.round(jaro_winkler("a", "b"), 6).alias("jw")
        ).collect()
    ]
    assert got[0] == 0.961111
    assert got[1] == 0.813333
    assert got[2] == 0.733333
    assert got[3] == round(17 / 18 + 0 * 0.1, 6)  # no shared prefix? c vs a -> 0
    assert got[4] == 1.0
    assert got[5] is None
    assert got[6] == 0.0


def test_link_records_mutual_best(spark):
    from pipeline_dataengineer_spark.operators.joins import link_records

    a = spark.createDataFrame(
        [(1, "Martha Jones"), (2, "Dixon Smith"), (3, "Zed Unique")],
        "id long, name string",
    )
    b = spark.createDataFrame(
        [(10, "marhta jones"), (11, "dickson smith"), (12, "martha j0nes")],
        "id long, name string",
    )
    out = {
        (r["key_a"], r["key_b"]): r["score"]
        for r in link_records(
            a, b, "id", "id", "name", "name", threshold=0.8
        ).collect()
    }
    # 1 matches both 10 and 12; mutual-best pairs 1<->10 (the
    # transposed form scores 0.981 > 0.967 for the substituted one),
    # leaving 12 unmatched; 2<->11; 3 has no candidate block
    assert set(out) == {(1, 10), (2, 11)}
    assert all(v >= 0.8 for v in out.values())


def test_link_records_block_cap_fires_and_audits(spark):
    """max_block_size drops a degenerate block (every row sharing one
    prefix) BEFORE the quadratic join, reports the drop in
    .link_audit, and leaves other blocks' matches intact."""
    from pipeline_dataengineer_spark.operators.joins import link_records

    # skewed fixture: 50 a-rows + 50 b-rows all block to 'xx'; one
    # clean pair blocks to 'al'
    a_rows = [(i, f"xx corp {i}") for i in range(50)] + [(900, "alice")]
    b_rows = [(1000 + i, f"xx corp {i}") for i in range(50)] + [
        (901, "alice")
    ]
    a = spark.createDataFrame(a_rows, "id bigint, name string")
    b = spark.createDataFrame(b_rows, "id bigint, name string")
    out = link_records(
        a, b, "id", "id", "name", "name",
        threshold=0.9, block_chars=2, max_block_size=10,
    )
    rows = out.collect()
    assert out.link_audit["dropped_blocks"] == 1
    assert out.link_audit["dropped_rows_a"] == 50
    assert out.link_audit["dropped_rows_b"] == 50
    assert out.link_audit["max_dropped_block"] == 50
    # the capped block contributes nothing; the clean pair survives
    assert [(r["key_a"], r["key_b"]) for r in rows] == [(900, 901)]

    # uncapped: audit is all-zero and the giant block DOES match
    out2 = link_records(
        a, b, "id", "id", "name", "name", threshold=0.9, block_chars=2,
    )
    assert out2.link_audit["dropped_blocks"] == 0
    assert out2.count() == 51


def test_link_records_soundex_blocking(spark):
    """blocking='soundex' pairs spelling variants a prefix block
    splits: Robert/Rupert both encode to soundex R163 but their
    2-char prefixes 'ro'/'ru' differ, so prefix blocking never even
    scores the pair."""
    from pipeline_dataengineer_spark.operators.joins import link_records

    a = spark.createDataFrame([(1, "Robert")], "id bigint, name string")
    b = spark.createDataFrame([(2, "Rupert")], "id bigint, name string")
    # prefix blocking misses the pair entirely
    assert (
        link_records(a, b, "id", "id", "name", "name", threshold=0.5)
        .count() == 0
    )
    got = link_records(
        a, b, "id", "id", "name", "name",
        threshold=0.5, blocking="soundex",
    ).collect()
    assert [(r["key_a"], r["key_b"]) for r in got] == [(1, 2)]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="blocking"):
        link_records(
            a, b, "id", "id", "name", "name", blocking="metaphone"
        )
