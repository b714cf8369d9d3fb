"""Unit tests: MERGE-style upsert and CDC snapshot diff."""

from __future__ import annotations

from pipeline_dataengineer_spark.operators.incremental import (
    snapshot_diff,
    upsert_snapshot,
)


def test_upsert_source_wins_and_target_survives(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "s", "v"]
    )
    source = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], ["k", "s", "v"]
    )
    got = {(r["k"], r["s"], r["v"]) for r in upsert_snapshot(target, source, ["k"]).collect()}
    assert got == {(1, "a", 10.0), (2, "B", 99.0), (3, "c", 30.0), (4, "d", 40.0)}


def test_snapshot_diff_classifies_and_drops_unchanged(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0)], ["k", "s", "v"]
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 21.0), (4, "d", 40.0)], ["k", "s", "v"]
    )
    rows = {r["k"]: r for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()}
    assert set(rows) == {2, 3, 4}  # key 1 unchanged -> dropped
    assert rows[2]["change_type"] == "update"
    assert rows[2]["old_v"] == 20.0 and rows[2]["new_v"] == 21.0
    assert rows[3]["change_type"] == "delete" and rows[3]["new_s"] is None
    assert rows[4]["change_type"] == "insert" and rows[4]["old_s"] is None


def test_snapshot_diff_null_safe_compare(spark):
    # NULL == NULL must count as unchanged (eqNullSafe), not update
    old = spark.createDataFrame([(1, None)], "k: long, s: string")
    new = spark.createDataFrame([(1, None)], "k: long, s: string")
    assert snapshot_diff(old, new, ["k"], ["s"]).count() == 0


def test_snapshot_diff_null_key_rows_classified_by_side(spark):
    # A NULL key never matches the equality join, so a NULL-keyed old
    # row must classify as 'delete' (present only on the old side) and
    # a NULL-keyed new row as 'insert' — not both as 'insert', which
    # is what isNotNull()-based presence detection produced.
    old = spark.createDataFrame([(None, "gone")], "k: long, s: string")
    new = spark.createDataFrame([(None, "fresh")], "k: long, s: string")
    got = {(r["change_type"], r["old_s"], r["new_s"])
           for r in snapshot_diff(old, new, ["k"], ["s"]).collect()}
    assert got == {("delete", "gone", None), ("insert", None, "fresh")}
