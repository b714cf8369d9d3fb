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


def test_apply_cdc_round_trip_reconstructs_new_snapshot(spark):
    """apply_cdc(old, snapshot_diff(old, new)) == new, with all three
    change types present."""
    from pipeline_dataengineer_spark.operators.incremental import (
        apply_cdc,
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c")],
        ["k", "v", "s"],
    )
    new = spark.createDataFrame(
        [(1, 10.0, "a"),      # unchanged
         (2, 99.0, "b"),      # update
         (4, 40.0, "d")],     # insert; 3 deleted
        ["k", "v", "s"],
    )
    changes = snapshot_diff(old, new, ["k"], ["v", "s"])
    kinds = {r["change_type"] for r in changes.collect()}
    assert kinds == {"insert", "update", "delete"}
    applied = apply_cdc(old, changes, ["k"], ["v", "s"])
    assert sorted(map(tuple, applied.collect())) == sorted(map(tuple, new.collect()))


def test_run_checks_counts_planted_violations(spark):
    from pipeline_dataengineer_spark.operators.quality import (
        check_referential,
        run_checks,
    )

    df = spark.createDataFrame(
        [(1, "x", 5.0), (2, "x", -1.0), (2, "y", 7.0), (None, "z", 3.0)],
        ["id", "cat", "v"],
    )
    got = {r["rule"]: (r["n_violations"], r["passed"])
           for r in run_checks(df, [
               ("not_null", "id"),
               ("unique", "id"),
               ("accepted_values", "cat", ["x", "y"]),
               ("min", "v", 0),
           ]).collect()}
    assert got["not_null:id"] == (1, False)
    assert got["unique:id"] == (1, False)       # id=2 twice
    assert got["accepted_values:cat"] == (1, False)  # "z"
    assert got["min:v>=0"] == (1, False)        # -1.0
    parent = spark.createDataFrame([(1,), (2,)], ["pid"])
    ri = check_referential(
        spark.createDataFrame([(1,), (9,), (None,)], ["id"]), parent, "id", "pid"
    ).collect()[0]
    assert (ri["n_violations"], ri["passed"]) == (1, False)  # 9 orphaned, NULL exempt


def test_incremental_join_delta_equals_recompute(spark):
    from pipeline_dataengineer_spark.operators.incremental import (
        maintain_join_view,
    )

    a = spark.createDataFrame(
        [(1, "a1"), (2, "a2"), (3, "a3"), (2, "a2b")], ["k", "av"]
    )
    b = spark.createDataFrame(
        [(1, "b1"), (2, "b2"), (4, "b4"), (1, "b1b")], ["k", "bv"]
    )
    a_old, a_delta = a.filter("k <= 2"), a.filter("k > 2")
    b_old, b_delta = b.filter("bv like '%b'"), b.filter("bv not like '%b'")
    view_old = a_old.join(b_old, ["k"])
    got = sorted(
        map(tuple, maintain_join_view(
            view_old, a_old, a_delta, b_old, b_delta, ["k"]
        ).collect())
    )
    want = sorted(map(tuple, a.join(b, ["k"]).collect()))
    assert got == want


def test_incremental_join_delta_empty_deltas_noop(spark):
    from pipeline_dataengineer_spark.operators.incremental import (
        incremental_join_delta,
    )

    a = spark.createDataFrame([(1, "x")], ["k", "av"])
    b = spark.createDataFrame([(1, "y")], ["k", "bv"])
    empty_a, empty_b = a.filter("k < 0"), b.filter("k < 0")
    assert incremental_join_delta(a, empty_a, b, empty_b, ["k"]).count() == 0
