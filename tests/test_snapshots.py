"""Versioned snapshot/manifest layer (operators/snapshots.py):
atomic publish, crash safety, time travel, rollback, and the
idempotent durable corpus-append loop."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pipeline_dataengineer_spark.operators.snapshots import (
    _write_data_dir,
    append_snapshot,
    current_version,
    history,
    read_manifest,
    read_snapshot,
    rollback,
    snapshot_corpus_append,
    write_snapshot,
)


def test_write_read_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "t")
    m0 = write_snapshot(spark.range(5).withColumn("v", F.lit("a")), root)
    assert m0["version"] == 0 and m0["parent"] is None
    m1 = write_snapshot(spark.range(3).withColumn("v", F.lit("b")), root)
    assert m1["version"] == 1 and m1["parent"] == 0
    assert read_snapshot(spark, root).count() == 3          # current
    assert read_snapshot(spark, root, version=0).count() == 5  # time travel
    assert [m["version"] for m in history(root)] == [0, 1]


def test_append_is_logical_and_crash_safe(spark, tmp_path):
    root = str(tmp_path / "t")
    write_snapshot(spark.range(4), root)
    m = append_snapshot(spark.range(100, 103), root)
    assert m["version"] == 1 and len(m["data_paths"]) == 2
    got = sorted(r["id"] for r in read_snapshot(spark, root).collect())
    assert got == [0, 1, 2, 3, 100, 101, 102]

    # CRASH between data write and pointer swap: a new data directory
    # exists on disk, but no manifest/pointer references it — readers
    # still see version 1 intact.
    _write_data_dir(spark.range(900, 999), root)
    assert current_version(root) == 1
    assert read_snapshot(spark, root).count() == 7
    # and the next successful publish is unaffected
    m2 = append_snapshot(spark.range(200, 201), root)
    assert m2["version"] == 2
    assert read_snapshot(spark, root).count() == 8


def test_rollback_preserves_history(spark, tmp_path):
    root = str(tmp_path / "t")
    write_snapshot(spark.range(5), root)
    append_snapshot(spark.range(10, 12), root)
    m = rollback(root, 0)
    assert m["version"] == 2  # roll-forward-to-the-past, history kept
    assert read_snapshot(spark, root).count() == 5
    assert read_snapshot(spark, root, version=1).count() == 7


def test_empty_append_publishes_nothing(spark, tmp_path):
    root = str(tmp_path / "t")
    write_snapshot(spark.range(3), root)
    m = append_snapshot(spark.range(0), root)  # empty df
    assert m["version"] == 0
    assert current_version(root) == 0


def test_snapshot_corpus_append_idempotent_through_manifest(spark, tmp_path):
    root = str(tmp_path / "corpus")
    rows = [
        (1, "the quick brown fox jumps over the lazy dog by the river", "en", "web"),
        (2, "completely different text about query engines and storage", "en", "web"),
    ]
    batch = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    m0 = snapshot_corpus_append(spark, root, batch, min_quality=0.0)
    assert m0["version"] == 0
    assert read_snapshot(spark, root).count() == 2

    # re-deliver the SAME batch: empty delta -> no new version
    m1 = snapshot_corpus_append(spark, root, batch, min_quality=0.0)
    assert m1["version"] == 0 and current_version(root) == 0
    assert read_snapshot(spark, root).count() == 2

    # a batch with one near-dup (of doc 1), one exact redelivery (2)
    # and one genuinely new doc: only the new doc lands
    batch2 = spark.createDataFrame(
        [
            (3, "the quick brown fox jumps over the lazy dog by the rivers", "en", "web"),
            (2, "completely different text about query engines and storage", "en", "web"),
            (9, "a genuinely novel document with entirely fresh content here", "en", "web"),
        ],
        ["doc_id", "text", "lang", "source"],
    )
    m2 = snapshot_corpus_append(spark, root, batch2, min_quality=0.0)
    assert m2["version"] == 1
    got = sorted(r["doc_id"] for r in read_snapshot(spark, root).collect())
    assert got == [1, 2, 9]
    # the orphanless invariant: every published path exists
    for m in history(root):
        for p in m["data_paths"]:
            assert os.path.isdir(p)


def test_merge_into_snapshot_upserts_and_time_travels(spark, tmp_path):
    from pipeline_dataengineer_spark.operators.snapshots import (
        merge_into_snapshot,
    )

    root = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]), root
    )
    m = merge_into_snapshot(
        spark,
        root,
        spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"]),
        keys=["k"],
    )
    assert m["version"] == 1
    got = {r["k"]: r["v"] for r in read_snapshot(spark, root).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}
    old = {r["k"]: r["v"] for r in read_snapshot(spark, root, version=0).collect()}
    assert old == {1: "a", 2: "b"}


def test_snapshot_epoch_sink_exactly_once_on_retry(spark, tmp_path):
    """Epoch ledger in the manifest: a live availableNow stream lands
    its epochs; directly re-invoking the foreachBatch fn with an
    already-applied epoch id (what a post-failure retry does)
    publishes nothing."""
    from pipeline_dataengineer_spark.streaming.snapshot_sink import (
        last_applied_epoch,
        snapshot_epoch_sink,
    )

    src = tmp_path / "src"
    src.mkdir()
    (src / "b0.json").write_text('{"k": 1, "v": "a"}\n{"k": 2, "v": "b"}\n')
    root = str(tmp_path / "snap")
    fn = snapshot_epoch_sink(root, stream_id="s1")
    stream = spark.readStream.schema("k long, v string").json(str(src))
    q = (
        stream.writeStream.foreachBatch(fn)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert read_snapshot(spark, root).count() == 2
    e0 = last_applied_epoch(root, "s1")
    v0 = current_version(root)

    # simulate the at-least-once retry: same epoch id re-delivered
    fn(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), e0)
    assert current_version(root) == v0  # nothing published
    assert read_snapshot(spark, root).count() == 2

    # a genuinely new epoch appends, carries the ledger forward
    fn(spark.createDataFrame([(3, "c")], "k long, v string"), e0 + 1)
    assert last_applied_epoch(root, "s1") == e0 + 1
    assert read_snapshot(spark, root).count() == 3
    # batch publishes preserve the ledger
    append_snapshot(spark.createDataFrame([(9, "z")], "k long, v string"), root)
    assert last_applied_epoch(root, "s1") == e0 + 1


def test_schema_evolution_gated_then_merged(spark, tmp_path):
    import pytest

    from pipeline_dataengineer_spark.operators.snapshots import expire_snapshots

    root = str(tmp_path / "t")
    write_snapshot(spark.range(3).withColumn("v", F.lit("a")), root)
    drifted = spark.range(10, 12).withColumn("v", F.lit("b")).withColumn(
        "lang", F.lit("en")
    )
    # default: drift is rejected, table untouched
    with pytest.raises(ValueError, match="evolve_schema"):
        append_snapshot(drifted, root)
    assert current_version(root) == 0

    m = append_snapshot(drifted, root, evolve_schema=True)
    assert m["mixed_schemas"] is True
    assert "lang" in m["schema"]
    cur = read_snapshot(spark, root)
    assert set(cur.columns) == {"id", "v", "lang"}
    by_id = {r["id"]: r["lang"] for r in cur.collect()}
    assert by_id[0] is None and by_id[10] == "en"  # old rows NULL-fill
    # time travel to v0 reads the ORIGINAL narrow schema
    assert set(read_snapshot(spark, root, version=0).columns) == {"id", "v"}
    # stickiness: later same-schema-as-evolved appends keep the flag
    m2 = append_snapshot(cur.limit(1), root, evolve_schema=True)
    assert m2["mixed_schemas"] is True
    expire_snapshots(root, keep_last=1)
    assert read_snapshot(spark, root).count() == 6


def test_expire_snapshots_vacuum(spark, tmp_path):
    from pipeline_dataengineer_spark.operators.snapshots import expire_snapshots

    root = str(tmp_path / "t")
    write_snapshot(spark.range(2), root)            # v0 (dir replaced by v1)
    write_snapshot(spark.range(4), root)            # v1 full rewrite
    append_snapshot(spark.range(10, 12), root)      # v2 shares v1's dir
    append_snapshot(spark.range(20, 21), root)      # v3 shares v1+v2 dirs
    orphan = _write_data_dir(spark.range(99), root)  # crashed write

    audit = expire_snapshots(root, keep_last=2)
    assert audit["removed_versions"] == [0, 1]
    assert audit["kept_versions"] == [2, 3]
    # v0's dir and the orphan are gone; every dir v2/v3 list survives
    assert orphan in audit["removed_dirs"]
    assert not os.path.isdir(orphan)
    for d in read_manifest(root)["data_paths"]:
        assert os.path.isdir(d)
    assert sorted(r["id"] for r in read_snapshot(spark, root).collect()) == [
        0, 1, 2, 3, 10, 11, 20
    ]
    # expired versions are no longer addressable
    import pytest
    with pytest.raises(FileNotFoundError):
        read_manifest(root, 0)


def test_compact_snapshot_preserves_content(spark, tmp_path):
    from pipeline_dataengineer_spark.operators.snapshots import (
        compact_snapshot,
        expire_snapshots,
    )

    root = str(tmp_path / "t")
    write_snapshot(spark.range(50).repartition(8), root)
    for k in range(3):
        append_snapshot(spark.range(100 + k, 101 + k).repartition(2), root)
    n_files_before = sum(
        1
        for d in read_manifest(root)["data_paths"]
        for base, _s, files in os.walk(d)
        for f in files
        if f.endswith(".parquet")
    )
    before = sorted(r["id"] for r in read_snapshot(spark, root).collect())

    m = compact_snapshot(spark, root, target_mb=128)
    assert m["compacted_from"] == 3 and m["version"] == 4
    assert len(m["data_paths"]) == 1  # one fresh dir, tiny table -> 1 file
    n_files_after = sum(
        1
        for base, _s, files in os.walk(m["data_paths"][0])
        for f in files
        if f.endswith(".parquet")
    )
    assert n_files_after < n_files_before
    assert sorted(r["id"] for r in read_snapshot(spark, root).collect()) == before
    # pre-compaction version still time-travels until vacuumed
    assert read_snapshot(spark, root, version=3).count() == len(before)
    expire_snapshots(root, keep_last=1)
    assert sorted(r["id"] for r in read_snapshot(spark, root).collect()) == before


def test_manifest_stats_prune_directories(spark, tmp_path):
    """Manifest-level data skipping: per-directory min/max recorded at
    write time lets read_snapshot drop whole directories for a
    disjoint predicate range — before Spark lists a single file."""
    from pipeline_dataengineer_spark.operators.snapshots import read_snapshot

    root = str(tmp_path / "t")
    write_snapshot(
        spark.range(0, 100).withColumn("day", F.lit(1)),
        root, stat_cols=["id"],
    )
    # appends inherit stat_cols from the table
    append_snapshot(spark.range(100, 200).withColumn("day", F.lit(2)), root)
    append_snapshot(spark.range(200, 300).withColumn("day", F.lit(3)), root)
    m = read_manifest(root)
    assert m["stat_cols"] == ["id"]
    assert len(m["dir_stats"]) == 3
    assert sorted(v["id"] for v in m["dir_stats"].values()) == [
        [0, 99], [100, 199], [200, 299]
    ]

    pruned = read_snapshot(spark, root, prune=("id", 120, 180))
    # exactly ONE directory survives the manifest cut
    assert len(pruned.inputFiles()) == len(
        read_snapshot(spark, root).inputFiles()
    ) // 3
    # row-level filter still applies on top; results are correct
    got = sorted(
        r["id"] for r in pruned.filter(F.col("id").between(120, 180)).collect()
    )
    assert got == list(range(120, 181))
    # one-sided bounds and unknown-stats safety
    assert read_snapshot(spark, root, prune=("id", None, 99)).count() == 100
    assert read_snapshot(spark, root, prune=("id", 300, None)).count() == 0
    assert read_snapshot(spark, root, prune=("day", 5, 9)).count() == 300  # no stats for day -> keep all


def test_merge_on_read_upsert_and_compaction_folds(spark, tmp_path):
    import pytest

    from pipeline_dataengineer_spark.operators.snapshots import (
        compact_snapshot,
        read_snapshot,
        upsert_append,
    )

    root = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["k", "v", "n"]
    )
    write_snapshot(base, root)
    # upsert: update k=2, insert k=4 — ONE delta dir, no rewrite
    m1 = upsert_append(
        spark, root,
        spark.createDataFrame([(2, "B", 21), (4, "d", 40)], ["k", "v", "n"]),
        keys=["k"],
    )
    assert len(m1["data_paths"]) == 2 and m1["merge_keys"] == ["k"]
    got = {r["k"]: (r["v"], r["n"]) for r in read_snapshot(spark, root).collect()}
    assert got == {1: ("a", 10), 2: ("B", 21), 3: ("c", 30), 4: ("d", 40)}
    # second upsert shadows the first (latest dir wins)
    upsert_append(
        spark, root,
        spark.createDataFrame([(2, "BB", 22)], ["k", "v", "n"]), keys=["k"],
    )
    got2 = {r["k"]: r["n"] for r in read_snapshot(spark, root).collect()}
    assert got2 == {1: 10, 2: 22, 3: 30, 4: 40}
    # pre-upsert version time-travels to the un-merged base
    assert read_snapshot(spark, root, version=0).count() == 3
    # key mismatch and prune-on-MOR are rejected
    with pytest.raises(ValueError, match="merge_keys"):
        upsert_append(spark, root, base, keys=["v"])
    with pytest.raises(ValueError, match="merge-on-read"):
        read_snapshot(spark, root, prune=("k", 0, 1))
    # compaction folds the shadowing into one plain directory
    mc = compact_snapshot(spark, root)
    assert "merge_keys" not in mc and len(mc["data_paths"]) == 1
    got3 = {r["k"]: r["n"] for r in read_snapshot(spark, root).collect()}
    assert got3 == got2


def test_tombstone_deletes_and_ordering(spark, tmp_path):
    from pipeline_dataengineer_spark.operators.snapshots import (
        compact_snapshot,
        delete_append,
        read_snapshot,
        upsert_append,
    )

    root = str(tmp_path / "t")
    write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"]), root
    )
    delete_append(spark, root, spark.createDataFrame([(2,)], ["k"]), keys=["k"])
    assert {r["k"] for r in read_snapshot(spark, root).collect()} == {1, 3}
    # delete-then-reinsert: later upsert wins over the tombstone
    upsert_append(
        spark, root, spark.createDataFrame([(2, "b2")], ["k", "v"]), keys=["k"]
    )
    got = {r["k"]: r["v"] for r in read_snapshot(spark, root).collect()}
    assert got == {1: "a", 2: "b2", 3: "c"}
    # upsert-then-delete: tombstone wins
    delete_append(spark, root, spark.createDataFrame([(1,), (2,)], ["k"]), keys=["k"])
    assert {r["k"] for r in read_snapshot(spark, root).collect()} == {3}
    # plain logical append to the MOR table keeps the resolve metadata
    append_snapshot(spark.createDataFrame([(5, "e")], ["k", "v"]), root)
    assert {r["k"] for r in read_snapshot(spark, root).collect()} == {3, 5}
    # physical erasure: compaction folds, vacuum removes the bytes
    mc = compact_snapshot(spark, root)
    assert "merge_keys" not in mc and "tombstone_dirs" not in mc
    from pipeline_dataengineer_spark.operators.snapshots import expire_snapshots
    expire_snapshots(root, keep_last=1)
    assert {r["k"]: r["v"] for r in read_snapshot(spark, root).collect()} == {
        3: "c", 5: "e"
    }
    # time travel to expired deleted versions is gone (erasure complete)
    import pytest
    with pytest.raises(FileNotFoundError):
        read_manifest(root, 0)


def test_compact_with_zorder_clusters_files(spark, tmp_path):
    """OPTIMIZE ZORDER BY: compaction re-clusters along the Morton
    curve so per-file min/max bounding boxes prune multi-column
    filters (checked at the parquet-footer level, the stats real
    engines prune with)."""
    import glob

    import pandas as pd

    from pipeline_dataengineer_spark.operators.snapshots import (
        compact_snapshot,
        read_snapshot,
    )

    root = str(tmp_path / "t")
    rows = [(x, y) for x in range(64) for y in range(64)]
    write_snapshot(
        spark.createDataFrame(rows, ["x", "y"]).repartition(8), root
    )
    before = sorted((r["x"], r["y"]) for r in read_snapshot(spark, root).collect())

    m = compact_snapshot(spark, root, zorder_by=["x", "y"], num_files=16)
    assert m["compacted_from"] == 0 and len(m["data_paths"]) == 1

    # content unchanged, rows only MOVED
    after = sorted((r["x"], r["y"]) for r in read_snapshot(spark, root).collect())
    assert after == before

    def files_intersecting(path, col, lo, hi):
        hit = tot = 0
        for f in glob.glob(f"{path}/part-*.parquet"):
            tot += 1
            pdf = pd.read_parquet(f, columns=[col])
            if not (pdf[col].max() < lo or pdf[col].min() > hi):
                hit += 1
        return hit, tot

    zdir = m["data_paths"][0]
    hit, tot = files_intersecting(zdir, "y", 8, 15)
    assert tot >= 4  # compaction produced a multi-file z-clustered layout
    assert hit <= tot / 2, (hit, tot)  # second-column filter prunes files


def test_streaming_upsert_sink_materializes_current_state(spark, tmp_path):
    """CDC stream → current-state table: snapshot_epoch_sink(keys=...)
    upserts each epoch exactly once; later epochs shadow earlier
    rows per key; a retried epoch publishes nothing; tombstones laid
    down between epochs survive stream publishes."""
    from pipeline_dataengineer_spark.operators.snapshots import (
        delete_append,
        read_snapshot,
    )
    from pipeline_dataengineer_spark.streaming.snapshot_sink import (
        last_applied_epoch,
        snapshot_epoch_sink,
    )

    src = tmp_path / "src"
    src.mkdir()
    (src / "b0.json").write_text('{"k": 1, "v": "a1"}\n{"k": 2, "v": "b1"}\n')
    root = str(tmp_path / "snap")
    fn = snapshot_epoch_sink(root, stream_id="cdc", keys=["k"])
    stream = spark.readStream.schema("k long, v string").json(str(src))
    q = (
        stream.writeStream.foreachBatch(fn)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    e0 = last_applied_epoch(root, "cdc")
    assert {r["k"]: r["v"] for r in read_snapshot(spark, root).collect()} == {
        1: "a1", 2: "b1"
    }
    # next epoch updates k=1, inserts k=3 -> last-writer-wins state
    fn(spark.createDataFrame([(1, "a2"), (3, "c1")], "k long, v string"), e0 + 1)
    got = {r["k"]: r["v"] for r in read_snapshot(spark, root).collect()}
    assert got == {1: "a2", 2: "b1", 3: "c1"}
    # retry of that epoch is invisible
    v = current_version(root)
    fn(spark.createDataFrame([(1, "SHOULD_NOT_APPLY")], "k long, v string"), e0 + 1)
    assert current_version(root) == v
    # a tombstone between epochs survives the next stream publish
    delete_append(spark, root, spark.createDataFrame([(2,)], ["k"]), keys=["k"])
    fn(spark.createDataFrame([(4, "d1")], "k long, v string"), e0 + 2)
    got2 = {r["k"]: r["v"] for r in read_snapshot(spark, root).collect()}
    assert got2 == {1: "a2", 3: "c1", 4: "d1"}  # k=2 stays deleted


def test_lakehouse_lifecycle_end_to_end(spark, tmp_path):
    """The whole table lifecycle composed: corpus ingest (near-dup
    delta, idempotent) → stats-tracked appends → MOR upsert + delete →
    zorder compaction folds everything → vacuum leaves one pruned,
    correct, stats-indexed version."""
    from pipeline_dataengineer_spark.operators.snapshots import (
        compact_snapshot,
        delete_append,
        expire_snapshots,
        read_snapshot,
        snapshot_corpus_append,
        upsert_append,
    )

    root = str(tmp_path / "corpus")
    batch1 = spark.createDataFrame(
        [(i, f"document body number {i} with plenty of distinct words {i*7}", "en")
         for i in range(40)],
        ["doc_id", "text", "lang"],
    )
    snapshot_corpus_append(spark, root, batch1, min_quality=0.0)
    n1 = read_snapshot(spark, root).count()
    assert n1 == 40
    # re-delivery: no new version (idempotent through the manifest)
    v_before = current_version(root)
    snapshot_corpus_append(spark, root, batch1, min_quality=0.0)
    assert current_version(root) == v_before

    # curation: upsert a corrected doc, erase another
    fixed = spark.createDataFrame(
        [(3, "corrected text for document three entirely", "en")],
        read_snapshot(spark, root).schema,
    )
    upsert_append(spark, root, fixed, keys=["doc_id"])
    delete_append(spark, root, spark.createDataFrame([(7,)], ["doc_id"]), keys=["doc_id"])
    cur = {r["doc_id"]: r["text"] for r in read_snapshot(spark, root).collect()}
    assert 7 not in cur and cur[3].startswith("corrected")
    assert len(cur) == n1 - 1

    # compact with zorder + declare stats; then vacuum everything old
    compact_snapshot(spark, root, zorder_by=["doc_id"], num_files=4)
    # stats join the table on the next full write cycle
    from pipeline_dataengineer_spark.operators.snapshots import write_snapshot
    write_snapshot(read_snapshot(spark, root), root, stat_cols=["doc_id"])
    audit = expire_snapshots(root, keep_last=1)
    assert audit["removed_versions"]
    final = read_snapshot(spark, root, prune=("doc_id", 0, 5))
    got = {r["doc_id"]: r["text"] for r in read_snapshot(spark, root).collect()}
    assert got == cur  # lifecycle preserved exactly the curated state
    assert {r["doc_id"] for r in final.filter(F.col("doc_id") <= 5).collect()} == {
        0, 1, 2, 3, 4, 5
    }


def test_register_snapshot_sql_view(spark, tmp_path):
    from pipeline_dataengineer_spark.operators.snapshots import (
        register_snapshot,
        upsert_append,
    )

    root = str(tmp_path / "t")
    write_snapshot(spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]), root)
    register_snapshot(spark, "snap_t", root)
    assert spark.sql("SELECT count(*) c FROM snap_t").collect()[0]["c"] == 2
    # MOR shadowing shows through SQL after re-registering
    upsert_append(spark, root, spark.createDataFrame([(2, "B")], ["k", "v"]), keys=["k"])
    register_snapshot(spark, "snap_t", root)
    got = {r["k"]: r["v"] for r in spark.sql("SELECT k, v FROM snap_t").collect()}
    assert got == {1: "a", 2: "B"}
    # time travel through SQL
    register_snapshot(spark, "snap_t_v0", root, version=0)
    assert spark.sql("SELECT v FROM snap_t_v0 WHERE k = 2").collect()[0]["v"] == "b"


def test_snapshot_corpus_append_with_signature_store(spark, tmp_path):
    """Durable ingest with the O(batch) signature store threaded
    through: bootstrap seeds store from the published snapshot, later
    batches append only their delta's signatures, dedup still works."""
    from pipeline_dataengineer_spark.operators.snapshots import (
        read_snapshot,
        snapshot_corpus_append,
    )

    root = str(tmp_path / "c")
    store = str(tmp_path / "sigs")
    b1 = spark.createDataFrame(
        [(i, f"unique seed document body number {i} entirely", "en")
         for i in range(20)],
        ["doc_id", "text", "lang"],
    )
    snapshot_corpus_append(spark, root, b1, min_quality=0.0,
                           signature_store=store)
    assert spark.read.parquet(store).count() == 20
    b2 = spark.createDataFrame(
        [(50, "a brand new follow-up document with fresh words", "en"),
         (51, "unique seed document body number 3 entirely", "en")],  # near-dup
        ["doc_id", "text", "lang"],
    )
    snapshot_corpus_append(spark, root, b2, min_quality=0.0,
                           signature_store=store)
    ids = {r["doc_id"] for r in read_snapshot(spark, root).collect()}
    assert 50 in ids and 51 not in ids and len(ids) == 21
    assert spark.read.parquet(store).count() == 21  # grew by the delta only


def test_table_changes_append_only(spark, tmp_path):
    from pipeline_dataengineer_spark.operators.snapshots import (
        table_changes,
    )

    root = str(tmp_path / "cdf")
    write_snapshot(spark.range(0, 3).withColumn("v", F.lit("a")), root)
    append_snapshot(spark.range(10, 12).withColumn("v", F.lit("b")), root)
    append_snapshot(spark.range(20, 21).withColumn("v", F.lit("c")), root)
    ch = table_changes(spark, root, 0)  # v0 -> current (v2)
    rows = {(r["id"], r["v"], r["change_type"]) for r in ch.collect()}
    assert rows == {
        (10, "b", "insert"),
        (11, "b", "insert"),
        (20, "c", "insert"),
    }
    # sub-range v1 -> v2
    ch12 = table_changes(spark, root, 1, 2)
    assert {r["id"] for r in ch12.collect()} == {20}
    # empty range
    assert table_changes(spark, root, 2, 2).count() == 0


def test_table_changes_keyed_mor(spark, tmp_path):
    from pipeline_dataengineer_spark.operators.snapshots import (
        delete_append,
        table_changes,
        upsert_append,
    )

    root = str(tmp_path / "cdfk")
    base = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "id long, v string"
    )
    write_snapshot(base, root)  # v0
    upsert_append(
        spark,
        root,
        spark.createDataFrame([(2, "Y2"), (4, "w")], "id long, v string"),
        keys=["id"],
    )  # v1: update 2, insert 4
    delete_append(spark, root, spark.createDataFrame([(1,)], "id long"), keys=["id"])  # v2
    ch = table_changes(spark, root, 0, 2)
    got = {r["id"]: r["change_type"] for r in ch.collect()}
    assert got == {1: "delete", 2: "update", 4: "insert"}
    by_id = {r["id"]: r for r in ch.collect()}
    assert by_id[2]["old_v"] == "y" and by_id[2]["new_v"] == "Y2"
    assert by_id[1]["old_v"] == "x" and by_id[1]["new_v"] is None


def test_table_changes_replace_raises(spark, tmp_path):
    import pytest

    from pipeline_dataengineer_spark.operators.snapshots import (
        table_changes,
    )

    root = str(tmp_path / "cdfr")
    write_snapshot(spark.range(3), root)
    write_snapshot(spark.range(5), root)  # replace, not append
    with pytest.raises(ValueError, match="replace/compact"):
        table_changes(spark, root, 0, 1)


def test_table_changes_bad_range(spark, tmp_path):
    import pytest

    from pipeline_dataengineer_spark.operators.snapshots import (
        table_changes,
    )

    root = str(tmp_path / "cdfb")
    write_snapshot(spark.range(3), root)
    with pytest.raises(ValueError, match="bad version range"):
        table_changes(spark, root, 0, 5)


def test_bloom_point_lookup_skips_directories(spark, tmp_path):
    from pipeline_dataengineer_spark.operators.snapshots import (
        write_snapshot,
    )

    root = str(tmp_path / "bloom")
    write_snapshot(
        spark.range(0, 100).withColumn("v", F.col("id") * 2),
        root,
        bloom_cols=["id"],
    )
    append_snapshot(
        spark.range(1000, 1100).withColumn("v", F.col("id") * 2), root
    )
    append_snapshot(
        spark.range(2000, 2100).withColumn("v", F.col("id") * 2), root
    )
    full = read_snapshot(spark, root)
    assert full.count() == 300
    hit = read_snapshot(spark, root, point=("id", 1050))
    # correctness: same rows as a plain filter on the full table
    assert [r["v"] for r in hit.filter("id = 1050").collect()] == [2100]
    # skipping: the pruned plan touches fewer parquet files than full
    n_files_full = full.select(F.input_file_name()).distinct().count()
    n_files_hit = hit.select(F.input_file_name()).distinct().count()
    assert n_files_hit < n_files_full
    # absent key: bloom excludes every directory -> empty scan
    miss = read_snapshot(spark, root, point=("id", 555_555))
    assert miss.count() == 0


def test_bloom_inherited_and_null_safe(spark, tmp_path):
    from pipeline_dataengineer_spark.operators.snapshots import (
        read_manifest,
        write_snapshot,
    )

    root = str(tmp_path / "bloom2")
    write_snapshot(
        spark.createDataFrame([(1, "a"), (None, "b")], "id long, v string"),
        root,
        bloom_cols=["id"],
    )
    append_snapshot(
        spark.createDataFrame([(7, "c")], "id long, v string"), root
    )  # bloom_cols inherited without re-passing
    m = read_manifest(root)
    assert m["bloom_cols"] == ["id"] and len(m["dir_blooms"]) == 2
    got = read_snapshot(spark, root, point=("id", 7)).collect()
    assert [r["v"] for r in got if r["id"] == 7] == ["c"]


def test_bloom_point_rejected_on_mor(spark, tmp_path):
    import pytest

    from pipeline_dataengineer_spark.operators.snapshots import (
        upsert_append,
        write_snapshot,
    )

    root = str(tmp_path / "bloom3")
    write_snapshot(
        spark.createDataFrame([(1, "a")], "id long, v string"),
        root,
        bloom_cols=["id"],
    )
    upsert_append(
        spark, root,
        spark.createDataFrame([(1, "A")], "id long, v string"),
        keys=["id"],
    )
    with pytest.raises(ValueError, match="merge-on-read"):
        read_snapshot(spark, root, point=("id", 1))


def test_maintain_agg_view_incremental_equals_full(spark, tmp_path):
    from pipeline_dataengineer_spark.operators.incremental import (
        finalize_agg_state,
        partial_agg_state,
    )
    from pipeline_dataengineer_spark.operators.snapshots import (
        maintain_agg_view,
    )

    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    b1 = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0)], "g string, v double"
    )
    b2 = spark.createDataFrame(
        [("a", 5.0), ("c", 7.0)], "g string, v double"
    )
    write_snapshot(b1, src)
    m = maintain_agg_view(spark, src, view, ["g"], "v")
    assert m["source_version"] == 0
    append_snapshot(b2, src)
    m = maintain_agg_view(spark, src, view, ["g"], "v")
    assert m["source_version"] == 1
    got = finalize_agg_state(read_snapshot(spark, view), ["g"])
    full = finalize_agg_state(
        partial_agg_state(b1.union(b2), ["g"], "v"), ["g"]
    )
    as_rows = lambda df: sorted(tuple(r) for r in df.collect())
    assert as_rows(got) == as_rows(full)


def test_maintain_agg_view_rerun_is_noop(spark, tmp_path):
    from pipeline_dataengineer_spark.operators.snapshots import (
        maintain_agg_view,
    )

    src = str(tmp_path / "src2")
    view = str(tmp_path / "view2")
    write_snapshot(
        spark.createDataFrame([("a", 2.0)], "g string, v double"), src
    )
    m1 = maintain_agg_view(spark, src, view, ["g"], "v")
    m2 = maintain_agg_view(spark, src, view, ["g"], "v")
    assert m1["version"] == m2["version"]  # no new source: no publish
    row = read_snapshot(spark, view).collect()
    assert len(row) == 1 and row[0]["n"] == 1  # no double count


def test_maintain_agg_view_rejects_keyed_source(spark, tmp_path):
    import pytest

    from pipeline_dataengineer_spark.operators.snapshots import (
        maintain_agg_view,
        upsert_append,
    )

    src = str(tmp_path / "src3")
    view = str(tmp_path / "view3")
    write_snapshot(
        spark.createDataFrame([(1, "a", 2.0)], "id long, g string, v double"),
        src,
    )
    upsert_append(
        spark, src,
        spark.createDataFrame([(1, "a", 9.0)], "id long, g string, v double"),
        keys=["id"],
    )
    with pytest.raises(ValueError, match="append-only"):
        maintain_agg_view(spark, src, view, ["g"], "v")


def test_maintain_sketch_view_bitmap_exact_incremental(spark, tmp_path):
    from pipeline_dataengineer_spark.functions.sketches import bitmap_distinct
    from pipeline_dataengineer_spark.operators.snapshots import (
        maintain_sketch_view,
    )

    src = str(tmp_path / "sksrc")
    view = str(tmp_path / "skview")
    b1 = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 2), ("b", 7)], "g string, v int"
    )
    b2 = spark.createDataFrame(
        [("a", 2), ("a", 3), ("b", 7), ("c", 1)], "g string, v int"
    )
    write_snapshot(b1, src)
    m = maintain_sketch_view(spark, src, view, ["g"], "v", family="bitmap")
    assert m["source_version"] == 0 and m["sketch_family"] == "bitmap"
    append_snapshot(b2, src)
    maintain_sketch_view(spark, src, view, ["g"], "v", family="bitmap")
    got = {
        r["g"]: r["n_distinct"]
        for r in bitmap_distinct(read_snapshot(spark, view), ["g"]).collect()
    }
    # exact distinct over BOTH batches: a={1,2,3}, b={7}, c={1}
    assert got == {"a": 3, "b": 1, "c": 1}
    # re-run without new source versions publishes nothing
    m3 = maintain_sketch_view(spark, src, view, ["g"], "v", family="bitmap")
    assert bitmap_distinct(read_snapshot(spark, view), ["g"]).count() == 3


def test_maintain_sketch_view_kll_quantiles_converge(spark, tmp_path):
    from pipeline_dataengineer_spark.functions.sketches import kll_quantiles
    from pipeline_dataengineer_spark.operators.snapshots import (
        maintain_sketch_view,
    )

    src = str(tmp_path / "kllsrc")
    view = str(tmp_path / "kllview")
    b1 = spark.createDataFrame(
        [("g", float(v)) for v in range(0, 500)], "g string, v double"
    )
    b2 = spark.createDataFrame(
        [("g", float(v)) for v in range(500, 1000)], "g string, v double"
    )
    write_snapshot(b1, src)
    maintain_sketch_view(spark, src, view, ["g"], "v", family="kll")
    append_snapshot(b2, src)
    maintain_sketch_view(spark, src, view, ["g"], "v", family="kll")
    q = kll_quantiles(read_snapshot(spark, view), ["g"], [0.5]).collect()[0]
    # median of 0..999 within KLL rank error (k=200 -> ~1.65%)
    assert abs(q["q_0_5"] - 499.5) <= 1000 * 0.02


def test_check_constraints_gate_publish(spark, tmp_path):
    import pytest

    from pipeline_dataengineer_spark.operators.snapshots import (
        append_snapshot,
        current_version,
        read_snapshot,
        write_snapshot,
    )

    root = str(tmp_path / "ck")
    good = spark.createDataFrame([(1, "a"), (2, "b")], "id long, g string")
    write_snapshot(
        good, root,
        checks=[("not_null", "g"), ("accepted_values", "g", ["a", "b", "c"])],
    )
    assert current_version(root) == 0

    # violating delta: publish REFUSED, old version still current/readable
    bad = spark.createDataFrame([(3, None)], "id long, g string")
    with pytest.raises(ValueError, match="CHECK constraints"):
        append_snapshot(bad, root)
    assert current_version(root) == 0
    assert read_snapshot(spark, root).count() == 2

    # constraints are sticky — inherited without re-passing them
    ok = spark.createDataFrame([(3, "c")], "id long, g string")
    m = append_snapshot(ok, root)
    assert m["version"] == 1
    assert m["check_constraints"] == [
        ["not_null", "g"], ["accepted_values", "g", ["a", "b", "c"]]
    ]
    assert read_snapshot(spark, root).count() == 3

    # and still enforced on the next violating append
    with pytest.raises(ValueError, match="CHECK constraints"):
        append_snapshot(
            spark.createDataFrame([(4, "zz")], "id long, g string"), root
        )
    assert current_version(root) == 1


def test_stream_to_snapshot_to_incremental_view_e2e(spark, tmp_path):
    """The full streaming-lakehouse-MV loop: a checkpointed stream
    lands micro-batches into a snapshot table (exactly-once epochs),
    and maintain_agg_view advances the materialized aggregate from
    the table's CHANGE FEED — each refresh reads only the new
    directories, and the final state equals a full recompute."""
    import json as _json

    from pipeline_dataengineer_spark.operators.incremental import (
        finalize_agg_state,
        partial_agg_state,
    )
    from pipeline_dataengineer_spark.operators.snapshots import (
        maintain_agg_view,
    )
    from pipeline_dataengineer_spark.streaming.snapshot_sink import (
        snapshot_epoch_sink,
    )

    src = tmp_path / "mv_src"
    src.mkdir()
    table_root = str(tmp_path / "mv_table")
    view_root = str(tmp_path / "mv_view")
    schema = "g string, v double"

    def write_batch(name, rows):
        with open(src / name, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    def drain(ckpt):
        stream = spark.readStream.schema(schema).json(str(src))
        q = (
            stream.writeStream.foreachBatch(
                snapshot_epoch_sink(table_root, "mv_stream")
            )
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write_batch("b0.json", [{"g": "a", "v": 1.0}, {"g": "b", "v": 10.0}])
    drain("ck")
    m1 = maintain_agg_view(spark, table_root, view_root, ["g"], "v")

    write_batch("b1.json", [{"g": "a", "v": 5.0}, {"g": "c", "v": 7.0}])
    drain("ck")  # same checkpoint: only the new file processes
    m2 = maintain_agg_view(spark, table_root, view_root, ["g"], "v")
    assert m2["source_version"] > m1["source_version"]

    got = {
        r["g"]: (r["cnt"], r["total"])
        for r in finalize_agg_state(
            read_snapshot(spark, view_root), ["g"]
        ).select("g", "cnt", "total").collect()
    }
    assert got == {"a": (2, 6.0), "b": (1, 10.0), "c": (1, 7.0)}

    # replaying the stream from a FRESH checkpoint re-delivers the
    # same epochs: the ledger blocks double-appends, the view cursor
    # blocks double-counting
    drain("ck_replay")
    m3 = maintain_agg_view(spark, table_root, view_root, ["g"], "v")
    again = {
        r["g"]: (r["cnt"], r["total"])
        for r in finalize_agg_state(
            read_snapshot(spark, view_root), ["g"]
        ).select("g", "cnt", "total").collect()
    }
    assert again == got
