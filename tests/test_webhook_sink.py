"""Python DataSource WRITER (webhook sink): executor-parallel
partition writes, commit manifest, JSON fidelity."""

from __future__ import annotations

import glob
import json

from pipeline_dataengineer_spark.sinks.webhook import register_webhook_sink


def test_webhook_sink_writes_all_rows_with_manifest(spark, tmp_path):
    register_webhook_sink(spark)
    out = tmp_path / "hook"
    df = spark.range(1000).selectExpr("id", "id * 2 AS v").repartition(4)
    (
        df.write.format("webhook")
        .option("endpoint", f"file://{out}")
        .option("batch_size", "100")
        .mode("append")
        .save()
    )
    rows = []
    for f in glob.glob(f"{out}/part-*.jsonl"):
        with open(f) as fh:
            rows += [json.loads(line) for line in fh if line.strip()]
    assert len(rows) == 1000
    assert {r["id"] for r in rows} == set(range(1000))
    assert all(r["v"] == r["id"] * 2 for r in rows)
    # driver-side commit saw every partition's audit
    manifest = json.load(open(f"{out}/_MANIFEST.json"))
    assert manifest["total_rows"] == 1000
    assert len(manifest["partitions"]) == 4


def test_webhook_stream_writer_commits_epochs(spark, tmp_path):
    import json as _json

    from pyspark.sql import types as T

    register_webhook_sink(spark)
    out = tmp_path / "hook_stream"
    src = tmp_path / "src"
    src.mkdir()
    schema = T.StructType([T.StructField("id", T.LongType())])

    def drain():
        stream = spark.readStream.schema(schema).json(str(src))
        q = (
            stream.writeStream.format("webhook")
            .option("endpoint", f"file://{out}")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    (src / "b0.json").write_text("\n".join(_json.dumps({"id": i}) for i in range(50)))
    drain()
    (src / "b1.json").write_text("\n".join(_json.dumps({"id": i}) for i in range(50, 80)))
    drain()

    import glob as _glob

    rows = []
    for f in _glob.glob(f"{out}/part-*.jsonl"):
        with open(f) as fh:
            rows += [_json.loads(line) for line in fh if line.strip()]
    assert {r["id"] for r in rows} == set(range(80))
    epochs = [_json.loads(l) for l in open(f"{out}/_EPOCHS.jsonl") if l.strip()]
    # one committed epoch per drained micro-batch, with its row audit
    assert sorted(e["total_rows"] for e in epochs) == [30, 50]
    assert len({e["batch_id"] for e in epochs}) == 2


def test_cdc_outbox_exports_change_feed(spark, tmp_path):
    """The outbox composition: a keyed snapshot table's CHANGE FEED
    between two versions is exported through the webhook sink —
    inserts and updates leave as JSON events with their change_type,
    the downstream contract for notifying external systems without
    dual writes."""
    import json as _json

    from pipeline_dataengineer_spark.operators.snapshots import (
        table_changes,
        upsert_append,
        write_snapshot,
    )

    register_webhook_sink(spark)
    root = str(tmp_path / "outbox_table")
    hook = tmp_path / "outbox_hook"

    write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        root,
    )
    upsert_append(
        spark,
        root,
        spark.createDataFrame([(2, "b2"), (3, "c")], "id long, v string"),
        keys=["id"],
    )
    feed = table_changes(spark, root, 0, 1)
    (
        feed.write.format("webhook")
        .option("endpoint", f"file://{hook}")
        .mode("append")
        .save()
    )
    events = []
    for f in glob.glob(f"{hook}/part-*.jsonl"):
        with open(f) as fh:
            events += [_json.loads(line) for line in fh if line.strip()]
    got = {(e["id"], e["new_v"], e["change_type"]) for e in events}
    assert (3, "c", "insert") in got
    assert (2, "b2", "update") in got  # the update travels too
    manifest = _json.load(open(f"{hook}/_MANIFEST.json"))
    assert manifest["total_rows"] == len(events)
