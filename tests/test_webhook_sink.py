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
