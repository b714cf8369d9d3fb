"""Webhook/JSON-lines sink as a PySpark 4 Python DataSource WRITER.

The write-side twin of ``sources/rest.py``: the reference pushes
records OUT as JSON (its Kafka producer,
``src/kafka_client/kafka_stream_data.py:117-125``); this sink
generalizes that to any JSON-accepting endpoint through Spark's new
DataSource writer protocol — executors write partitions in parallel,
each returns a WriterCommitMessage, and the driver's commit()/abort()
sees every partition's outcome (the two-phase commit hook a real
webhook/queue sink uses for at-least-once delivery plus an audit
trail).

Transport is pluggable via the ``endpoint`` option:
- ``file:///dir``  — each partition appends newline-delimited JSON to
  its own file under the directory (used in tests; also genuinely
  useful as a spooling sink: per-partition files, no write
  contention, atomic-rename friendly);
- ``http(s)://...`` — per-batch POSTs via urllib (absent from the
  sandbox's network, exercised structurally through the file
  transport; the batching/commit logic is transport-independent).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class WebhookCommit(WriterCommitMessage):
    rows: int
    target: str


class WebhookWriter(DataSourceWriter):
    def __init__(self, options):
        self.endpoint = options.get("endpoint")
        if not self.endpoint:
            raise ValueError("webhook sink requires an `endpoint` option")
        self.batch_size = int(options.get("batch_size", "500"))

    def write(self, iterator: Iterator) -> WriterCommitMessage:
        """Runs ON THE EXECUTOR, once per partition: serialize rows to
        JSON in batches and deliver. Returns the partition's audit."""
        batch: list[str] = []
        n = 0
        target = self._open_target()
        for row in iterator:
            batch.append(json.dumps(row.asDict(), default=str))
            if len(batch) >= self.batch_size:
                self._deliver(target, batch)
                n += len(batch)
                batch = []
        if batch:
            self._deliver(target, batch)
            n += len(batch)
        return WebhookCommit(rows=n, target=target)

    def _open_target(self) -> str:
        if self.endpoint.startswith("file://"):
            d = self.endpoint.removeprefix("file://")
            os.makedirs(d, exist_ok=True)
            return os.path.join(d, f"part-{uuid.uuid4().hex}.jsonl")
        return self.endpoint

    def _deliver(self, target: str, lines: list[str]) -> None:
        if self.endpoint.startswith("file://"):
            with open(target, "a") as f:
                f.write("\n".join(lines) + "\n")
            return
        import urllib.request

        req = urllib.request.Request(
            target,
            data=("\n".join(lines)).encode(),
            headers={"Content-Type": "application/x-ndjson"},
        )
        urllib.request.urlopen(req, timeout=30).read()

    def commit(self, messages) -> None:
        """Driver-side: all partitions delivered. A transactional
        endpoint would flip its staging marker here; the file
        transport writes a _SUCCESS-style manifest with the audit."""
        if self.endpoint.startswith("file://"):
            d = self.endpoint.removeprefix("file://")
            manifest = {
                "partitions": [
                    {"rows": m.rows, "target": m.target} for m in messages
                ],
                "total_rows": sum(m.rows for m in messages),
            }
            with open(os.path.join(d, "_MANIFEST.json"), "w") as f:
                json.dump(manifest, f)

    def abort(self, messages) -> None:
        """Driver-side on failure: best-effort cleanup of partial
        partition files so a retry starts clean (at-least-once)."""
        if self.endpoint.startswith("file://"):
            for m in messages:
                if m is not None and os.path.exists(m.target):
                    os.remove(m.target)


class WebhookStreamWriter(DataSourceStreamWriter):
    """Streaming flavor: same executor-side partition writes, but the
    driver's commit/abort receives the micro-batch id — the epoch
    ledger a real endpoint uses for exactly-once idempotence (replayed
    batch ids can be skipped server-side). The file transport appends
    one manifest line per committed epoch."""

    def __init__(self, options):
        self._w = WebhookWriter(options)
        self.endpoint = self._w.endpoint

    def write(self, iterator: Iterator) -> WriterCommitMessage:
        return self._w.write(iterator)

    def commit(self, messages, batchId: int) -> None:
        if self.endpoint.startswith("file://"):
            d = self.endpoint.removeprefix("file://")
            os.makedirs(d, exist_ok=True)
            rec = {
                "batch_id": batchId,
                "total_rows": sum(m.rows for m in messages if m is not None),
            }
            with open(os.path.join(d, "_EPOCHS.jsonl"), "a") as f:
                f.write(json.dumps(rec) + "\n")

    def abort(self, messages, batchId: int) -> None:
        self._w.abort([m for m in messages if m is not None])


class WebhookDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "webhook"

    def writer(self, schema, overwrite: bool):
        return WebhookWriter(self.options)

    def streamWriter(self, schema, overwrite: bool):
        return WebhookStreamWriter(self.options)


def register_webhook_sink(spark) -> None:
    """Make ``df.write.format("webhook")`` available on the session."""
    spark.dataSource.register(WebhookDataSource)
