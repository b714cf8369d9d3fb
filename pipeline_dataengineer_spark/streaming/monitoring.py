"""Streaming observability: a StreamingQueryListener that turns query
progress into rows you can store, alert, and join.

A pipeline you can't see is a pipeline you can't operate: every
micro-batch's input rows, processing rate and duration land in an
in-memory ledger (and optionally a JSON-lines spool) keyed by query
id. The listener runs on the driver and receives Spark's own
progress events — zero overhead on the executors or the data path.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql.streaming import StreamingQueryListener


class ProgressLedger(StreamingQueryListener):
    """Collects per-batch progress for every streaming query on the
    session. Thread-safe (listener callbacks arrive on Spark's event
    bus thread). Attach with ``spark.streams.addListener(ledger)``;
    read ``ledger.records`` or spool to ``path`` for a durable
    ops log."""

    def __init__(self, path: str | None = None):
        self.records: list[dict] = []
        self._path = path
        self._lock = threading.Lock()

    def onQueryStarted(self, event) -> None:
        self._append({"event": "started", "id": str(event.id), "name": event.name})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._append(
            {
                "event": "progress",
                "id": str(p.id),
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "processed_rows_per_sec": p.processedRowsPerSecond,
                "duration_ms": (p.durationMs or {}).get("triggerExecution"),
                "timestamp": p.timestamp,
            }
        )

    def onQueryTerminated(self, event) -> None:
        self._append(
            {
                "event": "terminated",
                "id": str(event.id),
                "exception": event.exception,
            }
        )

    def onQueryIdle(self, event) -> None:
        pass

    def _append(self, rec: dict) -> None:
        with self._lock:
            self.records.append(rec)
            if self._path:
                with open(self._path, "a") as f:
                    f.write(json.dumps(rec, default=str) + "\n")

    def total_input_rows(self) -> int:
        with self._lock:
            return sum(
                r.get("num_input_rows") or 0
                for r in self.records
                if r["event"] == "progress"
            )
