"""Streaming → versioned snapshot table, exactly-once per epoch.

``foreachBatch`` gives at-least-once: after a failure Spark RE-RUNS
the last uncommitted epoch, so a plain append sink double-applies it.
The standard fix is an idempotence ledger keyed by (stream, epoch) in
the sink's transaction domain — here the snapshot MANIFEST
(``operators/snapshots.py``), whose atomic pointer swap makes "data
visible" and "epoch recorded" ONE indivisible event: the epoch ledger
is a field of the same manifest version the data ships in, published
by the same rename. A crash anywhere before the swap leaves neither
visible; the retried epoch then re-runs cleanly.

- a re-delivered epoch (``epoch_id <= last recorded``) publishes
  NOTHING — the retry is invisible, which is exactly-once as far as
  any reader can observe;
- ``stream_id`` names the checkpoint lineage. A FRESH checkpoint
  restarts epoch numbering at 0, so it must get a new stream_id —
  content-level redelivery across lineages is the job of the key
  anti-join (``streaming/sinks.idempotent_foreach_batch``),
  composable beneath this ledger."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from pipeline_dataengineer_spark.operators import snapshots as snap


def last_applied_epoch(root: str, stream_id: str) -> int | None:
    if snap.current_version(root) is None:
        return None
    return snap.read_manifest(root).get("streams", {}).get(stream_id)


def snapshot_epoch_sink(
    root: str,
    stream_id: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function appending every micro-batch
    to the snapshot table at ``root`` exactly once per epoch."""

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        last = last_applied_epoch(root, stream_id)
        if last is not None and epoch_id <= last:
            return  # retried epoch: already visible, publish nothing
        out = transform(batch_df) if transform is not None else batch_df
        prev_v = snap.current_version(root)
        prev_paths = snap.read_manifest(root)["data_paths"] if prev_v is not None else []
        streams = (
            dict(snap.read_manifest(root).get("streams", {}))
            if prev_v is not None
            else {}
        )
        streams[stream_id] = epoch_id
        new_paths = prev_paths
        if not out.isEmpty():
            new_paths = prev_paths + [snap._write_data_dir(out, root)]
        # ONE publish carries the new data paths AND the ledger.
        snap._publish(
            root,
            new_paths,
            out.schema.simpleString(),
            None,
            prev_v,
            extra={"streams": streams},
        )

    return fn
