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
    keys: list[str] | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function appending every micro-batch
    to the snapshot table at ``root`` exactly once per epoch.

    ``keys`` turns the sink into a streaming UPSERT: each epoch's
    directory shadows earlier rows with the same key at read time
    (merge-on-read, ``operators/snapshots.upsert_append`` semantics),
    so a CDC stream materializes a current-state table with
    exactly-once epochs AND last-writer-wins keys — compaction folds
    the read-side window away whenever convenient.

    All table metadata the manifest carries (merge keys, tombstones,
    stat cols, schema-evolution flag) is preserved across stream
    publishes — a streaming epoch must never make deleted keys
    resurrect or stats pruning forget a directory."""

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        last = last_applied_epoch(root, stream_id)
        if last is not None and epoch_id <= last:
            return  # retried epoch: already visible, publish nothing
        out = transform(batch_df) if transform is not None else batch_df
        prev_v = snap.current_version(root)
        prev = snap.read_manifest(root) if prev_v is not None else {}
        prev_paths = prev.get("data_paths", [])
        streams = dict(prev.get("streams", {}))
        streams[stream_id] = epoch_id
        extra = {"streams": streams}
        for carried in ("merge_keys", "tombstone_dirs", "stat_cols",
                        "dir_stats", "mixed_schemas"):
            if prev.get(carried):
                extra[carried] = prev[carried]
        if keys is not None:
            if extra.get("merge_keys") not in (None, keys):
                raise ValueError(
                    f"table merge_keys={extra['merge_keys']} != sink keys={keys}"
                )
            extra["merge_keys"] = keys
        new_paths = prev_paths
        if not out.isEmpty():
            path = snap._write_data_dir(out, root)
            new_paths = prev_paths + [path]
            if extra.get("stat_cols"):
                ds = dict(extra.get("dir_stats", {}))
                ds[path] = snap._dir_stats(
                    out.sparkSession.read.parquet(path), extra["stat_cols"]
                )
                extra["dir_stats"] = ds
        # ONE publish carries the new data paths AND the ledger.
        snap._publish(
            root,
            new_paths,
            out.schema.simpleString(),
            prev.get("watermark"),
            prev_v,
            extra=extra,
        )

    return fn
