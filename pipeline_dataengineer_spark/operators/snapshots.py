"""Versioned snapshot tables: a minimal manifest layer over parquet.

The lakehouse primitive the parquet stage tables were missing:
readers must never observe a half-written table, re-runs must be
no-ops, and yesterday's data must stay addressable. Delta/Iceberg
solve this with a transaction log; at the scale of THIS engine's
stage tables the whole mechanism reduces to one invariant —

    a snapshot version = an immutable list of parquet directories,
    published by ATOMICALLY swapping a single small manifest file.

Layout under a table root:

    <root>/data/<uuid>/           immutable parquet directories
    <root>/_manifests/v00000N.json   one manifest per version
    <root>/_current                  atomic pointer (rename swap)

Write protocol: (1) write data into a fresh uuid directory, (2) write
the version manifest, (3) ``os.rename`` a temp pointer onto
``_current``. A crash anywhere before (3) leaves the previous version
readable and the orphan directory harmless (garbage-collectable by
listing dirs not referenced from any manifest). Rename is atomic on
POSIX filesystems and on HDFS; on S3 swap step (3) for a
conditional-PUT of the pointer object — the protocol shape is the
same.

Readers take NO locks: ``read_snapshot`` resolves ``_current`` (or an
explicit version — time travel) to a directory list and hands Spark a
plain multi-path parquet scan, so pushdown/pruning work unchanged.

Appends are LOGICAL: a new version lists the old directories plus one
delta directory — no rewrite of existing data (100-TB requirement).
``snapshot_corpus_append`` couples this with the near-dup ingest
delta (``pipelines.pretraining_corpus.incremental_corpus_append``):
re-delivering the same batch yields an empty delta and NO new
version, extending the idempotent-append law to the manifest."""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


def _manifest_dir(root: str) -> str:
    return os.path.join(root, "_manifests")


def _current_path(root: str) -> str:
    return os.path.join(root, "_current")


def current_version(root: str) -> int | None:
    """Version the atomic pointer names, or None for an empty table."""
    try:
        with open(_current_path(root)) as fh:
            return int(fh.read().strip())
    except FileNotFoundError:
        return None


def read_manifest(root: str, version: int | None = None) -> dict:
    v = current_version(root) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no published snapshot under {root!r}")
    with open(os.path.join(_manifest_dir(root), f"v{v:06d}.json")) as fh:
        return json.load(fh)


def history(root: str) -> list[dict]:
    """All published manifests, oldest first (time-travel index)."""
    d = _manifest_dir(root)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if name.startswith("v") and name.endswith(".json"):
            with open(os.path.join(d, name)) as fh:
                out.append(json.load(fh))
    return out


def _publish(root: str, data_paths: list[str], schema_ddl: str,
             watermark: str | None, parent: int | None,
             extra: dict | None = None) -> dict:
    """Steps (2)+(3) of the protocol: manifest file, then pointer
    swap. ``extra`` fields (e.g. a stream-epoch ledger) ride the SAME
    manifest, so data visibility and bookkeeping commit atomically."""
    version = 0 if parent is None else parent + 1
    manifest = {
        "version": version,
        "parent": parent,
        "data_paths": data_paths,
        "schema": schema_ddl,
        "watermark": watermark,
        "created_utc": time.time(),
        **(extra or {}),
    }
    os.makedirs(_manifest_dir(root), exist_ok=True)
    mpath = os.path.join(_manifest_dir(root), f"v{version:06d}.json")
    with open(mpath, "w") as fh:
        json.dump(manifest, fh)
    tmp = _current_path(root) + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        fh.write(str(version))
    os.rename(tmp, _current_path(root))  # the atomic commit point
    return manifest


def _write_data_dir(df: DataFrame, root: str) -> str:
    path = os.path.join(root, "data", uuid.uuid4().hex)
    df.write.parquet(path)
    return path


def _carry_streams(root: str) -> dict:
    """Preserve the stream-epoch ledger (snapshot_sink) across batch
    publishes — losing it would let a retried epoch double-apply."""
    v = current_version(root)
    if v is None:
        return {}
    streams = read_manifest(root).get("streams")
    return {"streams": streams} if streams else {}


def write_snapshot(df: DataFrame, root: str, watermark: str | None = None) -> dict:
    """Publish ``df`` as the next full snapshot (REPLACE semantics:
    the new version lists only the new directory). Returns the
    manifest. Crash-safe per the module protocol."""
    path = _write_data_dir(df, root)
    return _publish(
        root, [path], df.schema.simpleString(), watermark,
        current_version(root), extra=_carry_streams(root),
    )


def append_snapshot(df: DataFrame, root: str, watermark: str | None = None) -> dict:
    """Publish a LOGICAL append: previous directories + one new delta
    directory. Existing data is never rewritten. An EMPTY df is a
    no-op returning the current manifest unchanged (idempotent
    re-runs publish nothing)."""
    prev_v = current_version(root)
    if df.isEmpty():
        return read_manifest(root) if prev_v is not None else _publish(
            root, [], df.schema.simpleString(), watermark, None
        )
    path = _write_data_dir(df, root)
    prev_paths = read_manifest(root)["data_paths"] if prev_v is not None else []
    return _publish(
        root, prev_paths + [path], df.schema.simpleString(), watermark,
        prev_v, extra=_carry_streams(root),
    )


def read_snapshot(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Scan a snapshot (current, or ``version`` for time travel) as a
    plain multi-path parquet read — pushdown and pruning intact."""
    m = read_manifest(root, version)
    if not m["data_paths"]:
        return spark.createDataFrame([], m["schema"])
    return spark.read.parquet(*m["data_paths"])


def merge_into_snapshot(
    spark: SparkSession, root: str, source: DataFrame, keys: list[str]
) -> dict:
    """MERGE (upsert) semantics against a snapshot table: matched
    keys take the source row, unmatched target rows survive, new
    source keys insert — then the result publishes as the next FULL
    version (a merge rewrites matched rows, so the logical-append
    shortcut doesn't apply; at partition scale, rewrite only the
    partitions the source touches and carry the rest forward by
    path, same manifest mechanics). Time travel keeps the pre-merge
    version addressable."""
    from pipeline_dataengineer_spark.operators.incremental import upsert_snapshot

    target = read_snapshot(spark, root)
    return write_snapshot(upsert_snapshot(target, source, keys), root)


def rollback(root: str, version: int) -> dict:
    """Publish a NEW version whose content is an old version's
    directory list (roll forward to the past — history is never
    erased, same as Delta RESTORE)."""
    old = read_manifest(root, version)
    return _publish(
        root,
        old["data_paths"],
        old["schema"],
        old["watermark"],
        current_version(root),
    )


def snapshot_corpus_append(
    spark: SparkSession,
    root: str,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **clean_kwargs,
) -> dict:
    """The reference's incremental-ingest loop, durable end to end:
    current snapshot = the existing corpus, batch → clean/near-dup/
    anti-join delta (``incremental_corpus_append``), delta → logical
    append + atomic publish. Re-running a delivered batch computes an
    empty delta and publishes NOTHING — idempotence extended through
    the manifest. Returns the (possibly unchanged) current manifest."""
    from pipeline_dataengineer_spark.pipelines.pretraining_corpus import (
        incremental_corpus_append,
    )

    if current_version(root) is None:
        from pipeline_dataengineer_spark.operators.corpus import clean_corpus

        first = clean_corpus(
            batch, text_col=text_col, id_col=id_col, **clean_kwargs
        ).select(batch.columns)
        return write_snapshot(first, root)
    existing = read_snapshot(spark, root)
    delta = incremental_corpus_append(
        existing, batch, id_col=id_col, text_col=text_col, **clean_kwargs
    )
    try:
        if delta.isEmpty():
            return read_manifest(root)
        return append_snapshot(delta, root)
    finally:
        delta.unpersist()
