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


def _dir_stats(df: DataFrame, stat_cols: list[str]) -> dict:
    """Per-directory min/max for the manifest, computed by re-reading
    the JUST-WRITTEN parquet directory (not the input plan — a
    non-deterministic plan could stat differently than it wrote; and
    the footer-backed scan makes min/max nearly free). Nulls are
    ignored by min/max; an all-null or empty column stats as
    None/None, which the pruner treats as 'cannot exclude'."""
    from pyspark.sql import functions as F

    aggs = []
    for c in stat_cols:
        aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
    row = df.agg(*aggs).collect()[0]

    def plain(v):
        return v.isoformat() if hasattr(v, "isoformat") else v

    return {
        c: [plain(row[f"__min_{c}"]), plain(row[f"__max_{c}"])]
        for c in stat_cols
    }


def _carry_streams(root: str) -> dict:
    """Preserve the stream-epoch ledger (snapshot_sink) across batch
    publishes — losing it would let a retried epoch double-apply."""
    v = current_version(root)
    if v is None:
        return {}
    streams = read_manifest(root).get("streams")
    return {"streams": streams} if streams else {}


def _inherit_stat_cols(root: str, stat_cols: list[str] | None) -> list[str]:
    if stat_cols is not None:
        return stat_cols
    v = current_version(root)
    return read_manifest(root).get("stat_cols", []) if v is not None else []


def _inherit_bloom_cols(root: str, bloom_cols: list[str] | None) -> list[str]:
    if bloom_cols is not None:
        return bloom_cols
    v = current_version(root)
    return read_manifest(root).get("bloom_cols", []) if v is not None else []


def _inherit_checks(root: str, checks: list | None) -> list:
    if checks is not None:
        return [list(c) for c in checks]
    v = current_version(root)
    return read_manifest(root).get("check_constraints", []) if v is not None else []


def _enforce_checks(spark: SparkSession, path: str, checks: list) -> None:
    """CHECK-constraint gate: run the (quality.run_checks) rule list
    against the just-written delta directory BEFORE the manifest
    publish. A violation raises and publishes NOTHING — the previous
    snapshot stays current (the orphaned data dir is invisible and
    vacuumable), which is the write-side half of the table's ACID
    story: readers can never observe constraint-violating rows."""
    if not checks:
        return
    from pipeline_dataengineer_spark.operators.quality import run_checks

    report = run_checks(spark.read.parquet(path), [tuple(c) for c in checks])
    bad = [
        (r["rule"], r["n_violations"])
        for r in report.collect()
        if not r["passed"]
    ]
    if bad:
        raise ValueError(
            "snapshot publish rejected by CHECK constraints: "
            + ", ".join(f"{rule} ({n} violations)" for rule, n in bad)
        )


def write_snapshot(
    df: DataFrame,
    root: str,
    watermark: str | None = None,
    stat_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    checks: list | None = None,
) -> dict:
    """Publish ``df`` as the next full snapshot (REPLACE semantics:
    the new version lists only the new directory). Returns the
    manifest. Crash-safe per the module protocol.

    ``stat_cols`` (inherited from the previous manifest when omitted)
    records per-directory min/max in the manifest — the data-skipping
    index ``read_snapshot(..., prune=...)`` uses to drop whole
    directories before Spark ever lists a file."""
    stat_cols = _inherit_stat_cols(root, stat_cols)
    bloom_cols = _inherit_bloom_cols(root, bloom_cols)
    checks = _inherit_checks(root, checks)
    path = _write_data_dir(df, root)
    _enforce_checks(df.sparkSession, path, checks)
    extra = _carry_streams(root)
    if checks:
        extra["check_constraints"] = checks
    if stat_cols:
        extra["stat_cols"] = stat_cols
        extra["dir_stats"] = {
            path: _dir_stats(df.sparkSession.read.parquet(path), stat_cols)
        }
    if bloom_cols:
        extra["bloom_cols"] = bloom_cols
        extra["dir_blooms"] = {
            path: _dir_blooms(df.sparkSession.read.parquet(path), bloom_cols)
        }
    return _publish(
        root, [path], df.schema.simpleString(), watermark,
        current_version(root), extra=extra,
    )


def append_snapshot(
    df: DataFrame,
    root: str,
    watermark: str | None = None,
    evolve_schema: bool = False,
    stat_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    checks: list | None = None,
) -> dict:
    """Publish a LOGICAL append: previous directories + one new delta
    directory. Existing data is never rewritten. An EMPTY df is a
    no-op returning the current manifest unchanged (idempotent
    re-runs publish nothing).

    Schema evolution: by default a delta whose schema differs from
    the table's is REJECTED (the common production guard — silent
    drift corrupts downstream readers). With ``evolve_schema=True``
    the append publishes and the manifest records the evolved union
    schema plus ``mixed_schemas: true``, which tells ``read_snapshot``
    to turn on parquet schema merging for this table (columns absent
    in older directories read as NULL — same additive-column
    semantics as Delta's mergeSchema). The flag is sticky: once a
    table holds mixed directory schemas, every later version carries
    it."""
    prev_v = current_version(root)
    if df.isEmpty():
        return read_manifest(root) if prev_v is not None else _publish(
            root, [], df.schema.simpleString(), watermark, None
        )
    stat_cols = _inherit_stat_cols(root, stat_cols)
    bloom_cols = _inherit_bloom_cols(root, bloom_cols)
    checks = _inherit_checks(root, checks)
    extra = _carry_streams(root)
    schema_ddl = df.schema.simpleString()
    prev_paths: list[str] = []
    dir_stats: dict = {}
    dir_blooms: dict = {}
    if prev_v is not None:
        prev = read_manifest(root)
        prev_paths = prev["data_paths"]
        dir_stats = dict(prev.get("dir_stats", {}))
        dir_blooms = dict(prev.get("dir_blooms", {}))
        if prev.get("merge_keys"):
            # a plain append to a merge-on-read table must keep the
            # resolve metadata or deleted/shadowed keys resurrect
            extra["merge_keys"] = prev["merge_keys"]
            if prev.get("tombstone_dirs"):
                extra["tombstone_dirs"] = prev["tombstone_dirs"]
        if prev_paths and prev["schema"] != schema_ddl:
            if not evolve_schema:
                raise ValueError(
                    f"append schema {schema_ddl} != table schema "
                    f"{prev['schema']}; pass evolve_schema=True to evolve"
                )
            extra["mixed_schemas"] = True
            schema_ddl = _union_schema_ddl(prev["schema"], df)
        if prev.get("mixed_schemas"):
            extra["mixed_schemas"] = True
    path = _write_data_dir(df, root)
    # CHECK constraints gate the DELTA only (history was checked at
    # its own publish time); sticky via the manifest like stat_cols
    _enforce_checks(df.sparkSession, path, checks)
    if checks:
        extra["check_constraints"] = checks
    if stat_cols:
        dir_stats[path] = _dir_stats(
            df.sparkSession.read.parquet(path), stat_cols
        )
        extra["stat_cols"] = stat_cols
        extra["dir_stats"] = dir_stats
    if bloom_cols:
        dir_blooms[path] = _dir_blooms(
            df.sparkSession.read.parquet(path), bloom_cols
        )
        extra["bloom_cols"] = bloom_cols
        extra["dir_blooms"] = dir_blooms
    return _publish(
        root, prev_paths + [path], schema_ddl, watermark, prev_v, extra=extra,
    )


def _union_schema_ddl(prev_ddl: str, delta: DataFrame) -> str:
    """Evolved table schema = previous columns (order kept) + columns
    only the delta has. Column type CHANGES are left to the parquet
    merge to accept (upcast) or reject (conflict) at read time."""
    from pyspark.sql import types as T

    prev = T._parse_datatype_string(prev_ddl)
    fields = list(prev.fields)
    have = {f.name for f in fields}
    fields += [f for f in delta.schema.fields if f.name not in have]
    return T.StructType(fields).simpleString()


_BLOOM_BITS = 1024
_BLOOM_HASHES = 3


def _bloom_positions(df, col: str):
    """The bloom bit positions of ``col``'s values, as a Spark column
    expression array — xxhash64(value, seed) mod bits per hash. Using
    the ENGINE's hash for both build and probe sidesteps reimplementing
    XXH64 driver-side (the probe runs a 1-row Spark job)."""
    from pyspark.sql import functions as F

    return F.array(
        *[
            F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(_BLOOM_BITS))
            for i in range(_BLOOM_HASHES)
        ]
    )


def _dir_blooms(df, bloom_cols: list[str]) -> dict:
    """Per-column bloom filter of a just-written directory, encoded as
    a hex string. The aggregate collects DISTINCT bit positions (at
    most _BLOOM_BITS rows per column — bounded driver traffic, same
    contract as _dir_stats min/max)."""
    from pyspark.sql import functions as F

    out = {}
    for c in bloom_cols:
        rows = (
            df.filter(F.col(c).isNotNull())
            .select(F.explode(_bloom_positions(df, c)).alias("p"))
            .distinct()
            .collect()
        )
        bits = 0
        for r in rows:
            bits |= 1 << int(r["p"])
        out[c] = f"{bits:x}"
    return out


def _probe_bloom(spark, value, hex_bloom: str) -> bool:
    """True if ``value`` MAY be present (all its bits set)."""
    from pyspark.sql import functions as F

    probe = spark.createDataFrame([(value,)], ["v"])
    pos = [
        int(r["p"])
        for r in probe.select(
            F.explode(_bloom_positions(probe, "v")).alias("p")
        ).collect()
    ]
    bits = int(hex_bloom or "0", 16)
    return all(bits & (1 << p) for p in pos)


def read_snapshot(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    prune: tuple | None = None,
    point: tuple | None = None,
) -> DataFrame:
    """Scan a snapshot (current, or ``version`` for time travel) as a
    plain multi-path parquet read — pushdown and pruning intact.
    Tables that ever took an evolved-schema append scan with parquet
    ``mergeSchema`` (footer-merge cost paid only by such tables).

    ``prune=(col, lo, hi)`` is MANIFEST-LEVEL data skipping: data
    directories whose recorded [min, max] for ``col`` cannot
    intersect [lo, hi] are dropped before Spark lists a single file —
    the Iceberg/Delta stats-pruning shape, one manifest read instead
    of a footer per file. Either bound may be None (one-sided). It
    only SKIPS directories; apply the row-level filter on the result
    as usual (parquet row-group pruning then handles the rest). A
    directory with no recorded stats for the column is always kept
    (correctness over optimism)."""
    m = read_manifest(root, version)
    paths = m["data_paths"]
    merge_keys = m.get("merge_keys")
    if (prune is not None or point is not None) and merge_keys:
        # dropping a directory can resurrect a row it shadows —
        # stats/bloom pruning is only sound on append-only tables
        raise ValueError("prune=/point= is not supported on a "
                         "merge-on-read table; compact_snapshot first")
    if point is not None and paths:
        # bloom-filter point-lookup skipping: drop directories whose
        # bloom PROVABLY excludes the value. A missing bloom keeps the
        # directory (correctness over optimism); false positives only
        # keep extra directories, never drop a real one.
        pcol, pval = point
        blooms = m.get("dir_blooms", {})
        paths = [
            p
            for p in paths
            if p not in blooms
            or pcol not in blooms[p]
            or _probe_bloom(spark, pval, blooms[p][pcol])
        ]
    if prune is not None and paths:
        col, lo, hi = prune
        stats = m.get("dir_stats", {})
        kept = []
        for p in paths:
            mn_mx = stats.get(p, {}).get(col)
            if mn_mx is None or mn_mx[0] is None or mn_mx[1] is None:
                kept.append(p)
                continue
            mn, mx = mn_mx
            if (hi is not None and mn > hi) or (lo is not None and mx < lo):
                continue  # provably disjoint -> skip whole directory
            kept.append(p)
        paths = kept
    if not paths:
        return spark.createDataFrame([], m["schema"])
    reader = spark.read
    if m.get("mixed_schemas"):
        reader = reader.option("mergeSchema", "true")
    if merge_keys:
        # merge-on-read resolve: later directories win per key. Each
        # directory keeps its position as __ord (a literal riding each
        # scan — no extra pass), one key-window picks the survivor.
        # Tombstone dirs (delete_append) carry only key columns; their
        # rows join the race with __tomb=1 and, when they win, the key
        # is filtered out entirely.
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        tombs = set(m.get("tombstone_dirs", []))
        parts = []
        for i, p in enumerate(paths):
            part = reader.parquet(p).withColumn("__ord", F.lit(i))
            part = part.withColumn("__tomb", F.lit(1 if p in tombs else 0))
            parts.append(part)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p, allowMissingColumns=True)
        w = Window.partitionBy(*merge_keys).orderBy(F.col("__ord").desc())
        return (
            u.withColumn("__rn", F.row_number().over(w))
            .filter((F.col("__rn") == 1) & (F.col("__tomb") == 0))
            .drop("__ord", "__rn", "__tomb")
        )
    return reader.parquet(*paths)


def expire_snapshots(root: str, keep_last: int = 2) -> dict:
    """VACUUM: drop all but the newest ``keep_last`` versions and
    delete every data directory no RETAINED manifest references
    (logical appends share directories across versions, so a dir is
    removable only when the LAST retained version that listed it is
    gone). Orphan dirs from crashed writes (referenced by no manifest
    at all) are collected too. The current version is always
    retained. Returns an audit dict — never silent."""
    import shutil

    cur = current_version(root)
    if cur is None:
        return {"removed_versions": [], "removed_dirs": [], "kept_versions": []}
    versions = sorted(m["version"] for m in history(root))
    keep = set(versions[-max(1, keep_last):]) | {cur}
    drop = [v for v in versions if v not in keep]
    live: set[str] = set()
    for v in keep:
        live.update(read_manifest(root, v)["data_paths"])
    removed_dirs: list[str] = []
    data_root = os.path.join(root, "data")
    if os.path.isdir(data_root):
        for name in os.listdir(data_root):
            path = os.path.join(data_root, name)
            if path not in live:
                shutil.rmtree(path, ignore_errors=True)
                removed_dirs.append(path)
    for v in drop:
        os.remove(os.path.join(_manifest_dir(root), f"v{v:06d}.json"))
    return {
        "removed_versions": drop,
        "removed_dirs": sorted(removed_dirs),
        "kept_versions": sorted(keep),
    }


def compact_snapshot(
    spark: SparkSession, root: str, target_mb: int = 128,
    zorder_by: list[str] | None = None, num_files: int | None = None,
) -> dict:
    """OPTIMIZE: rewrite the current snapshot's directories into one
    fresh directory with ~target_mb files (small-file compaction) and
    publish it as the next FULL version — content identical, layout
    better; the pre-compaction version stays addressable until
    ``expire_snapshots``. Sizing uses the bytes the retained
    manifest's directories actually hold, not a guess.

    ``zorder_by`` re-clusters rows along the Morton curve of those
    columns during the rewrite (OPTIMIZE ZORDER BY): each output file
    then covers a compact bounding box in that column space, so
    multi-column filters prune files via parquet min/max — and the
    manifest-level ``stat_cols`` skipping composes on top for the
    directory level."""
    m = read_manifest(root)
    total = 0
    for d in m["data_paths"]:
        for base, _dirs, files in os.walk(d):
            total += sum(
                os.path.getsize(os.path.join(base, f))
                for f in files
                if f.endswith(".parquet")
            )
    n_out = num_files or max(1, total // (target_mb * 1024 * 1024) + 1)
    df = read_snapshot(spark, root)
    if zorder_by:
        from pipeline_dataengineer_spark.operators.layout import zorder_layout

        df = zorder_layout(df, zorder_by, num_files=int(n_out))
    else:
        df = df.coalesce(int(n_out))
    out = write_snapshot(df, root, watermark=m.get("watermark"))
    out["compacted_from"] = m["version"]
    return out


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

    signature_store = clean_kwargs.pop("signature_store", None)
    if current_version(root) is None:
        from pipeline_dataengineer_spark.operators.corpus import clean_corpus

        first = clean_corpus(
            batch, text_col=text_col, id_col=id_col, **clean_kwargs
        ).select(batch.columns)
        m0 = write_snapshot(first, root)
        if signature_store is not None:
            from pipeline_dataengineer_spark.operators.dedup import (
                minhash_signatures,
            )

            minhash_signatures(
                read_snapshot(spark, root), id_col, text_col
            ).write.mode("overwrite").parquet(signature_store)
        return m0
    existing = read_snapshot(spark, root)
    delta = incremental_corpus_append(
        existing, batch, id_col=id_col, text_col=text_col,
        signature_store=signature_store, **clean_kwargs
    )
    try:
        if delta.isEmpty():
            return read_manifest(root)
        return append_snapshot(delta, root)
    finally:
        delta.unpersist()


def upsert_append(
    spark: SparkSession, root: str, source: DataFrame, keys: list[str]
) -> dict:
    """MERGE-ON-READ upsert: publish ``source`` as a logical append
    whose rows SHADOW earlier rows with the same key at read time —
    write cost is one delta directory (vs ``merge_into_snapshot``'s
    full rewrite), read cost is a key window until
    ``compact_snapshot`` folds the shadowing back into one plain
    directory (exactly the Hudi MOR / Delta deletion-vector trade).

    The manifest records ``merge_keys``; ``read_snapshot`` sees it
    and resolves last-writer-wins by directory order. ``source``
    must be key-unique within the batch (dedup upstream — ordering
    inside one directory is not defined). Schema must match the
    table (no evolution through the MOR path; compact first)."""
    m = read_manifest(root)
    if m.get("merge_keys") not in (None, keys):
        raise ValueError(
            f"table already has merge_keys={m.get('merge_keys')}; "
            f"got {keys}"
        )
    if source.isEmpty():
        return m
    if m["data_paths"] and m["schema"] != source.schema.simpleString():
        raise ValueError("upsert schema must match table schema")
    path = _write_data_dir(source, root)
    extra = _carry_streams(root)
    extra["merge_keys"] = keys
    if m.get("tombstone_dirs"):
        extra["tombstone_dirs"] = m["tombstone_dirs"]
    stat_cols = m.get("stat_cols", [])
    if stat_cols:
        ds = dict(m.get("dir_stats", {}))
        ds[path] = _dir_stats(spark.read.parquet(path), stat_cols)
        extra["stat_cols"] = stat_cols
        extra["dir_stats"] = ds
    if m.get("mixed_schemas"):
        extra["mixed_schemas"] = True
    return _publish(
        root, m["data_paths"] + [path], m["schema"], m.get("watermark"),
        m["version"], extra=extra,
    )


def delete_append(
    spark: SparkSession, root: str, keys_df: DataFrame, keys: list[str]
) -> dict:
    """MERGE-ON-READ delete (the GDPR-erasure shape): publish a
    tombstone directory holding ONLY the key columns; at read time a
    tombstone shadows every earlier row with that key, exactly like
    an upsert whose payload is "gone". Write cost is one tiny
    directory — no rewrite of the data being deleted; readers stop
    seeing the rows at the next manifest resolve, and
    ``compact_snapshot`` + ``expire_snapshots`` later remove the
    bytes themselves (erasure becomes physical once the old versions
    are vacuumed).

    Ordering composes with ``upsert_append``: directories resolve in
    publish order, so delete-then-reinsert and upsert-then-delete
    both do what they say."""
    m = read_manifest(root)
    if m.get("merge_keys") not in (None, keys):
        raise ValueError(
            f"table already has merge_keys={m.get('merge_keys')}; got {keys}"
        )
    tomb = keys_df.select(*keys).distinct()
    if tomb.isEmpty():
        return m
    path = _write_data_dir(tomb, root)
    extra = _carry_streams(root)
    extra["merge_keys"] = keys
    extra["tombstone_dirs"] = m.get("tombstone_dirs", []) + [path]
    if m.get("stat_cols"):
        extra["stat_cols"] = m["stat_cols"]
        extra["dir_stats"] = m.get("dir_stats", {})
    if m.get("mixed_schemas"):
        extra["mixed_schemas"] = True
    return _publish(
        root, m["data_paths"] + [path], m["schema"], m.get("watermark"),
        m["version"], extra=extra,
    )


def register_snapshot(
    spark: SparkSession,
    name: str,
    root: str,
    version: int | None = None,
    prune: tuple | None = None,
) -> DataFrame:
    """Expose a snapshot (current or time-travel, optionally
    manifest-pruned) as a temp view so plain ``spark.sql`` works over
    it — MOR resolution and schema merging included, since the view
    wraps ``read_snapshot``'s plan. Re-registering the same name
    repoints it (each call resolves the manifest fresh; a long-lived
    session sees new versions by re-registering)."""
    df = read_snapshot(spark, root, version=version, prune=prune)
    df.createOrReplaceTempView(name)
    return df


def table_changes(
    spark: SparkSession,
    root: str,
    from_version: int,
    to_version: int | None = None,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change data feed between two snapshot versions — the
    Delta/Iceberg ``table_changes`` surface over this engine's
    manifest layer.

    Two regimes, chosen by what the table IS (from its manifest):

    - **append-only table** (no merge_keys, no tombstones anywhere in
      the version range): the changes are EXACTLY the data
      directories added after ``from_version`` — read just those
      dirs, label every row ``insert``. Cost scales with the delta,
      never the table: this is the reason CDF exists.
    - **keyed (MOR) table**: resolve both versions via
      ``read_snapshot`` (shadowing + tombstones applied) and diff
      states by key (``incremental.snapshot_diff``) — emits
      insert/update/delete with old_/new_ value columns. Cost is a
      two-sided key shuffle; exact by construction.

    ``compare_cols`` limits the keyed diff's change detection (and
    payload) to the named columns; default = all non-key columns.
    """
    from pyspark.sql import functions as F

    from pipeline_dataengineer_spark.operators.incremental import (
        snapshot_diff,
    )

    cur = current_version(root)
    to_version = cur if to_version is None else to_version
    if not (0 <= from_version <= to_version <= (cur if cur is not None else -1)):
        raise ValueError(
            f"bad version range [{from_version}, {to_version}] "
            f"(current={cur})"
        )
    m_to = read_manifest(root, to_version)
    m_from = read_manifest(root, from_version)
    keyed = any(
        read_manifest(root, v).get("merge_keys")
        or read_manifest(root, v).get("tombstone_dirs")
        for v in range(from_version, to_version + 1)
    )
    if not keyed:
        if not set(m_from["data_paths"]) <= set(m_to["data_paths"]):
            raise ValueError(
                "version range includes a replace/compact on an unkeyed "
                "table — row identity is undefined; diff explicit reads "
                "or use a merge-keyed table"
            )
        new_dirs = [
            p for p in m_to["data_paths"] if p not in set(m_from["data_paths"])
        ]
        base = read_snapshot(spark, root, version=to_version)
        if not new_dirs:
            return base.limit(0).withColumn(
                "change_type", F.lit("insert")
            )
        reader = spark.read
        if m_to.get("merged_schema"):
            reader = reader.option("mergeSchema", "true")
        inserted = reader.parquet(*new_dirs)
        for f in base.schema.fields:  # evolution NULL-fill parity
            if f.name not in inserted.columns:
                inserted = inserted.withColumn(
                    f.name, F.lit(None).cast(f.dataType)
                )
        return inserted.select(base.columns).withColumn(
            "change_type", F.lit("insert")
        )
    keys = m_to.get("merge_keys") or m_from.get("merge_keys")
    if not keys:
        raise ValueError(
            "version range touches tombstones but no merge_keys found"
        )
    old = read_snapshot(spark, root, version=from_version)
    new = read_snapshot(spark, root, version=to_version)
    cols = compare_cols or [c for c in new.columns if c not in keys]
    return snapshot_diff(old, new, keys, cols)


def maintain_agg_view(
    spark: SparkSession,
    table_root: str,
    view_root: str,
    keys: list[str],
    value_col: str,
) -> dict:
    """End-to-end incremental materialized aggregate view: keep a
    snapshot table at ``view_root`` holding the mergeable aggregate
    STATE (incremental.partial_agg_state schema) of the append-only
    source table at ``table_root``, advanced by its change feed.

    Each call: (1) read the source version the view last processed
    from the view's own manifest (``source_version`` — bookkeeping
    rides the SAME atomic manifest as the data, so state and cursor
    can never diverge); (2) pull ONLY the delta via ``table_changes``
    (reads just the new directories); (3) fold the delta's partial
    state into the stored state with the monoid merge; (4) publish
    the new state snapshot recording the new source version.

    Cost per run is O(delta) + O(|keys| state merge) — the nightly
    100-TB dashboard refresh never re-reads history. Re-running
    without new source versions publishes nothing (idempotent, the
    snapshot-append law). Finalize with
    ``incremental.finalize_agg_state(read_snapshot(spark, view_root),
    keys)`` for user-facing count/sum/avg/min/max/stddev."""
    from pipeline_dataengineer_spark.operators.incremental import (
        merge_agg_states,
        partial_agg_state,
    )

    src_cur = current_version(table_root)
    if src_cur is None:
        raise FileNotFoundError(f"no snapshot under {table_root!r}")
    if read_manifest(table_root).get("merge_keys"):
        # a keyed (MOR) source's change feed carries updates/deletes,
        # which the additive monoid cannot fold — fail loudly instead
        # of double-counting
        raise ValueError(
            "maintain_agg_view requires an append-only source table; "
            "for keyed tables recompute from read_snapshot or maintain "
            "via table_changes deltas with retractions"
        )
    view_cur = current_version(view_root)
    last = (
        read_manifest(view_root).get("source_version", -1)
        if view_cur is not None
        else -1
    )
    if last >= src_cur:
        return read_manifest(view_root)  # nothing new: no-op
    if last < 0:
        delta = read_snapshot(spark, table_root, version=src_cur)
    else:
        delta = table_changes(spark, table_root, last, src_cur)
        delta = delta.drop("change_type")
    new_state = partial_agg_state(delta, keys, value_col)
    if view_cur is not None:
        old_state = read_snapshot(spark, view_root)
        new_state = merge_agg_states(old_state, new_state, keys=keys)
    # one atomic publish carrying BOTH the state and the cursor — a
    # two-step publish would open a crash window where state exists
    # without its source_version and the next run double-counts
    path = _write_data_dir(new_state, view_root)
    return _publish(
        view_root,
        [path],
        new_state.schema.simpleString(),
        None,
        current_version(view_root),
        extra={"source_version": src_cur},
    )


def maintain_sketch_view(
    spark: SparkSession,
    table_root: str,
    view_root: str,
    keys: list[str],
    value_col: str,
    family: str = "hll",
) -> dict:
    """``maintain_agg_view`` for the MERGEABLE-SKETCH families —
    incremental COUNT(DISTINCT) (``family="hll"`` approximate,
    ``family="bitmap"`` exact for integer domains) and incremental
    quantiles (``family="kll"``). Identical cursor/atomic-publish
    protocol: the view's manifest carries ``source_version``, each
    run folds ONLY the source delta's sketch states into the stored
    states with the family's monoid merge, and a run without new
    versions is a no-op.

    This is the piece plain additive states cannot do: distinct
    counts and quantiles are not additive, but their sketch states
    ARE mergeable — which is exactly why the sketch families exist
    (functions/sketches.py). Same append-only-source requirement and
    the same loud refusal for keyed (MOR) sources."""
    from pipeline_dataengineer_spark.functions import sketches as sk

    builders = {
        "hll": (
            lambda d: sk.hll_sketches(d, keys, value_col),
            lambda old, new: sk.merge_hll(old, new, keys=keys),
        ),
        "bitmap": (
            lambda d: sk.bitmap_states(d, keys, value_col),
            lambda old, new: sk.merge_bitmap(old, new, keys=keys),
        ),
        "kll": (
            lambda d: sk.kll_states(d, keys, value_col),
            lambda old, new: sk.merge_kll(old, new, keys=keys),
        ),
        # Count-Min: incremental point-frequency tables — the counter
        # monoid merge (merge-then-estimate == build-over-union is
        # pytest-proven in test_countmin.py)
        "cm": (
            lambda d: sk.cm_states(d, keys, value_col),
            lambda old, new: sk.merge_cm(old, new, keys=keys),
        ),
    }
    if family not in builders:
        raise ValueError(f"unknown sketch family {family!r}")
    build, merge = builders[family]

    src_cur = current_version(table_root)
    if src_cur is None:
        raise FileNotFoundError(f"no snapshot under {table_root!r}")
    if read_manifest(table_root).get("merge_keys"):
        raise ValueError(
            "maintain_sketch_view requires an append-only source table"
        )
    view_cur = current_version(view_root)
    last = (
        read_manifest(view_root).get("source_version", -1)
        if view_cur is not None
        else -1
    )
    if last >= src_cur:
        return read_manifest(view_root)
    if last < 0:
        delta = read_snapshot(spark, table_root, version=src_cur)
    else:
        delta = table_changes(spark, table_root, last, src_cur).drop(
            "change_type"
        )
    new_state = build(delta)
    if view_cur is not None:
        new_state = merge(read_snapshot(spark, view_root), new_state)
    path = _write_data_dir(new_state, view_root)
    return _publish(
        view_root,
        [path],
        new_state.schema.simpleString(),
        None,
        current_version(view_root),
        extra={"source_version": src_cur, "sketch_family": family},
    )
