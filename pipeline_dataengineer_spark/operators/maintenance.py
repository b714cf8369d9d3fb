"""Table-maintenance operators: small-file compaction, schema
conformance.

The operational half of a 100 TB lake: streaming sinks and
fine-grained partition overwrites accumulate small files (every one
is a task, an open, a footer parse — a million 1 MB files makes the
LISTing alone the bottleneck), and long-lived tables accumulate
schema drift across ingest batches. Both fixes are plain DataFrame
plans."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite a parquet directory into files of ~``target_file_bytes``
    (the row-group-friendly size Spark's scan planner slices cleanly).
    Sizing comes from the actual input file sizes; the rewrite is a
    ``coalesce`` — a NARROW dependency, no shuffle: output tasks
    concatenate input partitions. Writes to ``dst`` (never in place —
    readers of ``src`` stay consistent; swap directories at the
    catalog/metastore layer). Returns an audit dict.

    At real scale run this per partition-directory so compaction
    parallelizes across partitions and respects partition pruning."""
    df = spark.read.parquet(src)
    files = df.inputFiles()
    # Size inputs via the Hadoop FileSystem API so hdfs:// and s3a://
    # paths size correctly — os.path.getsize only understands the
    # local filesystem and would silently yield total=0 → coalesce(1),
    # a single-task rewrite of the whole table.
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    total = 0
    sized = 0
    for f in files:
        jpath = jvm.org.apache.hadoop.fs.Path(f)
        fs = jpath.getFileSystem(hconf)
        try:
            total += fs.getFileStatus(jpath).getLen()
            sized += 1
        except Exception:
            pass
    if files and sized == 0:
        raise IOError(
            f"compact_parquet: could not size any of {len(files)} input "
            f"files under {src!r}; refusing to guess an output layout"
        )
    n_out = max(1, math.ceil(total / target_file_bytes))
    df.coalesce(n_out).write.mode("overwrite").parquet(dst)
    # coalesce cannot INCREASE partition count, so the requested n_out
    # is only an upper bound — report what actually landed.
    files_after = len(spark.read.parquet(dst).inputFiles())
    return {
        "files_before": len(files),
        "files_after": files_after,
        "files_requested": n_out,
        "bytes": total,
    }


def conform_schema(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project ``df`` onto ``target``: missing columns appear as
    typed NULLs, present columns cast to the target type, extra
    columns drop, order matches the target — the step that makes
    heterogeneous ingest batches unionable and lets old readers
    survive added fields. Pure projection (codegen, no shuffle)."""
    cols = []
    have = {f.name: f for f in df.schema.fields}
    for field in target.fields:
        if field.name in have:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def union_conformed(dfs: list[DataFrame], target: T.StructType) -> DataFrame:
    """Union any number of drifted batches under one target schema —
    each is conformed first, so the union is position-safe."""
    out = conform_schema(dfs[0], target)
    for d in dfs[1:]:
        out = out.unionByName(conform_schema(d, target))
    return out


def materialize_stage(df: DataFrame, path: str, spark: SparkSession | None = None) -> DataFrame:
    """Write ``df`` to a parquet stage table and return a fresh scan
    of it — the durable lineage cut for long pipelines. Unlike
    persist() (executor-memory, lost on executor death) or
    localCheckpoint (RDD-path, AQE-bypassing, non-durable), a stage
    table survives restarts, is readable by other jobs, and resets
    the plan to a plain columnar scan with its own pushdown/pruning.
    This is the documented at-scale swap for the in-memory caches the
    sketch/dedup operators use below cluster scale."""
    df.write.mode("overwrite").parquet(path)
    s = spark or df.sparkSession
    return s.read.parquet(path)


def missing_partitions(
    df: DataFrame, date_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Backfill planner: the (group, day) combinations between each
    group's first and last observed day that have NO rows — the list
    a scheduler feeds back into reprocessing ("which ingest days went
    missing?"). Dense spine (timeseries.date_spine — dimension-sized,
    never fact-sized) LEFT ANTI the observed day set; both sides are
    aggregates, facts are touched once."""
    from pyspark.sql import functions as F

    from pipeline_dataengineer_spark.operators.timeseries import date_spine

    g = list(group_cols or [])
    observed = (
        df.select(*g, F.col(date_col).cast("date").alias(date_col))
        .distinct()
    )
    spine = date_spine(observed, date_col, g)
    return spine.join(observed, [*g, date_col], "left_anti")


def schema_diff(a: DataFrame, b: DataFrame) -> list[dict]:
    """Column-level schema drift report between two DataFrames:
    one dict per differing column — ``added`` (only in b),
    ``removed`` (only in a), ``type_changed``, ``nullability_changed``
    — plus a ``reordered`` marker when the common-column order
    differs. Driver-side metadata only (no jobs run); feed it to
    ``conform_schema`` to act, or alert on non-empty."""
    fa = {f.name: f for f in a.schema.fields}
    fb = {f.name: f for f in b.schema.fields}
    out: list[dict] = []
    for name in fa:
        if name not in fb:
            out.append({"column": name, "change": "removed",
                        "from": fa[name].dataType.simpleString(), "to": None})
    for name in fb:
        if name not in fa:
            out.append({"column": name, "change": "added",
                        "from": None, "to": fb[name].dataType.simpleString()})
    for name in fa.keys() & fb.keys():
        ta, tb = fa[name].dataType, fb[name].dataType
        if ta != tb:
            out.append({"column": name, "change": "type_changed",
                        "from": ta.simpleString(), "to": tb.simpleString()})
        elif fa[name].nullable != fb[name].nullable:
            out.append({"column": name, "change": "nullability_changed",
                        "from": fa[name].nullable, "to": fb[name].nullable})
    common = [f.name for f in a.schema.fields if f.name in fb]
    common_b = [f.name for f in b.schema.fields if f.name in fa]
    if common != common_b:
        out.append({"column": None, "change": "reordered",
                    "from": common, "to": common_b})
    return out


def flatten_structs(df: DataFrame, sep: str = "_") -> DataFrame:
    """Recursively flatten every struct column into top-level columns
    named ``parent<sep>child`` (arrays/maps left intact — exploding
    them changes cardinality and is a separate decision). The
    warehouse-landing normalizer for deeply nested JSON/variant
    ingests; generalizes the reference's one-level ``data.*`` flatten
    (src/spark_pgsql/spark_streaming.py:63). Pure projection — one
    codegen stage, no shuffle."""
    from pyspark.sql import types as T

    def leaves(prefix: str, dt, node):
        if isinstance(dt, T.StructType):
            out = []
            for f in dt.fields:
                out += leaves(
                    f"{prefix}{sep}{f.name}" if prefix else f.name,
                    f.dataType,
                    node[f.name],
                )
            return out
        return [node.alias(prefix)]

    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.StructType):
            cols += leaves(f.name, f.dataType, F.col(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def diff_tables(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level reconciliation of two keyed tables (migration
    validation, replica drift, pre/post-backfill audit): full outer
    join on ``keys``, classify each key as ``added`` (only in b),
    ``removed`` (only in a), ``changed`` or ``unchanged``, and name
    exactly which columns differ. NULL-safe per-column compare
    (NULL vs NULL is equal; NULL vs value is a change).

    Output: keys + ``status`` + ``changed_cols`` (array<string>,
    empty unless changed) + ``<col>_a`` / ``<col>_b`` pairs for the
    compared columns. One shuffle on the key for the join (or zero
    with co-bucketed inputs); the per-column compare is a fused
    codegen projection — no per-row Python, no collect.

    Keys are assumed non-NULL (primary-key semantics): a NULL-keyed
    row never joins, so it reports as removed/added rather than
    comparing against another NULL-keyed row.
    """
    cols = compare_cols or [c for c in a.columns if c not in keys]
    missing = [c for c in cols if c not in b.columns]
    if missing:
        raise ValueError(f"compare columns absent from b: {missing}")
    la = a.select(
        *keys, *[F.col(c).alias(f"{c}_a") for c in cols]
    ).withColumn("__in_a", F.lit(True))
    lb = b.select(
        *keys, *[F.col(c).alias(f"{c}_b") for c in cols]
    ).withColumn("__in_b", F.lit(True))
    j = la.join(lb, keys, "full_outer")
    diff_flags = [
        F.when(
            ~F.col(f"{c}_a").eqNullSafe(F.col(f"{c}_b")), F.lit(c)
        )
        for c in cols
    ]
    changed = F.array_compact(F.array(*diff_flags))
    status = (
        F.when(F.col("__in_a").isNull(), F.lit("added"))
        .when(F.col("__in_b").isNull(), F.lit("removed"))
        .when(F.size(changed) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *keys,
        status.alias("status"),
        F.when(
            F.col("__in_a").isNotNull() & F.col("__in_b").isNotNull(),
            changed,
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_cols"),
        *[F.col(f"{c}_a") for c in cols],
        *[F.col(f"{c}_b") for c in cols],
    )
