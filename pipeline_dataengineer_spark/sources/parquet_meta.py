"""Parquet footer statistics as a DataFrame — the data-skipping
audit primitive.

At 100 TB the planner's whole pruning story (partition pruning,
row-group min/max skipping, bloom filters, z-order effectiveness)
lives in parquet FOOTERS; auditing it must not scan data. This
source reads ONLY metadata: the file list is distributed as a
one-column DataFrame and each task opens its files with pyarrow,
touching a few KB of footer per file regardless of data size — the
same shape a table-format manifest scan has. Use it to answer "would
a predicate on col X skip row groups?" (min/max spread), "is the
layout clustered?" (overlapping ranges after z-order), and "where
are the small files?" (bytes per row group) before paying for a real
scan.

DuckDB's parquet_metadata() emits the same facts, which is how the
pytest differential checks this against an independent reader
(stats stringified the same way both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _stat_str(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return v.hex()
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def row_group_stats(
    spark: SparkSession,
    paths: list[str],
    columns: list[str] | None = None,
) -> DataFrame:
    """One row per (file, row group, column): num_rows, min/max from
    the footer statistics (NULL when the writer omitted them),
    compressed and uncompressed byte sizes. ``columns`` restricts to
    named leaf columns (by parquet path_in_schema).

    Footers only — a task never reads a data page. File list is
    repartitioned one-file-per-task up to the session's parallelism,
    so a million-file lake audits in file-count/cores time."""
    if not paths:
        raise ValueError("paths must be non-empty")
    want = set(columns) if columns else None
    files = spark.createDataFrame(
        [(p,) for p in paths], "file_name string"
    ).repartition(min(len(paths), spark.sparkContext.defaultParallelism))

    schema = (
        "file_name string, row_group_id int, num_rows bigint, "
        "column string, min_value string, max_value string, "
        "null_count bigint, compressed_bytes bigint, "
        "uncompressed_bytes bigint"
    )

    def scan(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for f in pdf["file_name"]:
                md = pq.ParquetFile(f).metadata
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        col = g.column(ci)
                        name = col.path_in_schema
                        if want is not None and name not in want:
                            continue
                        st = col.statistics
                        has = st is not None and st.has_min_max
                        out.append(
                            (
                                f,
                                rg,
                                g.num_rows,
                                name,
                                _stat_str(st.min) if has else None,
                                _stat_str(st.max) if has else None,
                                None
                                if st is None
                                else st.null_count,
                                col.total_compressed_size,
                                col.total_uncompressed_size,
                            )
                        )
            yield pd.DataFrame(
                out,
                columns=[
                    "file_name", "row_group_id", "num_rows", "column",
                    "min_value", "max_value", "null_count",
                    "compressed_bytes", "uncompressed_bytes",
                ],
            )

    return files.mapInPandas(scan, schema=schema)


def skipping_effectiveness(
    spark: SparkSession,
    paths: list[str],
    column: str,
    lo,
    hi,
) -> DataFrame:
    """Planner-style skipping report for a range predicate
    ``lo <= column <= hi``: per file, how many row groups the footer
    min/max alone would skip. The before-you-scan question at 100 TB
    — a layout where this returns ~0 skippable groups is a layout
    that needs re-clustering (operators/layout.py) for that
    predicate. Numeric comparison on the stringified stats (cast
    double), so it applies to numeric columns."""
    from pyspark.sql import functions as F

    st = row_group_stats(spark, paths, columns=[column])
    mn = F.col("min_value").cast("double")
    mx = F.col("max_value").cast("double")
    skippable = (
        mn.isNotNull()
        & mx.isNotNull()
        & ((mx < F.lit(float(lo))) | (mn > F.lit(float(hi))))
    )
    return st.groupBy("file_name").agg(
        F.count(F.lit(1)).cast("long").alias("row_groups"),
        F.sum(skippable.cast("long")).alias("skippable_groups"),
        F.sum("num_rows").alias("total_rows"),
        F.sum(
            F.when(skippable, F.col("num_rows")).otherwise(F.lit(0))
        ).alias("skippable_rows"),
    )


def prune_paths(
    spark: SparkSession,
    paths: list[str],
    column: str,
    lo,
    hi,
) -> list[str]:
    """The file subset that can contain rows with
    ``lo <= column <= hi`` according to footer stats alone — a file
    is dropped only when EVERY row group in it is skippable, and a
    row group without usable stats is conservatively kept. This is
    the engine-level version of what a lakehouse manifest prune
    does: at 100 TB the footer pass costs file-count/cores tasks and
    no data pages, and each dropped file is a whole scan task that
    never launches."""
    from pyspark.sql import functions as F

    st = row_group_stats(spark, paths, columns=[column])
    mn = F.col("min_value").cast("double")
    mx = F.col("max_value").cast("double")
    skippable = (
        mn.isNotNull()
        & mx.isNotNull()
        & ((mx < F.lit(float(lo))) | (mn > F.lit(float(hi))))
    )
    per_file = st.groupBy("file_name").agg(
        F.min(skippable.cast("int")).alias("__all_skip")
    )
    kept = [
        r["file_name"]
        for r in per_file.filter(F.col("__all_skip") == 0).collect()
    ]
    # files the stats scan never saw (empty footer edge) stay kept
    seen = {r["file_name"] for r in per_file.collect()}
    kept += [p for p in paths if p not in seen]
    return sorted(kept)


def read_pruned(
    spark: SparkSession,
    paths: list[str],
    column: str,
    lo,
    hi,
) -> DataFrame:
    """Footer-pruned ranged read: scan only the files
    ``prune_paths`` keeps, then apply the residual row filter (the
    stats cut is file-granular; the predicate still runs — results
    are EXACTLY the plain filtered read, which is what the contract
    oracle checks). Returns an empty, correctly-typed frame when
    every file prunes away."""
    from pyspark.sql import functions as F

    kept = prune_paths(spark, paths, column, lo, hi)
    src = kept if kept else paths  # schema-only fallback
    df = spark.read.parquet(*src)
    pred = (F.col(column) >= F.lit(lo)) & (F.col(column) <= F.lit(hi))
    if not kept:
        return df.filter(F.lit(False))
    return df.filter(pred)
