"""File-format sources. Thin, explicit wrappers — the value is the
defaults (no schema inference in production paths, pushdown-friendly
options), not abstraction."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """Parquet scan; column pruning + predicate pushdown are Catalyst's
    job — the optional `columns` select just makes pruning explicit."""
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV with an explicit schema. ``inferSchema`` double-reads the
    input (full scan to infer, then the real scan) — at 100 TB that is
    a second pass over everything, so it is deliberately not exposed."""
    reader = spark.read.option("header", str(header).lower())
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None, **options: str
) -> DataFrame:
    """JSON-lines with an explicit schema (schema-on-read, mirroring
    the reference's from_json discipline — SURVEY §1.3)."""
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Raw media/blob ingestion via Spark's built-in ``binaryFile``
    source: one row per file with (path, modificationTime, length,
    content). The front door for the multimodal pipeline — feed
    ``content`` straight into ``multimodal.media`` as the payload
    column. File listing parallelizes on the driver and rows
    distribute by file; filters on path/length/modificationTime prune
    BEFORE bytes load (the source skips content for pruned rows), so
    metadata-only queries never read payloads."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_json_quarantine(
    spark: SparkSession,
    path: str,
    schema: str,
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines ingestion with a DEAD-LETTER split: returns
    ``(good, quarantine)`` — good rows parsed against the schema,
    quarantine rows carrying the raw offending line — the standard
    production guard against one malformed record poisoning a feed
    (vs FAILFAST aborting the batch, or default PERMISSIVE silently
    NULL-filling).

    Implementation: a ``text`` scan + ``from_json`` with a
    columnNameOfCorruptRecord slot. Parsing through from_json (not
    the raw JSON datasource) sidesteps Spark's
    QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction — the corrupt
    marker is an ordinary struct field here, so BOTH legs are plain
    narrow filters riding one text scan, no cache required. Type
    mismatches count as corrupt (the whole raw line lands in
    quarantine), matching the JSON reader's PERMISSIVE semantics."""
    from pyspark.sql import functions as F

    raw = spark.read.text(path)
    struct_schema = schema.rstrip() + ", _corrupt string"
    parsed = raw.select(
        F.col("value").alias("_raw"),
        F.from_json(
            "value",
            struct_schema,
            {"columnNameOfCorruptRecord": "_corrupt"},
        ).alias("_p"),
    )
    good = (
        parsed.filter(
            F.col("_p").isNotNull() & F.col("_p._corrupt").isNull()
        )
        .select("_p.*")
        .drop("_corrupt")
    )
    bad = parsed.filter(
        F.col("_p").isNull() | F.col("_p._corrupt").isNotNull()
    ).select(F.col("_raw").alias("_corrupt"))
    return good, bad


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = False,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """CSV twin of ``read_json_quarantine``: (good, quarantine) via a
    text scan + ``from_csv`` with a corrupt-record slot — malformed
    and type-mismatched lines land whole in quarantine instead of
    aborting the batch or silently null-filling. With ``header`` the
    first line is dropped by value match (the text source has no
    header notion; a data line that EQUALS the header line is
    indistinguishable and also dropped — acceptable for the guard's
    purpose)."""
    from pyspark.sql import functions as F

    raw = spark.read.text(path)
    struct_schema = schema.rstrip() + ", _corrupt string"
    opts = {
        "columnNameOfCorruptRecord": "_corrupt",
        "mode": "PERMISSIVE",
        "sep": sep,
    }
    if header:
        hdr = raw.limit(1).collect()[0]["value"]
        raw = raw.filter(F.col("value") != hdr)
    parsed = raw.select(
        F.col("value").alias("_raw"),
        F.from_csv("value", struct_schema, opts).alias("_p"),
    )
    good = (
        parsed.filter(
            F.col("_p").isNotNull() & F.col("_p._corrupt").isNull()
        )
        .select("_p.*")
        .drop("_corrupt")
    )
    bad = parsed.filter(
        F.col("_p").isNull() | F.col("_p._corrupt").isNotNull()
    ).select(F.col("_raw").alias("_corrupt"))
    return good, bad


def parse_fixed_width(
    col,
    colspecs: list[tuple[str, int, int, str]],
):
    """Parse a fixed-width record line (the mainframe/COBOL export
    layout) into a struct: ``colspecs`` is a list of
    (name, start_1_based, length, spark_type) — values are substring
    slices, whitespace-trimmed, try_cast to the declared type (blank
    or malformed numerics become NULL instead of raising under ANSI
    mode; strings keep ''). One fused codegen projection, no UDF."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    fields = []
    for name, start, length, typ in colspecs:
        raw = F.trim(F.substring(c, start, length))
        v = raw if typ == "string" else raw.try_cast(typ)
        fields.append(v.alias(name))
    return F.struct(*fields)


def read_fixed_width(
    spark: SparkSession,
    path: str,
    colspecs: list[tuple[str, int, int, str]],
) -> DataFrame:
    """Fixed-width file reader: ``spark.read.text`` (splittable,
    whole-stage codegen'd line scan) + ``parse_fixed_width``
    flattened to columns — no Python in the row path, so a 100 TB
    export parses at parquet-adjacent speed."""
    from pyspark.sql import functions as F

    lines = spark.read.text(path)
    s = parse_fixed_width(F.col("value"), colspecs)
    return lines.select(
        *[s[name].alias(name) for name, *_ in colspecs]
    )


def sniff_csv_dialect(
    spark: SparkSession,
    path: str,
    candidates: tuple[str, ...] = (",", ";", "\t", "|"),
    sample_lines: int = 64,
) -> dict:
    """Infer a CSV file's delimiter and header-ness from a bounded
    sample (driver-side, reads ``sample_lines`` text rows — never the
    file body): the delimiter is the candidate whose per-line field
    count is both >1 and most CONSISTENT across the sample (ties →
    higher count); header is inferred when the first row has no
    numeric-parsing fields but later rows do. Returns
    {"sep", "header", "n_fields"} ready to splat into
    ``spark.read.csv(..., sep=..., header=...)``."""
    lines = [
        r["value"]
        for r in spark.read.text(path).limit(sample_lines).collect()
        if r["value"]
    ]
    if not lines:
        raise ValueError(f"no lines sampled from {path}")

    def fields(line: str, sep: str) -> list[str]:
        # quote-aware split (double-quote escaping), enough for
        # dialect sniffing
        out, cur, inq = [], [], False
        i = 0
        while i < len(line):
            ch = line[i]
            if ch == '"':
                if inq and line[i + 1 : i + 2] == '"':
                    cur.append('"')
                    i += 1
                else:
                    inq = not inq
            elif ch == sep and not inq:
                out.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
            i += 1
        out.append("".join(cur))
        return out

    best = None
    for sep in candidates:
        counts = [len(fields(ln, sep)) for ln in lines]
        if max(counts) <= 1:
            continue
        consistency = sum(1 for c in counts if c == counts[0]) / len(counts)
        score = (consistency, counts[0])
        if best is None or score > best[0]:
            best = (score, sep, counts[0])
    if best is None:
        raise ValueError("no candidate delimiter splits the sample")
    _, sep, nf = best

    def numericish(v: str) -> bool:
        try:
            float(v)
            return True
        except ValueError:
            return False

    first = fields(lines[0], sep)
    later_numeric = any(
        any(numericish(v) for v in fields(ln, sep)) for ln in lines[1:]
    )
    header = (
        not any(numericish(v) for v in first) and later_numeric
    )
    return {"sep": sep, "header": header, "n_fields": nf}
