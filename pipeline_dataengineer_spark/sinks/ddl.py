"""DDL against the JDBC sink database (reference A20).

The reference creates its Postgres sink table out-of-band with
``scripts/create_table.py:32-41``: first field ``text PRIMARY KEY``,
every other field plain ``text``, built from the same 25-column list
the transform emits. Spark itself has no primary keys, so the repo
splits the concern the same way the reference does:

- the TABLE and its PK constraint live in the database (this module
  issues the CREATE TABLE over a real JDBC connection), and
- INSERT-path idempotence lives in the engine (the LEFT ANTI filter
  in ``operators/incremental.py``), so the PK is a backstop, not the
  dedup mechanism — violating it is a bug, not a control flow.

Executed live in tests against embedded Derby (the same database the
JDBC read/write round-trip uses); against Postgres the emitted DDL is
byte-compatible with the reference's.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def build_create_table_sql(
    table: str,
    fields: list[str],
    primary_key: str | None = None,
    text_type: str = "TEXT",
    key_type: str | None = None,
) -> str:
    """The reference's CREATE TABLE shape: every column the same text
    type, optional single-column PRIMARY KEY (the reference pins it
    on the first field, ``reference_fiche``). ``text_type``/
    ``key_type`` exist because not every engine spells unbounded text
    ``TEXT``: Derby wants CLOB for payload columns (Spark's Derby
    dialect setNulls strings as CLOB) but forbids a PRIMARY KEY on
    CLOB, so its key must be a sized VARCHAR. Postgres callers keep
    the defaults and get the reference's exact DDL."""
    if primary_key is not None and primary_key not in fields:
        raise ValueError(f"primary_key {primary_key!r} not in fields")
    kt = key_type or text_type
    cols = ",\n    ".join(
        f"{f} {kt} PRIMARY KEY" if f == primary_key else f"{f} {text_type}"
        for f in fields
    )
    return f"CREATE TABLE {table} (\n    {cols}\n)"


def execute_ddl(
    spark: SparkSession, url: str, sql: str, driver: str | None = None
) -> None:
    """Run a DDL statement on the sink database through the JVM's
    DriverManager — same classpath the JDBC reader/writer uses, no
    Python database client needed (the reference shells out to
    psycopg2 for this; in a Spark deployment the driver jar is
    already there and psycopg2 usually is not)."""
    jvm = spark._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        stmt = conn.createStatement()
        try:
            stmt.execute(sql)
        finally:
            stmt.close()
    finally:
        conn.close()


def create_recall_table(
    spark: SparkSession,
    url: str,
    table: str = "rappel_conso_table",
    driver: str | None = None,
    text_type: str = "TEXT",
    key_type: str | None = None,
) -> str:
    """A20 end-to-end: the 25-column recall sink table with
    ``reference_fiche`` as PRIMARY KEY, exactly
    ``scripts/create_table.py:32-41``. Returns the DDL it ran."""
    from pipeline_dataengineer_spark.pipelines.recall_ingest import RECALL_COLUMNS

    sql = build_create_table_sql(
        table,
        RECALL_COLUMNS,
        primary_key=RECALL_COLUMNS[0],
        text_type=text_type,
        key_type=key_type,
    )
    execute_ddl(spark, url, sql, driver=driver)
    return sql
