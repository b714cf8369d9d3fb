"""Exactly-once JDBC publishing via a staged-commit protocol.

The reference appends micro-batches straight into Postgres
(``src/spark_pgsql/spark_streaming.py:85-87``), relying on the anti-
join + PRIMARY KEY to absorb re-delivery. That is idempotent only
per-KEY; a retried batch that died mid-append leaves a partial batch
committed (JDBC writers commit per partition — there is no cross-
partition transaction in Spark's JDBC sink). This module adds the
standard warehouse staged-load protocol on top:

1. the executor-parallel (expensive) work writes the batch to a
   per-batch STAGING table — crash here is invisible, a retry just
   overwrites it;
2. the publish is ONE driver-side transaction in the database:
   ``INSERT INTO target SELECT ... FROM staging`` + a ledger-row
   insert marking (target, batch_id) done — the database's atomicity
   makes partial publishes impossible;
3. a (target, batch_id) already present in the ledger short-circuits
   the whole call — the retry/no-op law that makes this safe under
   foreachBatch's at-least-once batch delivery.

The ledger is the same idea as the parquet snapshot layer's epoch
manifest (operators/snapshots.py) and the webhook sink's commit
protocol (sinks/webhook.py), realized inside the target database so
publish + mark are a single transaction.

Scale: the staging write is Spark's ordinary parallel JDBC append
(one connection per partition, batched inserts); the publish is a
set-based statement executed inside the database engine — the bulk
path every warehouse optimizes for, no rows move through the driver.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

LEDGER_TABLE = "spark_epoch_ledger"

# SQL identifiers (optionally schema-qualified) we are willing to
# splice into DDL/DML text. Anything else — quotes, spaces, comment
# tokens — is rejected up front: table names come from config, and a
# config-injection that rides them into DROP/INSERT statements must
# fail loudly, not execute.
_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_$]*(\.[A-Za-z_][A-Za-z0-9_$]*)?$")


def _check_ident(name: str) -> str:
    if not _IDENT.match(name):
        raise ValueError(f"unsafe SQL identifier: {name!r}")
    return name


def _get_connection(jvm, url: str, properties: dict[str, str]):
    """Driver-side connection honoring the SAME credentials the Spark
    JDBC writer gets (user/password/driver …). Round-3 gap: the
    ledger/publish connection used the bare URL, so against any
    authenticated database the staging write succeeded and the
    publish failed."""
    props = jvm.java.util.Properties()
    for k, v in properties.items():
        if k in ("batchsize", "truncate", "numPartitions"):
            continue  # Spark-writer-only options, not JDBC props
        props.setProperty(str(k), str(v))
    if "driver" in properties:
        jvm.java.lang.Class.forName(properties["driver"])
    return jvm.java.sql.DriverManager.getConnection(url, props)


def _execute(conn, sql: str) -> None:
    stmt = conn.createStatement()
    try:
        stmt.execute(sql)
    finally:
        stmt.close()


def _table_exists(conn, table: str) -> bool:
    # DatabaseMetaData is portable across Derby/Postgres; table names
    # are folded to the JDBC store's case convention
    meta = conn.getMetaData()
    for cand in (table.upper(), table.lower(), table):
        rs = meta.getTables(None, None, cand, None)
        try:
            if rs.next():
                return True
        finally:
            rs.close()
    return False


def _ledger_has(conn, target: str, batch_id: int) -> bool:
    # PreparedStatement: the target name is DATA here (a ledger value),
    # not an identifier — parameter binding, never string splicing.
    ps = conn.prepareStatement(
        f"SELECT 1 FROM {LEDGER_TABLE} "
        "WHERE target_table = ? AND batch_id = ?"
    )
    try:
        ps.setString(1, target)
        ps.setLong(2, int(batch_id))
        rs = ps.executeQuery()
        try:
            return bool(rs.next())
        finally:
            rs.close()
    finally:
        ps.close()


def _ledger_mark(conn, target: str, batch_id: int) -> None:
    ps = conn.prepareStatement(
        f"INSERT INTO {LEDGER_TABLE} (target_table, batch_id) VALUES (?, ?)"
    )
    try:
        ps.setString(1, target)
        ps.setLong(2, int(batch_id))
        ps.executeUpdate()
    finally:
        ps.close()


def staged_jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    batch_id: int,
    columns: list[str] | None = None,
    batchsize: int = 10_000,
    **properties: str,
) -> dict:
    """Publish one batch into ``table`` exactly once, keyed by
    ``batch_id`` (use the foreachBatch epoch id). Returns an audit
    dict: ``{"published": bool, "staging_table": str}``.

    Crash-safety walk: die before the staging write → nothing
    happened; die after staging, before the publish transaction → the
    retry overwrites staging and publishes once; die inside the
    transaction → the database rolls it back; die after commit →
    the ledger row makes the retry a no-op. The orphaned staging
    table from a post-commit crash is dropped by the retry."""
    spark = df.sparkSession
    _check_ident(table)
    staging = _check_ident(f"stg_{table.replace('.', '_')}_{int(batch_id)}")
    jvm = spark._jvm
    conn = _get_connection(jvm, url, properties)
    try:
        if not _table_exists(conn, LEDGER_TABLE):
            _execute(
                conn,
                f"CREATE TABLE {LEDGER_TABLE} ("
                "target_table VARCHAR(128) NOT NULL, "
                "batch_id BIGINT NOT NULL, "
                "PRIMARY KEY (target_table, batch_id))",
            )
        if _ledger_has(conn, table, batch_id):
            # retried epoch: already published — clean any orphaned
            # staging table from a crash between commit and drop
            if _table_exists(conn, staging):
                _execute(conn, f"DROP TABLE {staging}")
            return {"published": False, "staging_table": staging}
    finally:
        conn.close()

    # 1. executor-parallel staging write (overwrite: a retry that
    # half-wrote staging before dying starts clean)
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", staging)
        .option("batchsize", str(batchsize))
        .option("truncate", "false")
        .mode("overwrite")
    )
    for k, v in properties.items():
        writer = writer.option(k, v)
    writer.save()

    # 2. atomic publish: INSERT..SELECT + ledger mark in ONE
    # database transaction. The SELECT side quotes identifiers:
    # Spark's JDBC writer creates the staging table with QUOTED
    # (case-exact) column names, which unquoted SQL would case-fold
    # away from. The target side stays as the caller declared it.
    names = [_check_ident(c) for c in (columns or df.columns)]
    cols = ", ".join(names)
    qcols = ", ".join(f'"{c}"' for c in names)
    conn = _get_connection(jvm, url, properties)
    try:
        conn.setAutoCommit(False)
        try:
            _execute(
                conn,
                f"INSERT INTO {table} ({cols}) SELECT {qcols} FROM {staging}",
            )
            _ledger_mark(conn, table, batch_id)
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            conn.setAutoCommit(True)
        # 3. cleanup outside the transaction — a crash here is healed
        # by the retry's ledger check above
        _execute(conn, f"DROP TABLE {staging}")
    finally:
        conn.close()
    return {"published": True, "staging_table": staging}


def staged_foreach_batch(url: str, table: str, **kw):
    """foreachBatch adapter: ``writeStream.foreachBatch(
    staged_foreach_batch(url, table))`` gives the stream exactly-once
    JDBC publishing keyed by Spark's epoch id."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        staged_jdbc_append(batch_df, url, table, batch_id, **kw)

    return fn
