"""SCD2 history construction + PII redaction unit tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline_dataengineer_spark.functions.pii import pii_counts, redact_pii
from pipeline_dataengineer_spark.operators.scd import scd2_from_changes


def test_scd2_collapses_no_change_rows(spark):
    rows = [
        # key 1: A A B A -> versions A(1..3) B(3..4) A(4..)
        (1, 1, "A"),
        (1, 2, "A"),
        (1, 3, "B"),
        (1, 4, "A"),
        # key 2: single row -> one open version
        (2, 10, "X"),
    ]
    df = spark.createDataFrame(rows, ["k", "seq", "status"])
    out = scd2_from_changes(df, key="k", order_col="seq", attrs=["status"]).orderBy(
        "k", "valid_from"
    )
    got = [(r.k, r.valid_from, r.status, r.valid_to, r.is_current) for r in out.collect()]
    assert got == [
        (1, 1, "A", 3, False),
        (1, 3, "B", 4, False),
        (1, 4, "A", None, True),
        (2, 10, "X", None, True),
    ]


def test_scd2_null_attr_transitions(spark):
    # NULL -> NULL is "no change" (eqNullSafe); NULL -> value is a change.
    rows = [(1, 1, None), (1, 2, None), (1, 3, "v"), (1, 4, None)]
    df = spark.createDataFrame(rows, "k int, seq int, status string")
    out = scd2_from_changes(df, key="k", order_col="seq", attrs=["status"]).orderBy(
        "valid_from"
    )
    assert [(r.valid_from, r.status) for r in out.collect()] == [
        (1, None),
        (3, "v"),
        (4, None),
    ]


def test_redact_pii_all_kinds(spark):
    s = (
        "mail a@b.co or visit https://x.io/p?q=1 call +1-555-010-0042 "
        "from 10.0.0.7 done"
    )
    df = spark.createDataFrame([(s,)], ["t"])
    got = df.select(redact_pii("t").alias("r")).first().r
    assert got == "mail <EMAIL> or visit <URL> call <PHONE> from <IP> done"
    c = df.select(pii_counts("t").alias("c")).first().c
    assert (c.n_urls, c.n_emails, c.n_phones, c.n_ips) == (1, 1, 1, 1)


def test_redact_pii_clean_text_is_identity(spark):
    s = "no pii here, just words and numbers 12 34"
    df = spark.createDataFrame([(s,)], ["t"])
    assert df.select(redact_pii("t").alias("r")).first().r == s


def test_pseudonymize_deterministic_joinable_and_keyed(spark):
    from pipeline_dataengineer_spark.functions.pii import pseudonymize

    df = spark.createDataFrame(
        [(1, "alice"), (2, "bob"), (3, "alice"), (4, None)], ["id", "user"]
    )
    out = df.select("id", pseudonymize("user", salt="k1").alias("tok")).collect()
    toks = {r["id"]: r["tok"] for r in out}
    assert toks[1] == toks[3]                 # same input -> same token (joinable)
    assert toks[1] != toks[2]
    assert toks[4] is None                    # NULL stays NULL
    assert toks[1].startswith("id_") and len(toks[1]) == 19
    # different salt -> disjoint token space
    other = {r["id"]: r["tok"] for r in
             df.select("id", pseudonymize("user", salt="k2").alias("tok")).collect()}
    assert other[1] != toks[1]


def test_normalize_email_branches(spark):
    from pipeline_dataengineer_spark.functions.pii import normalize_email

    rows = [
        (1, "John.Doe+stuff@Gmail.com"),
        (2, "J.ohn@corp.example.com"),   # dots kept off-gmail
        (3, "broken-email"),
        (4, "a@b@c"),
        (5, None),
        (6, "  Upper@GOOGLEMAIL.com "),
    ]
    df = spark.createDataFrame(rows, "id long, e string")
    got = {r["id"]: r["n"] for r in df.select("id", normalize_email("e").alias("n")).collect()}
    assert got[1] == "johndoe@gmail.com"
    assert got[2] == "j.ohn@corp.example.com"
    assert got[3] is None and got[4] is None and got[5] is None
    assert got[6] == "upper@gmail.com"


def test_normalize_phone_branches(spark):
    from pipeline_dataengineer_spark.functions.pii import normalize_phone

    rows = [
        (1, "(212) 555-0199"),      # 10 digits -> +1 prefixed
        (2, "0049 30 901820"),      # 00-international -> stripped
        (3, "555-12"),              # too short -> NULL
        (4, "+44 20 7946 0958"),
    ]
    df = spark.createDataFrame(rows, "id long, p string")
    got = {r["id"]: r["n"] for r in df.select("id", normalize_phone("p").alias("n")).collect()}
    assert got[1] == "+12125550199"
    assert got[2] == "+4930901820"
    assert got[3] is None
    assert got[4] == "+442079460958"


def test_crypto_shredding_lifecycle(spark):
    from pipeline_dataengineer_spark.functions.pii import (
        decrypt_columns,
        encrypt_columns,
        make_key_table,
        shred_keys,
    )

    df = spark.createDataFrame(
        [(1, "alice@x.com", "Alice"), (2, "bob@y.org", "Bob")],
        "uid long, email string, name string",
    )
    # no cache(): make_key_table pins its random keys by contract
    # (eager localCheckpoint) — re-evaluation must not regenerate them
    keys = make_key_table(df, "uid")
    enc = encrypt_columns(df, keys, "uid", ["email", "name"])
    enc_rows = {r["uid"]: r for r in enc.collect()}
    assert enc_rows[1]["email"] != "alice@x.com"  # ciphertext
    # round trip with full key table
    dec = {
        r["uid"]: (r["email"], r["name"])
        for r in decrypt_columns(enc, keys, "uid", ["email", "name"]).collect()
    }
    assert dec == {1: ("alice@x.com", "Alice"), 2: ("bob@y.org", "Bob")}
    # shred user 1: their fields decrypt to NULL, user 2 unaffected
    forget = spark.createDataFrame([(1,)], "uid long")
    keys2 = shred_keys(keys, forget, "uid")
    dec2 = {
        r["uid"]: (r["email"], r["name"])
        for r in decrypt_columns(enc, keys2, "uid", ["email", "name"]).collect()
    }
    assert dec2[1] == (None, None)
    assert dec2[2] == ("bob@y.org", "Bob")


def test_make_key_table_pins_keys_without_cache(spark, tmp_path):
    from pipeline_dataengineer_spark.functions.pii import make_key_table

    df = spark.createDataFrame([(i,) for i in range(50)], "uid long")
    # session-scoped: two separate evaluations must agree (the lazy
    # uuid() plan used to regenerate keys per evaluation — a silent
    # data-destruction hazard for ciphertext)
    keys = make_key_table(df, "uid")
    a = {r["uid"]: r["key"] for r in keys.collect()}
    b = {r["uid"]: r["key"] for r in keys.collect()}
    assert a == b
    # durable: path-materialized keys come back from the re-read file
    p = str(tmp_path / "keys.parquet")
    keys2 = make_key_table(df, "uid", path=p)
    c = {r["uid"]: r["key"] for r in keys2.collect()}
    reread = {r["uid"]: r["key"] for r in spark.read.parquet(p).collect()}
    assert c == reread and len(c) == 50
