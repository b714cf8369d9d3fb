"""q_minhash_neardup's full-replay oracle (round-8 VERDICT item 3)
rests on two preconditions this file pins:

1. the documents fixture is pure ASCII with every text >= 5 chars,
   so DuckDB's character-level substr/ascii equals the engine's
   byte-level shingling (UTF-8 multi-byte or sub-5-char pad inputs
   would diverge);
2. the replay matches the engine VALUE-for-value at the smoke tier
   (the sf0.01 differential runs in verify_local / the driver; this
   pins sf0.001 so a kernel or constants change fails fast in CI).
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def test_fixture_is_ascii_and_long_enough():
    con = duckdb.connect()
    bad = con.execute(
        f"""
        SELECT count(*) FROM read_parquet('{SF_DIR}/documents.parquet')
        WHERE octet_length(encode(text)) <> length(text)
           OR length(text) < 5 OR text IS NULL
        """
    ).fetchone()[0]
    assert bad == 0


def test_replay_matches_engine_sf0001(spark):
    from pyspark.sql import functions as F

    from pipeline_dataengineer_spark.catalog import table
    from pipeline_dataengineer_spark.contract.oracles import (
        _minhash_lsh_replay_sql,
    )
    from pipeline_dataengineer_spark.operators.dedup import (
        minhash_lsh_near_duplicates,
    )

    d = table(spark, SF_DIR, "documents").select("doc_id", "text")
    mutated = d.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" suffix token")).alias("text"),
    )
    pairs = minhash_lsh_near_duplicates(
        d.unionByName(mutated),
        "doc_id",
        "text",
        num_hashes=128,
        bands=8,
        shingle_n=5,
        jaccard_threshold=0.7,
        signature_stage_path="/tmp/mh_replay_test_sig",
    )
    got = sorted(
        (int(r.id_a), int(r.id_b), float(r.jaccard))
        for r in pairs.collect()
    )
    pairs.unpersist()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    orc = sorted(
        (int(a), int(b), float(j))
        for a, b, j in con.execute(_minhash_lsh_replay_sql()).fetchall()
    )
    assert len(got) > 0
    assert got == orc
