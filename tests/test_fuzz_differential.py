"""Differential fuzzing gate (tools/fuzz_differential.py): a fixed
seed range of grammar-generated queries — scan / FK join / seeded
predicates / aggregate-distinct-toplist shapes — must produce the
identical value multiset from spark.sql and DuckDB. The curated
contract pins operators someone thought to write; the fuzzer walks
the combinatorial plan space nobody hand-wrote. Seeds are frozen so
CI is deterministic; widen the range via the tool CLI when hunting.
"""

from __future__ import annotations

import duckdb
import pytest

from pipeline_dataengineer_spark.catalog import table
from tools.fuzz_differential import TABLES, run_seeds

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def engines(spark):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
        table(spark, SF_DIR, t).createOrReplaceTempView(t)
    return spark, con


def test_fuzz_seeds_1_to_30(engines):
    spark, con = engines
    assert run_seeds(spark, con, range(1, 31), verbose=False) == []


def test_fuzz_seeds_31_to_60(engines):
    spark, con = engines
    assert run_seeds(spark, con, range(31, 61), verbose=False) == []


def test_gen_query_is_deterministic():
    """Same seed + same data -> byte-identical SQL (the reproducer
    contract printed on failure must actually reproduce)."""
    from tools.fuzz_differential import gen_query

    def fresh_con():
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{SF_DIR}/{t}.parquet'"
            )
        return con

    a, b = fresh_con(), fresh_con()
    for seed in (1, 7, 42, 123, 999):
        assert gen_query(seed, a) == gen_query(seed, b)
