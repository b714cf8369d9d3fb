"""Source tests: REST paginated source (cursor logic + Python Data
Source registration) and file readers."""

from __future__ import annotations

from pyspark.sql import types as T

from pipeline_dataengineer_spark.sources.files import read_csv, read_json
from pipeline_dataengineer_spark.sources.rest import (
    MAX_LIMIT,
    fetch_all_since,
    register_rest_source,
)


def test_fetch_all_pagination():
    """Short-page termination (reference kafka_stream_data.py:58-61)."""
    calls = []

    def fake(where_gt, offset, limit):
        calls.append((where_gt, offset))
        if offset >= 2 * limit:
            return []
        n = limit if offset == 0 else limit // 2
        return [{"date_de_publication": where_gt, "i": str(offset + i)} for i in range(n)]

    rows = list(fetch_all_since("2024-01-01", fake, limit=10))
    assert len(rows) == 15  # full page + short page
    assert calls == [("2024-01-01", 0), ("2024-01-01", 10)]


def test_fetch_all_offset_cap_reanchors():
    """Offset cap → restart from last seen date (A2,
    kafka_stream_data.py:63-71). Duplicates allowed by design."""
    calls = []

    def fake(where_gt, offset, limit):
        calls.append((where_gt, offset))
        if where_gt == "2024-01-02":
            return []  # nothing after re-anchor
        return [{"date_de_publication": "2024-01-02"} for _ in range(limit)]

    list(fetch_all_since("2024-01-01", fake, limit=10, max_offset=20))
    # paged 0,10 under the cap, then re-anchored to the max seen date
    assert calls == [("2024-01-01", 0), ("2024-01-01", 10), ("2024-01-02", 0)]


def test_rest_datasource_registration(spark):
    register_rest_source(spark)
    df = (
        spark.read.format("rest_paginated")
        .option("since", "2024-04-18")
        .load()
    )
    rows = df.collect()
    assert len(rows) == MAX_LIMIT + MAX_LIMIT // 2
    assert rows[0]["date_de_publication"] == "2024-04-18"


def test_rest_datasource_parallel_slices(spark):
    register_rest_source(spark)
    df = (
        spark.read.format("rest_paginated")
        .option("slices", '[["2024-01-01", "2099-01-01"], ["2024-02-01", "2099-01-01"]]')
        .load()
    )
    assert df.rdd.getNumPartitions() == 2
    assert df.count() == 2 * (MAX_LIMIT + MAX_LIMIT // 2)


def test_read_csv_explicit_schema(spark, tmp_path):
    p = tmp_path / "x.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    df = read_csv(spark, str(p), schema=schema)
    assert df.schema == schema
    assert df.count() == 2


def test_read_json_schema_on_read(spark, tmp_path):
    p = tmp_path / "x.jsonl"
    p.write_text('{"a": 1, "unknown": true}\n{"b": "x"}\n')
    df = read_json(spark, str(p), schema="a long, b string")
    rows = df.collect()
    assert df.columns == ["a", "b"]
    assert rows[0]["a"] == 1 and rows[0]["b"] is None


def test_orc_round_trip(spark, tmp_path):
    from pipeline_dataengineer_spark.sources.files import read_orc

    p = str(tmp_path / "orc_out")
    spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], ["k", "s", "v"]
    ).write.orc(p)
    got = {(r["k"], r["s"], r["v"]) for r in read_orc(spark, p).collect()}
    assert got == {(1, "a", 1.5), (2, "b", 2.5)}


def test_rest_stream_reader_advances_offsets(spark, tmp_path):
    from pipeline_dataengineer_spark.sources.rest import register_rest_source

    register_rest_source(spark)
    ckpt = str(tmp_path / "ckpt_rest")
    collected = []

    def run():
        def collect(batch_df, epoch_id):
            collected.extend(batch_df.collect())

        q = (
            spark.readStream.format("rest_paginated")
            .option("since", "2024-04-18")
            .option("until", "2024-04-20")
            .load()
            .writeStream.foreachBatch(collect)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    run()  # second drain from the same checkpoint: no re-reads past 'until'
    dates = {r["date_de_publication"] for r in collected}
    # exactly the [since, until) days, each read once
    assert dates == {"2024-04-18", "2024-04-19"}
    per_day = {}
    for r in collected:
        per_day[r["date_de_publication"]] = per_day.get(r["date_de_publication"], 0) + 1
    # pagination yields 150 rows/day from the deterministic fake
    assert all(v == 150 for v in per_day.values()), per_day


def test_read_json_quarantine_splits_bad_lines(spark, tmp_path):
    from pipeline_dataengineer_spark.sources.files import (
        read_json_quarantine,
    )

    p = tmp_path / "feed.jsonl"
    p.write_text(
        '{"id": 1, "v": "a"}\n'
        "THIS IS NOT JSON\n"
        '{"id": 2, "v": "b"}\n'
        '{"id": "oops", "v": 3}\n'
    )
    good, bad = read_json_quarantine(
        spark, str(p), schema="id long, v string"
    )
    g = {(r["id"], r["v"]) for r in good.collect()}
    assert (1, "a") in g and (2, "b") in g
    bad_lines = [r["_corrupt"] for r in bad.collect()]
    assert any("NOT JSON" in b for b in bad_lines)
    # type-mismatched row lands in quarantine, not silently nulled
    assert any("oops" in b for b in bad_lines)
    assert good.count() + bad.count() == 4


def test_read_json_quarantine_clean_feed(spark, tmp_path):
    from pipeline_dataengineer_spark.sources.files import (
        read_json_quarantine,
    )

    p = tmp_path / "clean.jsonl"
    p.write_text('{"id": 1}\n{"id": 2}\n')
    good, bad = read_json_quarantine(spark, str(p), schema="id long")
    assert good.count() == 2 and bad.count() == 0


def test_read_csv_quarantine(spark, tmp_path):
    from pipeline_dataengineer_spark.sources.files import (
        read_csv_quarantine,
    )

    p = tmp_path / "feed.csv"
    p.write_text("id,v\n1,a\nnot_a_number,b\n2,c\n")
    good, bad = read_csv_quarantine(
        spark, str(p), schema="id long, v string", header=True
    )
    assert {(r["id"], r["v"]) for r in good.collect()} == {(1, "a"), (2, "c")}
    assert [r["_corrupt"] for r in bad.collect()] == ["not_a_number,b"]


def test_read_fixed_width_file(spark, tmp_path):
    from pipeline_dataengineer_spark.sources.files import read_fixed_width

    p = tmp_path / "fw.txt"
    p.write_text(
        "00000001ALPHA       00123.45\n"
        "00000002BETA          -7.5  \n"
        "00000003            00000.00\n"  # blank string field
        "00000004GAMMA               \n"  # blank numeric -> NULL
    )
    df = read_fixed_width(
        spark,
        str(p),
        [
            ("id", 1, 8, "long"),
            ("name", 9, 12, "string"),
            ("amount", 21, 8, "double"),
        ],
    )
    got = {r["id"]: r for r in df.collect()}
    assert got[1]["name"] == "ALPHA" and got[1]["amount"] == 123.45
    assert got[2]["amount"] == -7.5
    assert got[3]["name"] == "" and got[3]["amount"] == 0.0
    # blank numeric: NULL via try_cast, not an ANSI cast error
    assert got[4]["name"] == "GAMMA" and got[4]["amount"] is None
    # the parse is a pure projection: no shuffle in the plan
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_sniff_csv_dialect(spark, tmp_path):
    from pipeline_dataengineer_spark.sources.files import sniff_csv_dialect

    p1 = tmp_path / "semi.csv"
    p1.write_text("name;age;city\nalice;30;nyc\nbob;41;\"sf;bay\"\n")
    d = sniff_csv_dialect(spark, str(p1))
    assert d == {"sep": ";", "header": True, "n_fields": 3}

    p2 = tmp_path / "plain.tsv"
    p2.write_text("1\t2.5\tx\n2\t3.5\ty\n")
    d2 = sniff_csv_dialect(spark, str(p2))
    assert d2["sep"] == "\t" and d2["header"] is False

    import pytest

    p3 = tmp_path / "oneline.txt"
    p3.write_text("justoneword\n")
    with pytest.raises(ValueError):
        sniff_csv_dialect(spark, str(p3))


def test_row_group_stats_matches_duckdb(spark):
    """Footer stats differential: every (row_group, column) fact we
    emit equals DuckDB's parquet_metadata() on the same file —
    min/max strings, null counts, byte sizes."""
    import duckdb

    from pipeline_dataengineer_spark.sources.parquet_meta import (
        row_group_stats,
    )

    path = "/root/testdata/sf0.001/orders.parquet"
    got = {
        (r["row_group_id"], r["column"]): r
        for r in row_group_stats(spark, [path]).collect()
    }
    want = duckdb.connect().execute(
        "SELECT row_group_id, path_in_schema, stats_min_value, "
        "stats_max_value, stats_null_count, total_compressed_size, "
        "row_group_num_rows "
        f"FROM parquet_metadata('{path}')"
    ).fetchall()
    assert len(got) == len(want) > 0
    for rg, col, mn, mx, nnull, comp, nrows in want:
        g = got[(rg, col)]
        assert g["min_value"] == mn, (col, g["min_value"], mn)
        assert g["max_value"] == mx, (col, g["max_value"], mx)
        assert g["null_count"] == nnull
        assert g["compressed_bytes"] == comp
        assert g["num_rows"] == nrows


def test_skipping_effectiveness_report(spark):
    """A range predicate far outside the data skips every row group;
    one covering the whole range skips none."""
    from pipeline_dataengineer_spark.sources.parquet_meta import (
        skipping_effectiveness,
    )

    path = "/root/testdata/sf0.001/orders.parquet"
    none = skipping_effectiveness(
        spark, [path], "o_orderkey", 10**12, 2 * 10**12
    ).collect()[0]
    assert none["skippable_groups"] == none["row_groups"]
    assert none["skippable_rows"] == none["total_rows"]
    full = skipping_effectiveness(
        spark, [path], "o_orderkey", -1, 10**12
    ).collect()[0]
    assert full["skippable_groups"] == 0


def test_prune_paths_drops_out_of_band_files(spark, tmp_path):
    """Range-partitioned layout: a narrow band keeps only the files
    whose footer min/max admit it, and the pruned read equals the
    plain filtered read row for row."""
    from pyspark.sql import functions as F

    from pipeline_dataengineer_spark.sources.parquet_meta import (
        prune_paths,
        read_pruned,
    )

    out = str(tmp_path / "banded")
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 1000).cast("double").alias("v")
    )
    df.repartitionByRange(10, "v").write.parquet(out)
    import os

    paths = sorted(
        f"{out}/{f}" for f in os.listdir(out) if f.endswith(".parquet")
    )
    kept = prune_paths(spark, paths, "v", 100.0, 199.0)
    assert 0 < len(kept) < len(paths)  # actually pruned something
    got = sorted(
        r["id"] for r in read_pruned(spark, paths, "v", 100.0, 199.0).collect()
    )
    want = sorted(
        r["id"]
        for r in df.filter((F.col("v") >= 100.0) & (F.col("v") <= 199.0)).collect()
    )
    assert got == want

    # fully out-of-band: every file prunes, result is empty but typed
    assert read_pruned(spark, paths, "v", 5000.0, 6000.0).count() == 0
