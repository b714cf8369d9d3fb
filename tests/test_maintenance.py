"""Small-file compaction and schema conformance."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pipeline_dataengineer_spark.operators.maintenance import (
    compact_parquet,
    conform_schema,
    union_conformed,
)


def test_compact_parquet_merges_small_files(spark, tmp_path):
    src = str(tmp_path / "small")
    dst = str(tmp_path / "compacted")
    spark.range(10_000).withColumn("v", F.col("id") * 2).repartition(20).write.parquet(src)
    assert len(glob.glob(f"{src}/part-*.parquet")) == 20

    audit = compact_parquet(spark, src, dst, target_file_bytes=10**9)
    assert audit["files_before"] == 20
    out_files = glob.glob(f"{dst}/part-*.parquet")
    assert len(out_files) == 1  # everything fits one target-sized file
    # content identical
    a = sorted(r["id"] for r in spark.read.parquet(dst).collect())
    assert a == list(range(10_000))


def test_conform_schema_adds_casts_drops_and_orders(spark):
    target = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ])
    drifted = spark.createDataFrame(
        [(1, 3, "x", "extra")], ["score", "id", "name", "legacy"]
    )  # wrong order, int score, extra col
    out = conform_schema(drifted, target)
    assert out.columns == ["id", "name", "score"]
    assert dict(out.dtypes)["score"] == "double"
    r = out.collect()[0]
    assert (r["id"], r["name"], r["score"]) == (3, "x", 1.0)


def test_union_conformed_merges_drifted_batches(spark):
    target = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("tag", T.StringType()),
    ])
    old_batch = spark.createDataFrame([(1, 1.5)], ["id", "v"])  # no tag yet
    new_batch = spark.createDataFrame([(2, 2.5, "t")], ["id", "v", "tag"])
    got = {r["id"]: (r["v"], r["tag"])
           for r in union_conformed([old_batch, new_batch], target).collect()}
    assert got == {1: (1.5, None), 2: (2.5, "t")}


def test_materialize_stage_cuts_lineage_and_round_trips(spark, tmp_path):
    from pipeline_dataengineer_spark.operators.maintenance import materialize_stage

    df = spark.range(100).withColumn("v", F.col("id") * 3)
    staged = materialize_stage(df, str(tmp_path / "stage"))
    assert sorted(r["v"] for r in staged.collect()) == [3 * i for i in range(100)]
    # plan is a plain scan of the stage table, not the original lineage
    plan = staged._jdf.queryExecution().optimizedPlan().toString()
    assert "Range" not in plan


def test_json_corrupt_record_modes(spark, tmp_path):
    """Schema-on-read resilience: PERMISSIVE captures bad lines in
    _corrupt_record; DROPMALFORMED silently drops them — at corpus
    scale some malformed lines are a certainty and a job that dies
    at 99% is the wrong behavior."""
    from pyspark.sql import types as T

    p = tmp_path / "data.jsonl"
    p.write_text('{"id": 1, "v": 2.5}\n{BROKEN\n{"id": 2, "v": 3.5}\n')
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("_corrupt_record", T.StringType()),
    ])
    # Spark disallows filtering on ONLY the corrupt-record column of a
    # raw scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN);
    # caching the parsed frame first is the documented pattern.
    perm = spark.read.schema(schema).option("mode", "PERMISSIVE").json(str(p)).cache()
    try:
        bad = perm.filter(F.col("_corrupt_record").isNotNull())
        assert bad.count() == 1 and perm.count() == 3
    finally:
        perm.unpersist()
    dropm = (
        spark.read.schema(schema)
        .option("mode", "DROPMALFORMED")
        .json(str(p))
        .filter(F.col("id").isNotNull())
    )
    assert dropm.count() == 2


def test_compact_parquet_reports_actual_output_files(spark, tmp_path):
    # coalesce cannot INCREASE partitions: asking for more output files
    # than input partitions must report what actually landed, not the
    # request.
    src = str(tmp_path / "two")
    dst = str(tmp_path / "out")
    spark.range(1_000).coalesce(2).write.parquet(src)
    audit = compact_parquet(spark, src, dst, target_file_bytes=1)
    assert audit["files_requested"] > 2
    assert audit["files_after"] == len(glob.glob(f"{dst}/part-*.parquet")) == 2
    assert audit["bytes"] > 0


def test_missing_partitions_finds_gaps(spark):
    import datetime as dt

    from pipeline_dataengineer_spark.operators.maintenance import (
        missing_partitions,
    )

    d = dt.date
    rows = [
        ("a", d(2024, 1, 1)),
        ("a", d(2024, 1, 2)),
        ("a", d(2024, 1, 5)),  # gap: 3rd, 4th
        ("b", d(2024, 2, 1)),  # single day: no gaps
    ]
    df = spark.createDataFrame(rows, "g string, day date")
    got = {
        (r["g"], r["day"])
        for r in missing_partitions(df, "day", ["g"]).collect()
    }
    assert got == {("a", d(2024, 1, 3)), ("a", d(2024, 1, 4))}


def test_missing_partitions_global(spark):
    import datetime as dt

    from pipeline_dataengineer_spark.operators.maintenance import (
        missing_partitions,
    )

    d = dt.date
    df = spark.createDataFrame(
        [(d(2024, 3, 1),), (d(2024, 3, 3),)], "day date"
    )
    got = [r["day"] for r in missing_partitions(df, "day").collect()]
    assert got == [d(2024, 3, 2)]


def test_schema_diff_reports_all_change_kinds(spark):
    from pipeline_dataengineer_spark.operators.maintenance import schema_diff

    a = spark.createDataFrame([], "id long, x double, gone string, y int")
    b = spark.createDataFrame([], "id long, y int, x string, fresh date")
    diff = {d["change"]: d for d in schema_diff(a, b)}
    assert diff["removed"]["column"] == "gone"
    assert diff["added"]["column"] == "fresh"
    assert diff["type_changed"]["column"] == "x"
    assert diff["type_changed"]["from"] == "double"
    assert diff["type_changed"]["to"] == "string"
    assert diff["reordered"]["from"] == ["id", "x", "y"]
    assert diff["reordered"]["to"] == ["id", "y", "x"]
    # identical schemas -> empty report
    assert schema_diff(a, a) == []


def test_flatten_structs_recursive(spark):
    from pipeline_dataengineer_spark.operators.maintenance import (
        flatten_structs,
    )

    df = spark.createDataFrame(
        [(1, {"a": 2, "deep": {"x": "v", "y": 3.0}}, [1, 2])],
        "id long, s struct<a:long, deep:struct<x:string, y:double>>, arr array<long>",
    )
    out = flatten_structs(df)
    assert out.columns == ["id", "s_a", "s_deep_x", "s_deep_y", "arr"]
    r = out.collect()[0]
    assert (r["s_a"], r["s_deep_x"], r["s_deep_y"]) == (2, "v", 3.0)
    assert r["arr"] == [1, 2]  # arrays untouched
    # struct-free frames pass through unchanged
    plain = spark.createDataFrame([(1, "x")], "id long, v string")
    assert flatten_structs(plain).columns == ["id", "v"]
