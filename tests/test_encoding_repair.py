"""Mojibake repair + script profiling (functions/text.py:
fix_mojibake, functions/textstats.py:script_profile) — round 9."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline_dataengineer_spark.functions.text import (
    fix_mojibake,
    is_mojibake,
    mojibake_candidate,
)
from pipeline_dataengineer_spark.functions.textstats import script_profile


def _repair(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, t string")
    rows = df.select(
        "id",
        fix_mojibake(F.col("t")).alias("fixed"),
        is_mojibake(F.col("t")).alias("broken"),
    ).orderBy("id").collect()
    return [(r["fixed"], r["broken"]) for r in rows]


def test_repairs_classic_latin1_mojibake(spark):
    out = _repair(spark, ["cafÃ© crÃ¨me", "naÃ¯ve", "ä¸\xadæ\x96\x87"])
    assert out[0] == ("café crème", True)
    assert out[1] == ("naïve", True)
    assert out[2] == ("中文", True)


def test_clean_text_is_a_fixed_point(spark):
    clean = ["hello world", "café crème", "中文 text", "Привет", ""]
    out = _repair(spark, clean)
    assert [f for f, _ in out] == clean
    assert not any(b for _, b in out)


def test_repair_is_idempotent(spark):
    df = spark.createDataFrame([(1, "cafÃ©")], "id long, t string")
    once = df.select(fix_mojibake(F.col("t")).alias("t"))
    twice = once.select(fix_mojibake(F.col("t")).alias("t"))
    assert twice.collect()[0]["t"] == "café"


def test_cp1252_signature_stays_unrepaired(spark):
    # 'â€œ' (CP1252-mangled curly quote) contains € > U+00FF: outside
    # Spark's encode charset set, documented as unrepaired (candidate
    # NULL), never corrupted
    df = spark.createDataFrame([(1, 'â€œquoteâ€\x9d')], "id long, t string")
    r = df.select(
        mojibake_candidate(F.col("t")).alias("c"),
        fix_mojibake(F.col("t")).alias("f"),
    ).collect()[0]
    assert r["c"] is None
    assert r["f"] == 'â€œquoteâ€\x9d'


def test_null_passthrough(spark):
    df = spark.createDataFrame([(1, None)], "id long, t string")
    r = df.select(fix_mojibake(F.col("t")).alias("f"),
                  is_mojibake(F.col("t")).alias("b")).collect()[0]
    assert r["f"] is None and r["b"] is False


def test_script_profile_counts_and_dominant(spark):
    df = spark.createDataFrame(
        [(1, "abc где 123"), (2, "中文字"), (3, "¿¡!?"), (4, "한국어 とき")],
        "id long, t string",
    )
    rows = {r["id"]: r["p"] for r in df.select("id", script_profile(F.col("t")).alias("p")).collect()}
    assert (rows[1]["latin"], rows[1]["cyrillic"], rows[1]["digit"]) == (3, 3, 3)
    assert rows[1]["dominant"] == "latin"  # tie -> earliest in order
    assert rows[2]["han"] == 3 and rows[2]["dominant"] == "han"
    assert rows[3]["dominant"] == "none"  # punctuation only
    assert rows[4]["hangul"] == 3 and rows[4]["kana"] == 2
    assert rows[4]["dominant"] == "hangul"


def test_streaming_parity(spark, tmp_path):
    """Both new text ops are stateless projections, so they must run
    unchanged on a readStream plan and produce the batch answer —
    proves no batch-only construct (collect, count, window-less
    aggregate) snuck into the expression."""
    src = str(tmp_path / "docs")
    rows = [
        (1, "cafÃ© crÃ¨me"), (2, "hello"), (3, "中文 text"), (4, "Привет 123")
    ]
    batch = spark.createDataFrame(rows, "id long, t string")
    batch.write.parquet(src)

    def apply(df):
        return df.select(
            "id",
            fix_mojibake(F.col("t")).alias("fixed"),
            is_mojibake(F.col("t")).alias("broken"),
            script_profile(F.col("t")).alias("p"),
        )

    stream = spark.readStream.schema("id long, t string").parquet(src)
    q = (
        apply(stream)
        .writeStream.format("memory")
        .queryName("enc_stream")
        .outputMode("append")
        .option("checkpointLocation", f"{tmp_path}/ckpt_enc")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (tuple(r) for r in spark.sql("SELECT * FROM enc_stream").collect())
    )
    want = sorted(tuple(r) for r in apply(batch).collect())
    assert got == want


def test_double_mojibake_two_passes(spark):
    """A twice-mangled page ('é' mangled to 'Ã©' then re-crawled and
    mangled again) unwinds with passes=2; one pass strips exactly one
    layer; clean text is a fixed point at any depth."""
    once = "cafÃ©"
    twice_df = spark.createDataFrame([(1, once)], "id long, t string").select(
        F.decode(F.encode(F.col("t"), "UTF-8"), "ISO-8859-1").alias("t")
    )
    twice = twice_df.collect()[0]["t"]
    df = spark.createDataFrame(
        [(1, twice), (2, once), (3, "café"), (4, "plain")],
        "id long, t string",
    )
    out = {r["id"]: (r["p1"], r["p2"]) for r in df.select(
        "id",
        fix_mojibake(F.col("t")).alias("p1"),
        fix_mojibake(F.col("t"), passes=2).alias("p2"),
    ).collect()}
    assert out[1] == (once, "café")   # one layer per pass
    assert out[2] == ("café", "café")
    assert out[3] == ("café", "café")  # fixed point survives extra passes
    assert out[4] == ("plain", "plain")


def test_script_profile_null_text(spark):
    """NULL text yields NULL counts AND NULL dominant — matching what
    any SQL replay (greatest/CASE over NULLs) produces, instead of a
    'none' that only the Spark fold would emit."""
    df = spark.createDataFrame([(1, None)], "id long, t string")
    r = df.select(script_profile(F.col("t")).alias("p")).collect()[0]["p"]
    assert r["latin"] is None and r["dominant"] is None
