"""Regression tests for the round-4 ADVICE findings: string-key
Count-Min, the kn_score OOV-continuation floor, grouped_ols NULL
pairwise deletion, mann_kendall order-tie exclusion, and
non-bigint keys in the stateful streaming operators."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------------
# ADVICE #1 — Count-Min over string keys
# ------------------------------------------------------------------


def test_cm_string_keys_estimate_correctly(spark):
    """String keys hash through cm_hash_str — estimates obey
    est >= true and are exact in the collision-free width (the old
    cast-to-long path silently returned 0 for every string)."""
    from pipeline_dataengineer_spark.functions.sketches import (
        cm_estimate,
        cm_states,
    )

    rows = [("https://a.example/x",) * 1] * 5 + [
        ("https://b.example/y",)
    ] * 3 + [("café-token",)] * 2
    df = spark.createDataFrame(rows, "url string")
    state = cm_states(df, [], "url", depth=4, width=1 << 14)
    est = {
        r["url"]: r["est_count"]
        for r in cm_estimate(
            state, df.select("url").distinct(), "url",
            depth=4, width=1 << 14,
        ).collect()
    }
    assert est == {
        "https://a.example/x": 5,
        "https://b.example/y": 3,
        "café-token": 2,
    }


def test_cm_fractional_key_raises(spark):
    """A double value column raises instead of silently truncating
    (the documented one-sided guarantee can't survive a lossy cast)."""
    from pipeline_dataengineer_spark.functions.sketches import cm_states

    df = spark.createDataFrame([(1.5,), (2.5,)], "v double")
    with pytest.raises(TypeError, match="only integral and string"):
        cm_states(df, [], "v", depth=4, width=64)


def test_cm_hash_str_matches_duckdb_twin(spark):
    """cm_hash_str ≡ cm_hash_str_sql bit-for-bit (the property that
    keeps string sketches oracle-replayable)."""
    import duckdb

    from pipeline_dataengineer_spark.functions.sketches import (
        cm_hash_str,
        cm_hash_str_sql,
    )

    vals = ["", "a", "Zürich", "the-quick/brown?fox", "ünïcødé ░"]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {
        r["v"]: r["h"]
        for r in df.select("v", cm_hash_str("v").alias("h")).collect()
    }
    con = duckdb.connect()
    for v in vals:
        want = con.execute(
            f"SELECT {cm_hash_str_sql('v')} FROM (SELECT ? AS v)", [v]
        ).fetchone()[0]
        assert got[v] == want, v


# ------------------------------------------------------------------
# ADVICE #2 — kn_score OOV-continuation floor
# ------------------------------------------------------------------


def test_kn_score_floors_oov_continuation(spark):
    """A bigram whose context is known but whose continuation was
    never seen anywhere gets unk_logp instead of being silently
    dropped by avg(ln(0)=NULL): n_bigrams and the mean's denominator
    agree, and the OOV doc scores WORSE than an in-vocab doc."""
    from pipeline_dataengineer_spark.operators.text_features import (
        kn_score,
        train_kn_bigram_lm,
    )

    train = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran"), (3, "a dog sat")],
        "doc_id bigint, text string",
    )
    lm = train_kn_bigram_lm(train, text_col="text")
    test = spark.createDataFrame(
        [
            (10, "the cat sat"),  # fully in-vocab
            (11, "the zzqq"),  # known context 'the', unseen continuation
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r for r in kn_score(test, lm, round_to=6).collect()
    }
    assert out[10]["n_bigrams"] == 2
    assert out[11]["n_bigrams"] == 1
    assert out[11]["ppl"] is not None  # was NULL-dropped before
    # the OOV-continuation doc is penalized toward exp(-unk_logp)
    assert out[11]["ppl"] > out[10]["ppl"]
    assert out[11]["ppl"] == pytest.approx(math.exp(16.11809565095832), rel=1e-4)


# ------------------------------------------------------------------
# ADVICE #3 — grouped_ols pairwise NULL deletion
# ------------------------------------------------------------------


def test_grouped_ols_null_pairs_dropped(spark):
    """Rows with NULL in either coordinate contribute to NO moment:
    the fit over (k, NULL-polluted data) equals the fit over the
    complete pairs only (previously n counted every row while the
    sums skipped NULLs — inconsistent moments, wrong slope)."""
    from pipeline_dataengineer_spark.operators.timeseries import grouped_ols

    clean = [("k", 1.0, 2.0), ("k", 2.0, 4.0), ("k", 3.0, 6.1)]
    dirty = clean + [("k", None, 9.0), ("k", 7.0, None), ("k", None, None)]
    f_clean = grouped_ols(
        spark.createDataFrame(clean, "k string, x double, y double"),
        ["k"], "x", "y",
    ).collect()[0]
    f_dirty = grouped_ols(
        spark.createDataFrame(dirty, "k string, x double, y double"),
        ["k"], "x", "y",
    ).collect()[0]
    assert f_dirty["n"] == 3
    assert f_dirty["slope"] == f_clean["slope"]
    assert f_dirty["intercept"] == f_clean["intercept"]
    assert f_dirty["r2"] == f_clean["r2"]


# ------------------------------------------------------------------
# ADVICE #4 — mann_kendall excludes order-tied pairs
# ------------------------------------------------------------------


def test_mann_kendall_order_ties_carry_no_trend(spark):
    """Pairs tied on the order column contribute nothing to S: two
    simultaneous observations with different values leave S exactly
    as the strict-order pairs dictate (before the fix each tied pair
    forced sign=+1)."""
    from pipeline_dataengineer_spark.operators.stats_tests import (
        mann_kendall,
    )

    # t=1 has two simultaneous values (5.0, 1.0). Strict-order pairs:
    # (5,3),(5,4),(1,3),(1,4),(3,4) -> signs -1,-1,+1,+1,+1 => S=1
    rows = [
        ("k", 1, 5.0), ("k", 1, 1.0), ("k", 2, 3.0), ("k", 3, 4.0),
    ]
    out = mann_kendall(
        spark.createDataFrame(rows, "k string, t int, v double"),
        ["k"], "t", "v",
    ).collect()[0]
    assert out["n"] == 4
    assert out["s"] == 1


# ------------------------------------------------------------------
# ADVICE #5 — stateful streaming operators with string keys
# ------------------------------------------------------------------


def _drain(stream_df, tmpdir, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir}/ckpt_{name}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return name


def test_rate_limit_string_keys(spark, tmp_path):
    """rate_limit's output schema follows the key column's real type
    — string tenant ids run end-to-end (previously a hardcoded
    'bigint' schema failed at runtime)."""
    import pandas as pd

    from pipeline_dataengineer_spark.streaming.stateful import rate_limit

    src = f"{tmp_path}/src"
    import os
    os.makedirs(src, exist_ok=True)
    pd.DataFrame(
        {
            "tenant": ["acme"] * 3 + ["globex"],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00.000", "2024-01-01 00:00:00.200",
                 "2024-01-01 00:00:00.400", "2024-01-01 00:00:01.000"]
            ).astype("datetime64[us]"),
        }
    ).to_parquet(f"{src}/part.parquet")
    stream = (
        spark.readStream.schema("tenant string, ts timestamp")
        .parquet(src)
    )
    out = rate_limit(
        stream, key_col="tenant", ts_col="ts", capacity=2,
        refill_per_sec=0.1,
    )
    name = _drain(out, tmp_path, "rl_str")
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    assert {r["tenant"] for r in rows} == {"acme", "globex"}
    acme = sorted(
        (r for r in rows if r["tenant"] == "acme"), key=lambda r: r["ts"]
    )
    assert [r["admitted"] for r in acme] == [True, True, False]


def test_streaming_ewma_string_keys(spark, tmp_path):
    """streaming_ewma with a string key column drains cleanly."""
    import pandas as pd

    from pipeline_dataengineer_spark.streaming.stateful import (
        streaming_ewma,
    )

    src = f"{tmp_path}/src"
    import os
    os.makedirs(src, exist_ok=True)
    pd.DataFrame(
        {
            "sensor": ["s-a", "s-a", "s-b"],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:00:01",
                 "2024-01-01 00:00:00"]
            ).astype("datetime64[us]"),
            "value": [1.0, 2.0, 10.0],
        }
    ).to_parquet(f"{src}/part.parquet")
    stream = (
        spark.readStream.schema("sensor string, ts timestamp, value double")
        .parquet(src)
    )
    out = streaming_ewma(
        stream, key_col="sensor", ts_col="ts", value_col="value",
        alpha=0.5,
    )
    name = _drain(out, tmp_path, "ewma_str")
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    got = {
        (r["sensor"], r["ts"].isoformat()): r["ewma"] for r in rows
    }
    assert got[("s-a", "2024-01-01T00:00:01")] == pytest.approx(1.5)
    assert got[("s-b", "2024-01-01T00:00:00")] == pytest.approx(10.0)
