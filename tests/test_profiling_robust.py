"""Unit tests: profiling, winsorize, stratified sampling, exact-substring spans."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline_dataengineer_spark.operators.dedup import duplicate_ngram_spans
from pipeline_dataengineer_spark.operators.profiling import profile_table
from pipeline_dataengineer_spark.operators.robust import winsorize
from pipeline_dataengineer_spark.operators.sampling import stratified_sample


def test_profile_table_counts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")],
        ["k", "v"],
    )
    rows = {r["col_name"]: r for r in profile_table(df).collect()}
    assert rows["k"]["n_rows"] == 4
    assert rows["k"]["n_nulls"] == 1
    assert rows["k"]["n_distinct"] == 3
    assert rows["k"]["min_value"] == "1" and rows["k"]["max_value"] == "3"
    assert rows["v"]["n_nulls"] == 1
    assert rows["v"]["n_distinct"] == 2
    assert rows["v"]["min_value"] == "a" and rows["v"]["max_value"] == "b"


def test_winsorize_clips_to_band(spark):
    df = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 101)], ["grp", "value"]
    )
    out = winsorize(df, "value", 0.10, 0.90, group_cols=["grp"])
    vals = [r["value_w"] for r in out.collect()]
    # exact interpolated percentiles of 1..100 at 0.1/0.9 are 10.9 / 90.1
    assert abs(min(vals) - 10.9) < 1e-9 and abs(max(vals) - 90.1) < 1e-9
    # interior values untouched
    assert 50.0 in vals


def test_stratified_sample_fractions_and_stability(spark):
    df = spark.range(0, 20_000).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    out = stratified_sample(df, "id", "lang", {"en": 0.5, "de": 0.1})
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["en"] / 10_000 - 0.5) < 0.05
    assert abs(counts["de"] / 10_000 - 0.1) < 0.05
    # layout independence: same membership after repartition
    ids1 = {r["id"] for r in out.collect()}
    ids2 = {r["id"] for r in stratified_sample(df.repartition(13), "id", "lang", {"en": 0.5, "de": 0.1}).collect()}
    assert ids1 == ids2


def test_duplicate_ngram_spans_merges_overlaps(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, "x x a b c d e f q r"),
            (3, "totally different words here now ok fine yes"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        (r["doc_id"], r["span_start"], r["span_end"]): r["n_dup_grams"]
        for r in duplicate_ngram_spans(docs, "doc_id", "text", n_tokens=5).collect()
    }
    # docs 1+2 share "a b c d e f": two 5-gram starts each, merged to one span
    assert rows == {(1, 1, 6): 2, (2, 3, 8): 2}


def test_duplicate_ngram_spans_hash_grams_same_spans(spark):
    docs = spark.createDataFrame(
        [(1, "p q r s t u v"), (2, "z p q r s t u k")],
        ["doc_id", "text"],
    )
    plain = set(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_ngram_spans(docs, "doc_id", "text", n_tokens=4).collect()
    )
    hashed = set(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_ngram_spans(
            docs, "doc_id", "text", n_tokens=4, hash_grams=True
        ).collect()
    )
    assert plain == hashed and plain


def test_cross_corpus_contamination(spark):
    from pipeline_dataengineer_spark.operators.dedup import (
        cross_corpus_contamination,
    )

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        # contains corpus doc 1's run "beta gamma delta epsilon"
        [(100, "question: beta gamma delta epsilon please answer")],
        ["doc_id", "text"],
    )
    rows = cross_corpus_contamination(
        corpus, bench, "doc_id", "text", n_tokens=4
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["corpus_id"], r["bench_id"], r["n_shared_grams"]) == (1, 100, 1)


def test_quantile_bucketize_balances_buckets(spark):
    from pipeline_dataengineer_spark.operators.robust import quantile_bucketize

    df = spark.createDataFrame([(i, float(i)) for i in range(100)], ["id", "v"])
    out = quantile_bucketize(df, "v", n_buckets=4)
    sizes = {r["v_bucket"]: r["n"] for r in
             out.groupBy("v_bucket").agg(F.count("*").alias("n")).collect()}
    assert set(sizes) == {0, 1, 2, 3}
    assert all(20 <= n <= 30 for n in sizes.values())  # ~equal frequency


def test_corr_matrix_one_pass_values(spark):
    from pipeline_dataengineer_spark.operators.profiling import corr_matrix

    df = spark.createDataFrame(
        [(float(i), float(2 * i), float(-i)) for i in range(50)], ["a", "b", "c"]
    )
    got = {(r["col_a"], r["col_b"]): r["corr"]
           for r in corr_matrix(df, ["a", "b", "c"]).collect()}
    assert abs(got[("a", "b")] - 1.0) < 1e-9   # perfectly correlated
    assert abs(got[("a", "c")] + 1.0) < 1e-9   # perfectly anti-correlated
    assert abs(got[("a", "a")] - 1.0) < 1e-9
    assert len(got) == 6  # upper triangle incl. diagonal


def test_percentile_size_switch_fires_on_hot_group(spark):
    # manufactured hot group: max_exact_rows=10 forces the sketch path;
    # the audit must report the switch and results must stay sane.
    from pipeline_dataengineer_spark.operators.robust import (
        mad_outliers,
        quantile_bucketize,
        winsorize,
    )

    df = spark.range(1_000).select(
        (F.col("id") % 2).alias("grp"), F.col("id").cast("double").alias("v")
    )
    w = winsorize(df, "v", 0.05, 0.95, group_cols=["grp"], max_exact_rows=10)
    assert w.robust_audit["mode"] == "approx"
    assert w.robust_audit["max_group_rows"] == 500
    vals = [r["v_w"] for r in w.collect()]
    assert len(vals) == 1_000
    # clipped into roughly the 5–95% band of each 500-row group
    assert min(vals) >= 0 and max(vals) <= 999
    assert max(vals) - min(vals) < 999  # something actually clipped

    m = mad_outliers(df, "v", group_cols=["grp"], max_exact_rows=10)
    assert m.robust_audit["mode"] == "approx"
    assert m.count() == 1_000

    b = quantile_bucketize(df, "v", n_buckets=4, max_exact_rows=10)
    assert b.robust_audit["mode"] == "approx"
    counts = {r["v_bucket"]: r["n"] for r in b.groupBy("v_bucket").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {0, 1, 2, 3}
    # equal-frequency within sketch tolerance
    assert all(abs(c - 250) < 30 for c in counts.values())


def test_percentile_default_stays_exact(spark):
    from pipeline_dataengineer_spark.operators.robust import winsorize

    df = spark.range(100).select(F.col("id").cast("double").alias("v"))
    w = winsorize(df, "v")
    assert w.robust_audit["mode"] == "exact"
    assert w.robust_audit["max_group_rows"] == 100


def test_skew_report_flags_hot_key(spark):
    from pipeline_dataengineer_spark.operators.profiling import skew_report

    hot = spark.range(0, 9000).selectExpr("'hot' AS k")
    cold = spark.range(0, 1000).selectExpr("CAST(id AS STRING) AS k")
    rep = skew_report(hot.union(cold), ["k"], top=3).collect()
    assert rep[0]["k"] == "hot"
    assert rep[0]["row_share"] == 0.9
    assert rep[0]["total_rows"] == 10000
    assert rep[0]["distinct_keys"] == 1001
    assert rep[0]["max_share"] == 0.9
    assert rep[0]["suggested_salt"] >= 28  # ~9000/(10000/32)
    # cold keys suggest no salting
    assert all(r["suggested_salt"] == 1 for r in rep[1:])


def test_skew_report_uniform_keys(spark):
    from pipeline_dataengineer_spark.operators.profiling import skew_report

    df = spark.range(0, 4000).selectExpr("CAST(id % 40 AS STRING) AS k")
    rep = skew_report(df, ["k"], top=5).collect()
    assert len(rep) == 5
    assert all(r["key_rows"] == 100 for r in rep)
    assert rep[0]["p99_med_ratio"] == 1.0


def test_weighted_quantile_hand_case(spark):
    import pytest

    from pipeline_dataengineer_spark.operators.robust import (
        weighted_quantile,
    )

    rows = [("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 10.0, 8.0)]
    df = spark.createDataFrame(rows, "k string, v double, w double")
    # total weight 10; cum: 1 -> 0.1, 2 -> 0.2, 10 -> 1.0
    got = weighted_quantile(df, "v", "w", q=0.5, group_cols=["k"]).collect()
    assert got[0]["wq_0_5"] == 10.0
    got25 = weighted_quantile(df, "v", "w", q=0.15, group_cols=["k"]).collect()
    assert got25[0]["wq_0_15"] == 2.0
    # non-positive weights raise at EXECUTION (inline ANSI check —
    # the plan stays single-pass instead of paying an eager guard job)
    with pytest.raises(Exception, match="weights must be > 0"):
        weighted_quantile(
            spark.createDataFrame([("g", 1.0, 0.0)], "k string, v double, w double"),
            "v", "w",
        ).collect()


def test_weighted_quantile_equal_weights_is_median(spark):
    from pipeline_dataengineer_spark.operators.robust import (
        weighted_quantile,
    )

    df = spark.createDataFrame(
        [("g", float(v), 1.0) for v in range(1, 102)],
        "k string, v double, w double",
    )
    got = weighted_quantile(df, "v", "w", q=0.5, group_cols=["k"]).collect()
    assert got[0]["wq_0_5"] == 51.0


def test_concentration_metrics_known_cases(spark):
    import pytest

    from pipeline_dataengineer_spark.operators.profiling import (
        concentration_metrics,
    )

    rows = (
        # group "eq": perfectly equal -> gini 0, hhi 1/4
        [("eq", f"e{i}", 10.0) for i in range(4)]
        # group "mono": one entity holds everything
        + [("mono", "only", 50.0), ("mono", "zero", 0.0)]
    )
    df = spark.createDataFrame(rows, "g string, e string, v double")
    got = {
        r["g"]: r
        for r in concentration_metrics(df, "v", ["e"], ["g"]).collect()
    }
    assert got["eq"]["gini"] == pytest.approx(0.0, abs=1e-12)
    assert got["eq"]["hhi"] == pytest.approx(0.25)
    assert got["eq"]["top1_share"] == pytest.approx(0.25)
    # n=2, all mass on one: gini = 2*(2*50)/(2*50) - 3/2 = 0.5
    assert got["mono"]["gini"] == pytest.approx(0.5)
    assert got["mono"]["hhi"] == pytest.approx(1.0)
    assert got["mono"]["top1_share"] == pytest.approx(1.0)


def test_concentration_entity_totals_first(spark):
    """Multiple fact rows per entity must collapse before ranking."""
    from pipeline_dataengineer_spark.operators.profiling import (
        concentration_metrics,
    )

    df = spark.createDataFrame(
        [("g", "a", 5.0), ("g", "a", 5.0), ("g", "b", 10.0)],
        "g string, e string, v double",
    )
    row = concentration_metrics(df, "v", ["e"], ["g"]).collect()[0]
    assert row["n_entities"] == 2
    assert row["top1_share"] == 0.5  # a == b after collapsing


def test_histogram_clamps_and_counts_nulls(spark):
    from pipeline_dataengineer_spark.operators.profiling import histogram

    rows = [("g", -5.0), ("g", 0.5), ("g", 9.9), ("g", 50.0), ("g", None)]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {
        r["bin"]: (r["n"], r["bin_lo"], r["bin_hi"])
        for r in histogram(df, "v", bins=10, lo=0.0, hi=10.0, group_cols=["k"]).collect()
    }
    assert got[-1][0] == 1          # NULL bucket
    assert got[0][0] == 2           # -5 clamped into bin 0 with 0.5
    assert got[9][0] == 2           # 9.9 and clamped 50.0
    assert got[0][1:] == (0.0, 1.0)
    assert got[9][1:] == (9.0, 10.0)


def test_histogram_auto_bounds(spark):
    from pipeline_dataengineer_spark.operators.profiling import histogram

    df = spark.range(0, 100).selectExpr("CAST(id AS DOUBLE) v")
    got = histogram(df, "v", bins=4).collect()
    assert sum(r["n"] for r in got) == 100
    assert len([r for r in got if r["bin"] >= 0]) == 4


def test_global_exact_quantiles_matches_sorted_ranks(spark):
    import math

    from pipeline_dataengineer_spark.operators.robust import (
        global_exact_quantiles,
    )

    vals = [float(v) for v in range(1, 101)]  # 1..100
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = {
        r["q"]: r["value"]
        for r in global_exact_quantiles(df, "x", [0.01, 0.5, 0.99, 1.0]).collect()
    }
    # discrete rule: smallest value with cume_dist >= q == ceil(q*n)th
    assert out[0.01] == 1.0
    assert out[0.5] == 50.0
    assert out[0.99] == 99.0
    assert out[1.0] == 100.0
    # nulls excluded, bad q rejected
    import pytest as _pytest

    with _pytest.raises(ValueError):
        global_exact_quantiles(df, "x", [0.0])


def test_percentile_metadata_bound_skips_probe(spark, tmp_path):
    from pipeline_dataengineer_spark.operators.robust import (
        _static_row_bound,
        winsorize,
    )

    p = str(tmp_path / "vals.parquet")
    spark.createDataFrame(
        [(i % 3, float(i)) for i in range(300)], "grp int, v double"
    ).write.parquet(p)
    df = spark.read.parquet(p)
    # row-preserving plans get a sound footer bound, zero Spark jobs
    assert _static_row_bound(df) == 300
    assert _static_row_bound(df.filter("v > 10").select("grp", "v")) == 300
    # expanding plans are disqualified
    assert _static_row_bound(df.join(df.select("grp").distinct(), "grp")) is None
    assert _static_row_bound(df.unionByName(df)) is None
    # in-memory sources are disqualified (no footers)
    mem = spark.createDataFrame([(1, 1.0)], "grp int, v double")
    assert _static_row_bound(mem) is None
    # end-to-end: the exact path is chosen via metadata and results
    # match the probe-free forced-exact path
    w_meta = winsorize(df, "v", 0.1, 0.9, group_cols=["grp"])
    assert w_meta.robust_audit["mode"] == "exact"
    w_exact = winsorize(df, "v", 0.1, 0.9, group_cols=["grp"], max_exact_rows=None)
    assert sorted(r["v_w"] for r in w_meta.collect()) == sorted(
        r["v_w"] for r in w_exact.collect()
    )
    # a threshold below the footer bound still reaches the probe and
    # flips to approx (the switch keeps firing)
    w_small = winsorize(df, "v", 0.1, 0.9, group_cols=["grp"], max_exact_rows=50)
    assert w_small.robust_audit["mode"] == "approx"


def test_median_ci_order_statistics(spark):
    import math

    from pipeline_dataengineer_spark.operators.robust import median_ci

    vals = sorted([7.0, 1.0, 9.0, 3.0, 5.0, 11.0, 13.0, 2.0, 8.0])  # n=9
    rows = [("g", v) for v in vals]
    df = spark.createDataFrame(rows, "k string, v double")
    r = median_ci(df, ["k"], "v").collect()[0]
    assert r["n"] == 9
    assert r["median"] == 7.0  # the 5th order statistic
    # hand-compute the rank bounds (z = 1.96, n = 9)
    z = 1.959963984540054
    k_lo = max(math.floor((9 - z * 3) / 2), 1)
    k_hi = min(math.ceil((9 + z * 3) / 2) + 1, 9)
    assert r["ci_lo"] == vals[k_lo - 1]
    assert r["ci_hi"] == vals[k_hi - 1]
    assert r["ci_lo"] <= r["median"] <= r["ci_hi"]
    # CI bounds are OBSERVED values (distribution-free guarantee)
    assert r["ci_lo"] in vals and r["ci_hi"] in vals


def test_trimmed_mean_interior_average(spark):
    import pytest

    from pipeline_dataengineer_spark.operators.robust import trimmed_mean

    # 10 values with two wild outliers; 10% trim drops exactly the
    # min and max
    vals = [1000.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, -1000.0]
    df = spark.createDataFrame([("g", v) for v in vals], "k string, v double")
    r = trimmed_mean(df, ["k"], "v", trim=0.1).collect()[0]
    assert r["n"] == 10 and r["n_used"] == 8
    assert r["trimmed_mean"] == round(sum(range(2, 10)) / 8, 6)
    # trim=0 is the plain mean
    r0 = trimmed_mean(df, ["k"], "v", trim=0.0).collect()[0]
    assert r0["n_used"] == 10
    with pytest.raises(ValueError):
        trimmed_mean(df, ["k"], "v", trim=0.5)


def test_theil_atkinson_known_values(spark):
    """Equal incomes -> all indices 0; a 2-value 80/20 split matches
    the textbook closed forms."""
    import math

    from pipeline_dataengineer_spark.operators.inequality import (
        theil_atkinson,
    )

    eq = spark.createDataFrame([(5.0,)] * 10, "v double")
    r = theil_atkinson(eq, "v").collect()[0]
    assert r["theil_t"] == 0.0 and r["theil_l"] == 0.0 and r["atkinson"] == 0.0

    # 4 people at 1, 1 person at 16: mu = 4
    sk = spark.createDataFrame([(1.0,)] * 4 + [(16.0,)], "v double")
    got = theil_atkinson(sk, "v", epsilon=0.5).collect()[0]
    mu = 4.0
    t_exp = (4 * (1 / mu) * math.log(1 / mu)
             + (16 / mu) * math.log(16 / mu)) / 5
    l_exp = (4 * math.log(mu / 1) + math.log(mu / 16)) / 5
    a_exp = 1 - ((4 * 1**0.5 + 16**0.5) / 5) ** 2 / mu
    assert abs(got["theil_t"] - t_exp) < 1e-6
    assert abs(got["theil_l"] - l_exp) < 1e-6
    assert abs(got["atkinson"] - a_exp) < 1e-6
