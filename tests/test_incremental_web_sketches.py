"""Incremental aggregate states, URL canonicalization, HLL sketches,
MAD outliers — unit-level checks beyond the oracle queries."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pipeline_dataengineer_spark.functions.sketches import (
    approx_distinct_by,
    hll_estimate,
    hll_sketches,
    merge_hll,
)
from pipeline_dataengineer_spark.operators.incremental import (
    finalize_agg_state,
    merge_agg_states,
    partial_agg_state,
)
from pipeline_dataengineer_spark.operators.robust import mad_outliers
from pipeline_dataengineer_spark.operators.web import (
    domain_stats,
    normalize_urls,
    parse_urls,
)


def test_merged_states_equal_direct_aggregate(spark):
    rows = [(i % 3, float((i * 7) % 23) - 5.0) for i in range(200)]
    df = spark.createDataFrame(rows, ["k", "v"]).withColumn(
        "v", F.when(F.col("v") == -5.0, None).otherwise(F.col("v"))
    )
    # three disjoint slices, merged out of order
    s1 = partial_agg_state(df.filter("v < 3"), ["k"], "v")
    s2 = partial_agg_state(df.filter("v >= 3 and v < 10"), ["k"], "v")
    s3 = partial_agg_state(df.filter("v >= 10 or v is null"), ["k"], "v")
    merged = finalize_agg_state(
        merge_agg_states(s3, s1, s2, keys=["k"]), ["k"]
    ).collect()
    direct = (
        df.groupBy("k")
        .agg(
            F.count("v").alias("cnt"),
            F.sum("v").alias("total"),
            F.min("v").alias("vmin"),
            F.max("v").alias("vmax"),
            F.avg("v").alias("avg_v"),
            F.stddev_samp("v").alias("stddev_v"),
        )
        .collect()
    )
    got = {r["k"]: r for r in merged}
    for r in direct:
        g = got[r["k"]]
        assert g["cnt"] == r["cnt"]
        for f in ("total", "vmin", "vmax", "avg_v", "stddev_v"):
            assert math.isclose(g[f], r[f], rel_tol=1e-9), (f, g[f], r[f])


def test_url_normalize_cases(spark):
    cases = [
        # (raw, expected)
        ("HTTPS://WWW.Site.COM:443/a/b/?utm_source=x&q=1#frag",
         "https://site.com/a/b?q=1"),
        ("http://site.com:8080/path", "http://site.com:8080/path"),
        ("http://www.site.com:80/", "http://site.com/"),
        ("https://site.com", "https://site.com/"),
        ("http://site.com/p?fbclid=abc&gclid=1&utm_campaign=z",
         "http://site.com/p"),
        ("http://site.com/p?a=1&b=2", "http://site.com/p?a=1&b=2"),
        ("https://sub.www-like.site.com/x/", "https://sub.www-like.site.com/x"),
    ]
    df = spark.createDataFrame([(i, c[0]) for i, c in enumerate(cases)], ["i", "url"])
    got = {r["i"]: r["url_norm"] for r in normalize_urls(df, "url").collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i], want)


def test_parse_urls_components(spark):
    df = spark.createDataFrame(
        [(1, "https://Host.Example.org:9443/p/q?x=1&y=2#sec")], ["i", "url"]
    )
    r = parse_urls(df, "url").collect()[0]
    assert (r["scheme"], r["host"], r["port"]) == ("https", "host.example.org", "9443")
    assert (r["path"], r["query"], r["fragment"]) == ("/p/q", "x=1&y=2", "sec")


def test_domain_stats_groups_hosts_under_domain(spark):
    urls = [
        (1, "https://www.a.com/1", 10),
        (2, "https://img.a.com/2", 20),
        (3, "https://a.com/3", 30),
        (4, "https://b.org/1", 5),
    ]
    df = spark.createDataFrame(urls, ["id", "url", "sz"])
    got = {r["domain"]: r for r in domain_stats(df, "url", ["sz"]).collect()}
    assert got["a.com"]["n_pages"] == 3
    # hosts are counted raw (www.a.com, img.a.com, a.com all distinct);
    # only the DOMAIN key folds www
    assert got["a.com"]["n_hosts"] == 3
    assert got["a.com"]["sum_sz"] == 60
    assert got["b.org"]["n_pages"] == 1


def test_hll_merge_equals_single_pass_and_is_accurate(spark):
    df = spark.createDataFrame(
        [(i % 4, i % 997) for i in range(20000)], ["k", "v"]
    )
    single = {
        r["k"]: r["approx_distinct"]
        for r in approx_distinct_by(df, ["k"], "v").collect()
    }
    halves = [df.filter(F.pmod("v", F.lit(2)) == p) for p in (0, 1)]
    merged_states = merge_hll(
        hll_sketches(halves[0], ["k"], "v"),
        hll_sketches(halves[1], ["k"], "v"),
        keys=["k"],
    )
    merged = {
        r["k"]: r["approx_distinct"]
        for r in hll_estimate(merged_states, ["k"]).collect()
    }
    exact = {
        r["k"]: r["d"]
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("d")).collect()
    }
    for k in exact:
        # sketch merge is lossless: sharded build == one-pass build
        assert merged[k] == single[k]
        assert abs(merged[k] - exact[k]) / exact[k] < 0.05


def test_mad_outliers_flags_only_the_planted_point(spark):
    rows = [(i, "a", float(v)) for i, v in enumerate([10, 11, 9, 10, 12, 10, 11, 500])]
    rows += [(100 + i, "b", 5.0) for i in range(5)]  # constant group: MAD 0
    df = spark.createDataFrame(rows, ["id", "g", "v"])
    got = {r["id"]: r["is_outlier"] for r in
           mad_outliers(df, "v", group_cols=["g"], k=3.0).collect()}
    assert got[7] is True  # the 500
    assert all(got[i] is False for i in range(7))
    # all-constant group flags nothing (0 > 0 is false)
    assert all(got[100 + i] is False for i in range(5))


def test_normalize_urls_preserves_caller_columns_named_like_parts(spark):
    """A crawl record often already has host/path columns; the
    canonicalizer must not clobber them (internals are prefixed)."""
    df = spark.createDataFrame(
        [(1, "https://www.A.com/x/?utm_source=s", "keep-host", "keep-path")],
        ["i", "url", "host", "path"],
    )
    out = normalize_urls(df, "url").collect()[0]
    assert out["url_norm"] == "https://a.com/x"
    assert out["host"] == "keep-host"
    assert out["path"] == "keep-path"


def test_normalize_urls_is_idempotent_on_fuzzed_urls(spark):
    """Canonicalization must be a projection onto its own image:
    normalize(normalize(u)) == normalize(u). 200 seeded-random URLs
    across schemes/hosts/ports/paths/params/fragments, one Spark job."""
    import random

    rng = random.Random(42)
    urls = []
    for _ in range(200):
        scheme = rng.choice(["http", "https", "HTTP", "HtTpS"])
        host = rng.choice(["www.", "", "sub."]) + rng.choice(
            ["ex.com", "A-b.Example.ORG", "x.y.z.io"]
        )
        port = rng.choice(["", ":80", ":443", ":8080"])
        path = rng.choice(["", "/", "/a", "/a/b/", "/a%20b/"])
        params = "&".join(
            rng.sample(
                ["utm_source=x", "q=1", "fbclid=z", "a=2", "utm_campaign=c", "b="],
                rng.randint(0, 4),
            )
        )
        frag = rng.choice(["", "#f", "#sec-2"])
        urls.append(f"{scheme}://{host}{port}{path}"
                    + (f"?{params}" if params else "") + frag)
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], ["i", "url"])
    once = normalize_urls(df, "url", out_col="n1")
    twice = normalize_urls(once, "n1", out_col="n2")
    bad = twice.filter(F.col("n1") != F.col("n2")).collect()
    assert bad == [], bad[:5]


def test_topk_sketch_merge_equals_single_pass_below_capacity(spark):
    """approx_top_k states: counts are EXACT below max_items, so a
    two-shard merge must equal both the single-pass sketch AND the
    plain exact groupBy count."""
    from pipeline_dataengineer_spark.functions.sketches import (
        merge_topk,
        topk_estimate,
        topk_states,
    )

    rows = [(f"u{i % 13}", i) for i in range(2600)]
    df = spark.createDataFrame(rows, ["item", "i"])
    a = df.filter(F.col("i") < 900)
    b = df.filter(F.col("i") >= 900)
    merged = merge_topk(
        topk_states(a, [], "item"), topk_states(b, [], "item"), keys=[]
    )
    got = {
        r["item"]: r["est_count"]
        for r in topk_estimate(merged, [], k=13).collect()
    }
    single = {
        r["item"]: r["est_count"]
        for r in topk_estimate(topk_states(df, [], "item"), [], k=13).collect()
    }
    exact = {
        r["item"]: r["cnt"]
        for r in df.groupBy("item").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == single == exact and len(got) == 13


def test_topk_estimate_cut_is_deterministic_on_ties(spark):
    from pipeline_dataengineer_spark.functions.sketches import (
        topk_estimate,
        topk_states,
    )

    # 6 items, all with identical counts: k=3 must pick the 3 smallest
    # item strings (count desc, item asc), never the sketch's order
    rows = [(f"it{j}", i) for j in range(6) for i in range(10)]
    df = spark.createDataFrame(rows, ["item", "i"])
    got = [
        r["item"]
        for r in topk_estimate(topk_states(df, [], "item"), [], k=3)
        .orderBy("item")
        .collect()
    ]
    assert got == ["it0", "it1", "it2"]


def test_kll_merge_n_exact_and_quantiles_within_rank_error(spark):
    from pipeline_dataengineer_spark.functions.sketches import (
        kll_quantiles,
        kll_states,
        merge_kll,
    )

    n = 3000
    df = spark.createDataFrame(
        [(("a" if i % 2 else "b"), float(i)) for i in range(n)], ["g", "v"]
    )
    shards = [
        df.filter(F.pmod(F.col("v").cast("long"), F.lit(3)) == k)
        for k in range(3)
    ]
    merged = merge_kll(
        *[kll_states(s, ["g"], "v") for s in shards], keys=["g"]
    )
    out = {r["g"]: r for r in kll_quantiles(merged, ["g"], [0.5, 0.9]).collect()}
    for g in ("a", "b"):
        assert out[g]["n"] == n // 2  # KLL tracks n exactly through merges
        # values are 0..2999 split even/odd: true q50 ~ 1500, q90 ~ 2700
        assert abs(out[g]["q_0_5"] - 1500) < n * 0.02
        assert abs(out[g]["q_0_9"] - 2700) < n * 0.02


def test_heavy_hitters_exact_grouped(spark):
    from pipeline_dataengineer_spark.operators.profiling import heavy_hitters

    rows = (
        [("g1", "hot")] * 60 + [("g1", f"c{i}") for i in range(40)]
        + [("g2", "warm")] * 10 + [("g2", "hot2")] * 85
        + [("g2", f"d{i}") for i in range(5)]
    )
    df = spark.createDataFrame(rows, ["grp", "item"])
    got = {
        (r["grp"], r["item"]): (r["cnt"], r["share"])
        for r in heavy_hitters(df, "item", min_share=0.1, by=["grp"]).collect()
    }
    assert got == {
        ("g1", "hot"): (60, 0.6),
        ("g2", "hot2"): (85, 0.85),
        ("g2", "warm"): (10, 0.1),  # boundary: >= min_share stays
    }


def test_bitmap_states_merge_equals_single_pass(spark):
    from pipeline_dataengineer_spark.functions.sketches import (
        bitmap_distinct,
        bitmap_states,
        merge_bitmap,
    )

    df = spark.createDataFrame(
        [(i % 3, (i * 7) % 50) for i in range(300)], "g int, v int"
    )
    # slice into three shards, build states independently, merge
    shards = [df.filter(F.col("v") % 3 == r) for r in range(3)]
    states = [bitmap_states(s, ["g"], "v") for s in shards]
    merged = bitmap_distinct(merge_bitmap(*states, keys=["g"]), ["g"])
    direct = bitmap_distinct(bitmap_states(df, ["g"], "v"), ["g"])
    exact = df.groupBy("g").agg(F.countDistinct("v").alias("n_distinct"))
    m = {r["g"]: r["n_distinct"] for r in merged.collect()}
    d = {r["g"]: r["n_distinct"] for r in direct.collect()}
    e = {r["g"]: r["n_distinct"] for r in exact.collect()}
    assert m == d == e  # lossless merge law


def test_bitmap_states_large_domain_buckets(spark):
    from pipeline_dataengineer_spark.functions.sketches import (
        bitmap_distinct,
        bitmap_states,
    )

    # values straddling multiple 32k-bit buckets still count exactly
    df = spark.createDataFrame(
        [(0, v) for v in (1, 32768, 32769, 1_000_000, 1_000_000)],
        "g int, v long",
    )
    out = bitmap_distinct(bitmap_states(df, ["g"], "v"), ["g"]).collect()
    assert out[0]["n_distinct"] == 4


def test_parse_common_log_fields_and_quarantine(spark):
    from pipeline_dataengineer_spark.operators.web import parse_common_log

    rows = [
        (1, '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] '
            '"GET /apache_pb.gif HTTP/1.0" 200 2326'),
        (2, "not a log line at all"),
    ]
    df = spark.createDataFrame(rows, "id long, line string")
    out = {r["id"]: r["p"] for r in df.select(
        "id", parse_common_log("line").alias("p")).collect()}
    p = out[1]
    assert (p["ip"], p["user"], p["method"], p["path"], p["status"],
            p["bytes"]) == ("127.0.0.1", "frank", "GET",
                            "/apache_pb.gif", "200", "2326")
    assert p["ts_raw"] == "10/Oct/2000:13:55:36 -0700"
    assert out[2]["status"] == ""  # quarantine marker


def test_one_hot_vocab_cap(spark):
    from pipeline_dataengineer_spark.operators.encoding import one_hot

    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1 + [(None,)],
        "cat string",
    )
    out = one_hot(df, "cat", top_n=2)
    cols = [c for c in out.columns if c.startswith("cat__")]
    assert set(cols) == {"cat__a", "cat__b", "cat__other"}
    rows = out.collect()
    for r in rows:
        if r["cat"] == "a":
            assert (r["cat__a"], r["cat__b"], r["cat__other"]) == (1, 0, 0)
        elif r["cat"] == "c":
            assert (r["cat__a"], r["cat__b"], r["cat__other"]) == (0, 0, 1)
        elif r["cat"] is None:
            assert (r["cat__a"], r["cat__b"], r["cat__other"]) == (0, 0, 0)


def test_one_hot_sanitized_name_collision(spark):
    from pipeline_dataengineer_spark.operators.encoding import one_hot

    # 'a b' and 'a_b' both sanitize to 'a_b' — the second indicator
    # must not silently overwrite the first
    df = spark.createDataFrame(
        [("a b",)] * 3 + [("a_b",)] * 2, "cat string"
    )
    out = one_hot(df, "cat", top_n=5)
    ind_cols = sorted(c for c in out.columns if c.startswith("cat__") and c != "cat__other")
    assert len(ind_cols) == 2  # two distinct indicator columns survive
    rows = out.collect()
    for r in rows:
        fired = [c for c in ind_cols if r[c] == 1]
        assert len(fired) == 1  # each row sets exactly one indicator
    # the two categories fire DIFFERENT columns
    fired_ab = {c for r in rows if r["cat"] == "a b" for c in ind_cols if r[c]}
    fired_a_b = {c for r in rows if r["cat"] == "a_b" for c in ind_cols if r[c]}
    assert fired_ab and fired_a_b and fired_ab != fired_a_b
