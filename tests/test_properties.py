"""Property-based tests (hypothesis): the engine's column functions
vs direct Python models of the reference's row-level semantics
(``/root/reference/src/kafka_client/transformations.py``).

Strategy: generate batches of adversarial strings, run BOTH the Spark
expression and the Python model, compare row-by-row. One Spark job
per hypothesis example would be minutes-slow, so each example IS a
batch (list of strings → one DataFrame → one collect).
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from pipeline_dataengineer_spark.functions.text import (
    merge_columns,
    normalize_empty_to_null,
    split_commercialisation_dates,
)

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

texts = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=60,
)
maybe_texts = st.one_of(st.none(), texts)


def _py_merge(a, b):
    """Python model of merge_two_columns (transformations.py:6-21)."""
    a = a or None
    b = b or None
    if a is None and b is None:
        return None
    if a is None:
        return b
    if b is None:
        return a
    return a + "\n" + b


def _py_split(text):
    """Python model of separate_commercialisation_dates
    (transformations.py:24-41)."""
    if text is None:
        return (None, None)
    dates = re.findall(r"(\d{2}/\d{2}/\d{4})", text)
    if len(dates) == 2:
        return (dates[0], dates[1])
    if len(dates) == 1:
        low = text.lower()
        if "depuis le" in low:
            return (dates[0], None)
        if "jusqu" in low:
            return (None, dates[0])
    return (None, None)


@given(st.lists(st.tuples(maybe_texts, maybe_texts), min_size=1, max_size=30))
@settings(**_SETTINGS)
def test_merge_matches_python_model(spark, pairs):
    df = spark.createDataFrame(pairs, "a string, b string")
    got = [
        r["m"] for r in df.select(merge_columns("a", "b").alias("m")).collect()
    ]
    want = [_py_merge(a, b) for a, b in pairs]
    assert got == want


@given(st.lists(maybe_texts, min_size=1, max_size=30))
@settings(**_SETTINGS)
def test_split_matches_python_model(spark, rows):
    df = spark.createDataFrame([(t,) for t in rows], "t string")
    s, e = split_commercialisation_dates("t")
    got = [(r["s"], r["e"]) for r in df.select(s.alias("s"), e.alias("e")).collect()]
    want = [_py_split(t) for t in rows]
    assert got == want


@given(
    st.lists(
        st.one_of(st.none(), st.just(""), texts),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_empty_to_null_matches_python_model(spark, rows):
    df = spark.createDataFrame([(t,) for t in rows], "t string")
    got = [
        r["v"] for r in df.select(normalize_empty_to_null("t").alias("v")).collect()
    ]
    want = [(t or None) for t in rows]
    assert got == want


# Dates with realistic shapes to exercise the 1/2-match branches more.
date_str = st.dates().map(lambda d: d.strftime("%d/%m/%Y"))
date_texts = st.one_of(
    st.tuples(date_str, date_str).map(lambda t: f"Du {t[0]} au {t[1]}"),
    date_str.map(lambda d: f"Depuis le {d}"),
    date_str.map(lambda d: f"Jusqu'au {d}"),
    date_str.map(lambda d: f"vendu {d} partout"),
    texts,
)


@given(st.lists(date_texts, min_size=1, max_size=30))
@settings(**_SETTINGS)
def test_split_realistic_shapes(spark, rows):
    df = spark.createDataFrame([(t,) for t in rows], "t string")
    s, e = split_commercialisation_dates("t")
    got = [(r["s"], r["e"]) for r in df.select(s.alias("s"), e.alias("e")).collect()]
    want = [_py_split(t) for t in rows]
    assert got == want


def _py_lev(x: str, y: str) -> int:
    dp = list(range(len(y) + 1))
    for i, cx in enumerate(x, 1):
        prev, dp[0] = dp[0], i
        for j, cy in enumerate(y, 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (cx != cy))
            prev = cur
    return dp[-1]


short_words = st.lists(
    st.text(alphabet="abcde", min_size=0, max_size=6),
    min_size=1,
    max_size=8,
    unique=True,
)


@given(left=short_words, right=short_words, k=st.integers(1, 2))
@settings(**_SETTINGS)
def test_fuzzy_join_complete_vs_bruteforce(spark, left, right, k):
    """FastSS deletion-neighborhood blocking must be COMPLETE: the
    distributed fuzzy join returns exactly the brute-force pair set
    for any inputs (adversarial short strings over a tiny alphabet
    maximize near-collisions)."""
    from pipeline_dataengineer_spark.operators.joins import fuzzy_join

    a = spark.createDataFrame(list(enumerate(left)), "id: long, name: string")
    b = spark.createDataFrame(
        [(i + 1000, s) for i, s in enumerate(right)], "id: long, name: string"
    )
    expect = {
        (i, j + 1000)
        for i, x in enumerate(left)
        for j, y in enumerate(right)
        if _py_lev(x, y) <= k
    }
    got = {
        (r["id"], r["id_r"])
        for r in fuzzy_join(
            a, b, "name", "name", max_distance=k, left_id="id", right_id="id"
        ).collect()
    }
    assert got == expect


def test_random_projection_preserves_distances(spark):
    """JL law: pairwise distances in the projected space stay within
    the expected distortion band (loose 3-sigma bound at k=32)."""
    import numpy as np
    from pyspark.sql import functions as F

    from pipeline_dataengineer_spark.functions.vectors import (
        projection_signs_sql,
        random_projection,
    )

    rng = np.random.default_rng(12)
    vecs = rng.normal(size=(40, 64))
    df = spark.createDataFrame(
        [(i, [float(v) for v in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    out = (
        df.select(
            "vec_id",
            random_projection("embedding", 64, 32, seed=3).alias("p"),
        )
        .orderBy("vec_id")
        .collect()
    )
    p = np.stack([np.array(r["p"]) for r in out])
    # parity with the exported sign matrix
    signs = np.array(projection_signs_sql(64, 32, seed=3))
    want = vecs @ signs.T / np.sqrt(32)
    assert np.allclose(p, want, atol=1e-9)
    # distance preservation on a sample of pairs
    ratios = []
    for a in range(0, 40, 5):
        for b in range(a + 1, 40, 7):
            d0 = np.linalg.norm(vecs[a] - vecs[b])
            d1 = np.linalg.norm(p[a] - p[b])
            ratios.append(d1 / d0)
    r = np.array(ratios)
    assert 0.5 < r.min() and r.max() < 1.6


# ------------------------------------------------------------------
# distributed-Kendall inversion kernel (pure numpy function)
# ------------------------------------------------------------------


@given(st.lists(st.integers(min_value=0, max_value=40), max_size=200))
@settings(**_SETTINGS)
def test_count_strict_inversions_matches_definition(vals):
    import numpy as np

    from pipeline_dataengineer_spark.operators.stats_tests import (
        _count_strict_inversions,
    )

    r = np.asarray(vals, dtype=np.int64)
    got = _count_strict_inversions(r)
    want = sum(
        1
        for i in range(len(vals))
        for j in range(i + 1, len(vals))
        if vals[i] > vals[j]
    )
    assert got == want
