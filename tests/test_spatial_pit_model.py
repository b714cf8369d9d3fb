"""Tests: grid spatial join, interval-overlap join, SCD2 point-in-time
lookup, and the linear text classifier (train + apply + lexicon)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pipeline_dataengineer_spark.operators.joins import interval_overlap_join
from pipeline_dataengineer_spark.operators.scd import (
    scd2_from_changes,
    scd2_lookup,
)
from pipeline_dataengineer_spark.operators.spatial import (
    distance_semi_filter,
    grid_distance_join,
)
from pipeline_dataengineer_spark.operators.text_model import (
    apply_linear_text_model,
    lexicon_score,
    train_linear_classifier,
)


# ---------------------------------------------------------------- spatial
def _points(spark, rows, prefix):
    return spark.createDataFrame(
        rows, f"{prefix}id long, {prefix}x double, {prefix}y double"
    )


def test_grid_distance_join_matches_bruteforce(spark):
    import random

    rng = random.Random(7)
    lrows = [(i, rng.uniform(0, 10), rng.uniform(0, 10)) for i in range(60)]
    rrows = [(i, rng.uniform(0, 10), rng.uniform(0, 10)) for i in range(60)]
    left = _points(spark, lrows, "l")
    right = _points(spark, rrows, "r")
    radius = 1.3
    got = {
        (r["lid"], r["rid"])
        for r in grid_distance_join(
            left, right, ("lx", "ly"), ("rx", "ry"), radius
        ).collect()
    }
    want = {
        (li, ri)
        for (li, lx, ly) in lrows
        for (ri, rx, ry) in rrows
        if math.hypot(lx - rx, ly - ry) <= radius
    }
    assert got == want and len(want) > 20


def test_grid_distance_join_cell_boundary_pairs(spark):
    # pair straddling a cell boundary must be found via the neighbor
    # explode; pair exactly at distance == radius is included
    left = _points(spark, [(1, 0.99, 0.5)], "l")
    right = _points(spark, [(1, 1.01, 0.5), (2, 1.99, 0.5), (3, 3.0, 0.5)], "r")
    got = {
        r["rid"]
        for r in grid_distance_join(
            left, right, ("lx", "ly"), ("rx", "ry"), 1.0
        ).collect()
    }
    assert got == {1, 2}  # dist 0.02 and 1.0 in; 2.01 out


def test_distance_semi_filter_keeps_schema_and_rows(spark):
    pts = _points(spark, [(1, 0.0, 0.0), (2, 5.0, 5.0), (3, 0.4, 0.0)], "p")
    anchors = _points(spark, [(9, 0.1, 0.0)], "a")
    near = distance_semi_filter(pts, anchors, ("px", "py"), ("ax", "ay"), 1.0)
    far = distance_semi_filter(
        pts, anchors, ("px", "py"), ("ax", "ay"), 1.0, keep_near=False
    )
    assert near.columns == pts.columns
    assert {r["pid"] for r in near.collect()} == {1, 3}
    assert {r["pid"] for r in far.collect()} == {2}


# ------------------------------------------------------- interval overlap
def test_interval_overlap_join_matches_bruteforce_no_dups(spark):
    import random

    rng = random.Random(3)
    lrows = [
        (i, a := rng.uniform(0, 50), a + rng.uniform(0, 8)) for i in range(80)
    ]
    rrows = [
        (i, a := rng.uniform(0, 50), a + rng.uniform(0, 8)) for i in range(80)
    ]
    left = spark.createDataFrame(lrows, "lid long, llo double, lhi double")
    right = spark.createDataFrame(rrows, "rid long, rlo double, rhi double")
    out = interval_overlap_join(
        left, right, ("llo", "lhi"), ("rlo", "rhi"), bucket_width=5.0
    ).collect()
    got = [(r["lid"], r["rid"]) for r in out]
    want = {
        (li, ri)
        for (li, llo, lhi) in lrows
        for (ri, rlo, rhi) in rrows
        if llo <= rhi and rlo <= lhi
    }
    assert set(got) == want
    assert len(got) == len(want)  # duplicate-free without distinct
    assert len(want) > 100


def test_interval_overlap_join_touching_endpoints(spark):
    left = spark.createDataFrame([(1, 0.0, 2.0)], "lid long, llo double, lhi double")
    right = spark.createDataFrame(
        [(1, 2.0, 3.0), (2, 2.1, 3.0)], "rid long, rlo double, rhi double"
    )
    got = {
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left, right, ("llo", "lhi"), ("rlo", "rhi"), 1.0
        ).collect()
    }
    assert got == {(1, 1)}  # closed-interval touch overlaps; 2.1 does not


# ----------------------------------------------------------- PIT lookup
def test_scd2_lookup_point_in_time(spark):
    changes = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 30, "c"), (2, 15, "x")],
        "k long, seq long, attr string",
    )
    dim = scd2_from_changes(changes, "k", "seq", ["attr"])
    facts = spark.createDataFrame(
        [(100, 1, 10), (101, 1, 25), (102, 1, 99), (103, 2, 5), (104, 3, 50)],
        "fid long, k long, ts long",
    )
    out = {
        r["fid"]: r["attr"]
        for r in scd2_lookup(facts, dim, "k", "ts", how="left").collect()
    }
    # ts=10 → version 'a' (inclusive from); 25 → 'b'; 99 → open 'c';
    # fact before first version (103) and unknown key (104) → NULL
    assert out == {100: "a", 101: "b", 102: "c", 103: None, 104: None}
    # row multiplicity preserved: disjoint versions → one match max
    assert scd2_lookup(facts, dim, "k", "ts", how="inner").count() == 3


# ----------------------------------------------------------- text model
def test_lexicon_score_counts_multiplicity_and_zero_docs(spark):
    docs = spark.createDataFrame(
        [(1, "Good good BAD"), (2, "neutral words only"), (3, "")],
        "doc_id long, text string",
    )
    lex = spark.createDataFrame(
        [("good", 1.0), ("bad", -2.0)], "term string, weight double"
    )
    got = {
        r["doc_id"]: r["score"]
        for r in lexicon_score(docs, "doc_id", "text", lex).collect()
    }
    # doc 1: 2*1.0 + (-2.0) = 0.0; docs 2 and 3 have no lexicon hits
    assert got == {1: 0.0, 2: 0.0, 3: 0.0}

    lex2 = spark.createDataFrame(
        [("good", 1.0), ("bad", -0.5)], "term string, weight double"
    )
    got2 = {
        r["doc_id"]: r["score"]
        for r in lexicon_score(docs, "doc_id", "text", lex2).collect()
    }
    assert got2[1] == 1.5


def test_train_then_apply_separates_classes(spark):
    good_words = ["excellent", "great", "wonderful", "superb", "amazing"]
    bad_words = ["terrible", "awful", "horrible", "dreadful", "worst"]
    rows = []
    for i in range(120):
        w = good_words if i % 2 == 0 else bad_words
        text = " ".join(w[(i + j) % 5] for j in range(6)) + " filler common"
        rows.append((i, text, 1 if i % 2 == 0 else 0))
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    weights, bias = train_linear_classifier(
        spark, df, "doc_id", "text", "label", dim=2**12, sample_n=100
    )
    scored = apply_linear_text_model(
        df, "doc_id", "text", weights, bias=bias, dim=2**12
    )
    got = {r["doc_id"]: r["score"] for r in scored.collect()}
    acc = sum(
        1 for i, _, lab in rows if (got[i] >= 0.5) == bool(lab)
    ) / len(rows)
    assert acc >= 0.95
    assert len(got) == 120  # every doc scored exactly once


def test_apply_linear_model_scores_tokenless_docs(spark):
    df = spark.createDataFrame(
        [(1, "hello"), (2, "...")], "doc_id long, text string"
    )
    w = spark.createDataFrame([(0, 0.0)], "feature long, weight double")
    got = {
        r["doc_id"]: r["score"]
        for r in apply_linear_text_model(
            df, "doc_id", "text", w, bias=2.0, dim=16
        ).collect()
    }
    assert abs(got[2] - 1.0 / (1.0 + math.exp(-2.0))) < 1e-9
    assert set(got) == {1, 2}


def test_geohash_reference_vectors(spark):
    from pipeline_dataengineer_spark.operators.spatial import geohash

    df = spark.createDataFrame(
        [
            (57.64911, 10.40744),     # the canonical example
            (0.0, 0.0),
            (-25.382708, -49.265506),
            (90.0, 180.0),            # upper boundary clamps, no overflow
        ],
        "lat double, lng double",
    )
    got = [r["g"] for r in df.select(geohash("lat", "lng", 7).alias("g")).collect()]
    assert got[0] == "u4pruyd"
    assert got[1] == "s000000"
    assert got[2] == "6gkzwgj"
    assert len(got[3]) == 7  # boundary clamped, valid hash
    # prefix property: nearby points share prefixes at lower precision
    near = spark.createDataFrame(
        [(57.64911, 10.40744), (57.649, 10.407)], "lat double, lng double"
    )
    p5 = [r["g"] for r in near.select(geohash("lat", "lng", 5).alias("g")).collect()]
    assert p5[0] == p5[1]


def test_train_classifier_sparse_matches_dense_replay(spark):
    """Round-5 VERDICT item 4: the COO/bincount featurization must
    produce the same weights as the old dense n_docs x dim GD (which
    this test replays inline). Summation order differs (BLAS dot vs
    scatter-add), so parity is asserted to 1e-9 absolute — far below
    anything the model's consumers (score ordering, round(6)) see —
    plus exact support equality."""
    import numpy as np

    from pipeline_dataengineer_spark.operators.text_model import (
        _doc_features,
        train_linear_classifier,
    )

    rows = []
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    for i in range(60):
        text = " ".join(words[(i + j) % 6] for j in range(4))
        rows.append((i, text, i % 2))
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    dim, l2, lr, iters = 2**10, 1e-4, 0.5, 50
    weights, bias = train_linear_classifier(
        spark, df, "doc_id", "text", "label",
        dim=dim, sample_n=60, l2=l2, lr=lr, iters=iters,
    )
    got = {r["feature"]: r["weight"] for r in weights.collect()}

    # dense replay of the pre-round-6 implementation
    sample = df.orderBy("doc_id").limit(60)
    feats = _doc_features(sample, "doc_id", "text", dim).collect()
    labels = {r["doc_id"]: float(r["label"]) for r in rows_df_collect(sample)}
    ids = sorted(labels)
    idx = {d: i for i, d in enumerate(ids)}
    X = np.zeros((len(ids), dim))
    for r in feats:
        X[idx[r["__id"]], r["feature"]] = r["n"]
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    X /= norms
    y = np.array([labels[d] for d in ids])
    w = np.zeros(dim)
    b = 0.0
    for _ in range(iters):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (X.T @ g / len(ids) + l2 * w)
        b -= lr * float(g.mean())
    ref = {int(f): w[f] for f in np.flatnonzero(w)}
    assert set(got) == set(ref)
    for f, v in ref.items():
        assert abs(got[f] - v) < 1e-9
    assert abs(bias - b) < 1e-9


def rows_df_collect(sample):
    return sample.select("doc_id", "label").collect()
