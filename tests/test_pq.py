"""Product quantization: lossless exactness, recall floor, code size."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from pipeline_dataengineer_spark.operators.pq import pq_encode, pq_topk, pq_train

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _exact_topk(rows, qvecs, k):
    ids = np.array([r[0] for r in rows])
    mat = np.array([list(r[1]) for r in rows], dtype=np.float64)
    out = {}
    for qid, qv in qvecs:
        d2 = ((mat - np.asarray(qv, dtype=np.float64)) ** 2).sum(axis=1)
        order = np.lexsort((ids, d2))
        out[qid] = set(ids[order[:k]].tolist())
    return out


def test_pq_codes_are_m_bytes(spark):
    e = _emb(spark)
    books = pq_train(e, m=8, codebook_size=16, sample_size=64)
    enc = pq_encode(e, books)
    lens = enc.select(F.length("pq_code").alias("n")).distinct().collect()
    assert [r["n"] for r in lens] == [8]  # 64 float32 dims -> 8 bytes


def test_pq_lossless_matches_exact(spark):
    # codebook big enough for every distinct subvector -> ADC == L2²
    e = _emb(spark).filter(F.col("vec_id") < 200)
    books = pq_train(e, m=8, codebook_size=256, sample_size=200)
    enc = pq_encode(e, books)
    q = e.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = pq_topk(enc, books, q, k=5)
    rows = [(r["vec_id"], r["embedding"]) for r in e.collect()]
    qvecs = [(r["query_id"], r["embedding"]) for r in q.collect()]
    want = _exact_topk(rows, qvecs, 5)
    for qid, ids in want.items():
        got_ids = {
            r["vec_id"] for r in got.collect() if r["query_id"] == qid
        }
        assert got_ids == ids


def test_pq_lossy_recall_floor(spark):
    e = _emb(spark)
    books = pq_train(e, m=8, codebook_size=16, sample_size=4096)
    enc = pq_encode(e, books)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = pq_topk(enc, books, q, k=10).collect()
    rows = [(r["vec_id"], r["embedding"]) for r in e.collect()]
    qvecs = [(r["query_id"], r["embedding"]) for r in q.collect()]
    want = _exact_topk(rows, qvecs, 10)
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(by_q[qid] & ids) / 10 for qid, ids in want.items()]
    # random embeddings are PQ's worst case; still must beat chance by far
    assert sum(recalls) / len(recalls) >= 0.3


def test_pq_deterministic_across_runs(spark):
    e = _emb(spark)
    b1 = pq_train(e, m=4, codebook_size=8, sample_size=32)
    b2 = pq_train(e, m=4, codebook_size=8, sample_size=32)
    assert np.array_equal(b1, b2)


def test_mips_transform_orders_by_inner_product(spark):
    """Cosine top-k over the augmented space == exact inner-product
    top-k, even when norms disagree with angles (the case plain
    cosine gets wrong)."""
    import numpy as np

    from pipeline_dataengineer_spark.operators.similarity import (
        cosine_topk_bruteforce,
        mips_transform,
        pad_query,
    )

    rng = np.random.default_rng(6)
    corpus = [(i, [float(v) for v in rng.normal(size=4) * rng.uniform(0.2, 5)]) for i in range(50)]
    queries = [(100, [float(v) for v in rng.normal(size=4)])]
    cdf = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")
    qdf = spark.createDataFrame(queries, "query_id long, embedding array<double>")
    aug_c = mips_transform(cdf)
    aug_q = pad_query(qdf)
    got = [
        r["vec_id"]
        for r in cosine_topk_bruteforce(aug_c, aug_q, k=5)
        .orderBy("rank")
        .collect()
    ]
    q = np.array(queries[0][1])
    ips = sorted(
        ((np.dot(np.array(v), q), i) for i, v in corpus), reverse=True
    )
    want = [i for _, i in ips[:5]]
    assert got == want
    # augmented corpus vectors share one norm (= max original norm)
    norms = {
        round(float(np.linalg.norm(r["embedding"])), 9)
        for r in aug_c.collect()
    }
    assert len(norms) == 1


def test_int8_quantize_roundtrip_error_bound(spark):
    from pipeline_dataengineer_spark.operators.pq import (
        int8_dequantize,
        int8_quantize,
    )

    import numpy as np

    rng = np.random.default_rng(7)
    rows = [(i, rng.uniform(-2, 2, 16).astype("float32").tolist())
            for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    enc = int8_quantize(df)
    dec = int8_dequantize(enc).select("vec_id", "dequantized").collect()
    orig = {r["vec_id"]: r["embedding"] for r in df.collect()}
    # error per dim bounded by one quantization step of its range
    step = 4.0 / 255
    for r in dec:
        for a, b in zip(orig[r["vec_id"]], r["dequantized"]):
            assert abs(a - b) <= step
    codes = {r["vec_id"]: r["codes"] for r in enc.collect()}
    flat = [c for v in codes.values() for c in v]
    assert min(flat) >= -128 and max(flat) <= 127
    assert min(flat) == -128 and max(flat) == 127  # extremes hit


def test_int8_quantize_constant_dim(spark):
    from pipeline_dataengineer_spark.operators.pq import (
        int8_dequantize,
        int8_quantize,
    )

    df = spark.createDataFrame(
        [(1, [5.0, 1.0]), (2, [5.0, 3.0])],
        "vec_id long, embedding array<float>",
    )
    enc = int8_quantize(df)
    out = {r["vec_id"]: r["codes"] for r in enc.collect()}
    assert out[1][0] == 0 and out[2][0] == 0  # constant dim -> 0
    dec = {
        r["vec_id"]: r["dequantized"]
        for r in int8_dequantize(enc).collect()
    }
    assert dec[1][0] == 5.0  # constant dim reconstructs exactly


def test_ivfpq_lossless_equals_bruteforce(spark):
    from pipeline_dataengineer_spark.operators.pq import ivfpq_build, ivfpq_search

    e = _emb(spark).filter(F.col("vec_id") < 200)
    cents, enc, books = ivfpq_build(
        e, num_centroids=4, m=8, codebook_size=256, sample_size=200
    )
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ivfpq_search(cents, enc, books, q, k=5, nprobe=4).collect()
    rows = [(r["vec_id"], r["embedding"]) for r in e.collect()]
    qvecs = [(r["query_id"], r["embedding"]) for r in q.collect()]
    want = _exact_topk(rows, qvecs, 5)
    for qid, ids in want.items():
        got_ids = {r["vec_id"] for r in got if r["query_id"] == qid}
        assert got_ids == ids


def test_ivfpq_lossy_recall_floor(spark):
    from pipeline_dataengineer_spark.operators.pq import ivfpq_build, ivfpq_search

    e = _emb(spark)
    cents, enc, books = ivfpq_build(
        e, num_centroids=8, m=8, codebook_size=16, sample_size=4096,
        refine_iterations=4,
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # probe every cell: isolates PQ loss from IVF loss; then a
    # partial probe must still beat chance decisively
    got_all = ivfpq_search(cents, enc, books, q, k=10, nprobe=8).collect()
    rows = [(r["vec_id"], r["embedding"]) for r in e.collect()]
    qvecs = [(r["query_id"], r["embedding"]) for r in q.collect()]
    want = _exact_topk(rows, qvecs, 10)

    def mean_recall(got):
        by_q = {}
        for r in got:
            by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
        return sum(len(by_q.get(qid, set()) & ids) / 10 for qid, ids in want.items()) / len(want)

    assert mean_recall(got_all) >= 0.3  # PQ-only loss (random-vector worst case)
    got_partial = ivfpq_search(cents, enc, books, q, k=10, nprobe=4).collect()
    assert mean_recall(got_partial) >= 0.15  # + IVF loss at half the cells


def test_ivfpq_code_table_is_compact(spark):
    from pipeline_dataengineer_spark.operators.pq import ivfpq_build

    e = _emb(spark).filter(F.col("vec_id") < 100)
    _, enc, _ = ivfpq_build(e, num_centroids=4, m=8, codebook_size=16, sample_size=100)
    assert set(enc.columns) == {"vec_id", "centroid_id", "pq_code"}
    r = enc.first()
    assert len(r["pq_code"]) == 8  # m bytes per vector, nothing else
