"""Unit tests for the end-to-end corpus cleaning operator."""

from __future__ import annotations

from pipeline_dataengineer_spark.operators.corpus import clean_corpus


def test_clean_corpus_filters_and_dedups(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the quick brown fox jumps over the lazy dog", "en"),  # dup of 1
        (3, "short", "en"),  # under min_tokens
        (4, "ein ganz normaler deutscher satz mit genug worten", "de"),
        (5, "texto perfectamente razonable con bastantes palabras", "es"),  # lang out
        (6, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))", "en"),  # punct-only → low quality
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = clean_corpus(df, langs=["en", "de"], min_quality=0.3, min_tokens=3).select(
        "doc_id"
    )
    assert {r.doc_id for r in out.collect()} == {1, 4}  # min-id dup survives


def test_clean_corpus_attaches_features(spark):
    df = spark.createDataFrame(
        [(1, "one two three four five six", "en")],
        "doc_id long, text string, lang string",
    )
    row = clean_corpus(df).collect()[0]
    assert row.n_tokens == 6
    assert 0.0 <= row.quality <= 1.0


def test_cap_per_key_deterministic(spark):
    from pipeline_dataengineer_spark.operators.corpus import cap_per_key

    df = spark.createDataFrame(
        [(f"d{i}", i, "big" if i < 20 else "small") for i in range(25)],
        ["doc", "rank_key", "src"],
    )
    out = cap_per_key(df, ["src"], 3, "rank_key")
    got = {(r["src"], r["rank_key"]) for r in out.collect()}
    assert got == {("big", 0), ("big", 1), ("big", 2),
                   ("small", 20), ("small", 21), ("small", 22)}
    # descending keeps the other tail
    out_d = cap_per_key(df, ["src"], 2, "rank_key", descending=True)
    got_d = {(r["src"], r["rank_key"]) for r in out_d.collect()}
    assert got_d == {("big", 19), ("big", 18), ("small", 24), ("small", 23)}


def test_remove_boilerplate_segments_strikes_and_reassembles(spark):
    from pipeline_dataengineer_spark.operators.corpus import (
        remove_boilerplate_segments,
    )

    footer = "subscribe now terms apply"
    rows = [
        (1, f"alpha beta gamma delta {footer}"),
        (2, f"epsilon zeta eta theta {footer}"),
        (3, f"iota kappa lam mu {footer}"),
        (4, "unique words only here nothing shared at all ok"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_segments(
            df, words_per_segment=4, max_doc_frac=0.5
        ).collect()
    }
    # the 4-word footer segment appears in 3/4 docs (>50%) -> struck
    # everywhere; leading segments survive in order.
    assert out[1]["clean_text"] == "alpha beta gamma delta"
    assert out[1]["n_removed"] == 1
    assert out[4]["n_removed"] == 0


def test_chunk_documents_windows_and_overlap(spark):
    from pipeline_dataengineer_spark.operators.corpus import chunk_documents

    words = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(1, words), (2, "tiny doc")], ["doc_id", "text"])
    chunks = {
        (r["doc_id"], r["chunk_idx"]): r
        for r in chunk_documents(df, chunk_tokens=64, overlap=16).collect()
    }
    # 100 tokens, step 48: chunks at 0 and 48 -> ceil((100-16)/48) = 2
    assert {k for k in chunks if k[0] == 1} == {(1, 0), (1, 1)}
    c0, c1 = chunks[(1, 0)], chunks[(1, 1)]
    assert c0["chunk_text"].split()[:2] == ["w0", "w1"]
    assert c0["chunk_n_tokens"] == 64
    # overlap: chunk 1 starts at token 48, i.e. 16 tokens before c0's end
    assert c1["chunk_text"].split()[0] == "w48"
    assert c1["chunk_n_tokens"] == 52  # 100 - 48
    # short docs still yield one chunk
    assert chunks[(2, 0)]["chunk_text"] == "tiny doc"
    assert chunks[(2, 0)]["chunk_n_tokens"] == 2


def test_mixture_sample_deterministic_and_drops_unlisted(spark):
    from pipeline_dataengineer_spark.operators.corpus import mixture_sample

    import pytest

    df = spark.createDataFrame(
        [(i, ["web", "code", "junk"][i % 3]) for i in range(3000)],
        ["k", "src"],
    )
    out = mixture_sample(df, "k", "src", {"web": 0.5, "code": 1.0})
    got = out.groupBy("src").count().collect()
    counts = {r["src"]: r["count"] for r in got}
    assert "junk" not in counts  # unlisted strata dropped
    assert counts["code"] == 1000  # weight 1.0 keeps everything
    assert 350 < counts["web"] < 650  # ~0.5 of 1000
    # deterministic: same membership on re-run
    again = mixture_sample(df, "k", "src", {"web": 0.5, "code": 1.0})
    assert out.exceptAll(again).count() == 0
    with pytest.raises(ValueError, match="weight"):
        mixture_sample(df, "k", "src", {"web": 1.5})


def test_minhash_precomputed_signatures_are_authoritative(spark):
    """precomputed_signatures short-circuits the UDF for stored ids:
    matching store → identical pairs; a deliberately corrupted store
    row CHANGES the result (proof the store is actually read, not
    silently recomputed)."""
    from pyspark.sql import functions as F

    from pipeline_dataengineer_spark.operators.dedup import (
        minhash_lsh_near_duplicates,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(i, f"the quick brown fox document number shared prefix {i % 3}")
         for i in range(12)],
        ["doc_id", "text"],
    )
    base = minhash_lsh_near_duplicates(docs, "doc_id", "text", jaccard_threshold=0.9)
    expect = {(r["id_a"], r["id_b"]) for r in base.collect()}
    base.unpersist()
    assert expect  # the %3 groups are exact dup families

    sigs = minhash_signatures(docs, "doc_id", "text")
    via_store = minhash_lsh_near_duplicates(
        docs, "doc_id", "text", jaccard_threshold=0.9,
        precomputed_signatures=sigs,
    )
    got = {(r["id_a"], r["id_b"]) for r in via_store.collect()}
    via_store.unpersist()
    assert got == expect

    # corrupt doc 0's stored shingles -> its pairs must disappear
    mangled = sigs.withColumn(
        "__sh",
        F.when(F.col("__id") == 0, F.array(F.lit(999999))).otherwise(F.col("__sh")),
    )
    broken = minhash_lsh_near_duplicates(
        docs, "doc_id", "text", jaccard_threshold=0.9,
        precomputed_signatures=mangled,
    )
    got_b = {(r["id_a"], r["id_b"]) for r in broken.collect()}
    broken.unpersist()
    assert all(0 not in p for p in got_b) and got_b != expect


def test_incremental_append_signature_store(spark, tmp_path):
    """signature_store makes the ingest loop O(batch): bootstrap seeds
    the store, later calls append only the delta's signatures, results
    match the storeless path, and store ids absent from the corpus are
    ignored."""
    import pyarrow.parquet as pq

    from pipeline_dataengineer_spark.pipelines.pretraining_corpus import (
        incremental_corpus_append,
    )

    store = str(tmp_path / "sigs")
    corpus = spark.createDataFrame(
        [(i, f"existing corpus document with distinct content piece {i}")
         for i in range(30)],
        ["doc_id", "text"],
    )
    batch1 = spark.createDataFrame(
        [(100, "a genuinely new document about topic alpha beta gamma"),
         (101, "existing corpus document with distinct content piece 5"),  # near-dup of 5
         (102, "another new unique document mentioning deltas and offsets")],
        ["doc_id", "text"],
    )
    d_plain = incremental_corpus_append(corpus, batch1, min_quality=0.0)
    plain_ids = sorted(r["doc_id"] for r in d_plain.collect())
    d_plain.unpersist()

    d1 = incremental_corpus_append(
        corpus, batch1, min_quality=0.0, signature_store=store
    )
    ids1 = sorted(r["doc_id"] for r in d1.collect())
    d1.unpersist()
    assert ids1 == plain_ids and 101 not in ids1
    n_store = spark.read.parquet(store).count()
    assert n_store == 30 + len(ids1)  # bootstrap = corpus + delta

    # next batch: store path used; only delta-2 signatures appended
    corpus2 = corpus.unionByName(
        spark.createDataFrame(
            [(i, t) for i, t in [(100, "a genuinely new document about topic alpha beta gamma"),
                                 (102, "another new unique document mentioning deltas and offsets")]],
            ["doc_id", "text"])
    )
    batch2 = spark.createDataFrame(
        [(200, "fresh second-wave document with novel words entirely"),
         (201, "a genuinely new document about topic alpha beta gamma")],  # dup of 100
        ["doc_id", "text"],
    )
    d2 = incremental_corpus_append(
        corpus2, batch2, min_quality=0.0, signature_store=store
    )
    ids2 = sorted(r["doc_id"] for r in d2.collect())
    d2.unpersist()
    assert ids2 == [200]
    assert spark.read.parquet(store).count() == n_store + 1


def test_split_sentences_segmentation(spark):
    from pipeline_dataengineer_spark.operators.corpus import split_sentences

    df = spark.createDataFrame(
        [
            (1, "One. Two sentences!  Three... trailing fragment"),
            (2, ""),
            (3, "no terminator at all"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["sent_idx"]): r["sentence"]
        for r in split_sentences(df).collect()
    }
    assert got == {
        (1, 0): "One.",
        (1, 1): "Two sentences!",
        (1, 2): "Three...",
        (1, 3): "trailing fragment",
        (3, 0): "no terminator at all",
    }


def test_sentence_chunks_budget_rule(spark):
    from pipeline_dataengineer_spark.operators.corpus import sentence_chunks

    # lengths+1: 4, 4, 4 -> cum_before = 0, 4, 8; budget 8 ->
    # chunks floor(0/8)=0, floor(4/8)=0, floor(8/8)=1
    df = spark.createDataFrame([(1, "aaa. bbb. ccc.")], "doc_id long, text string")
    out = {
        r["chunk_id"]: (r["chunk_text"], r["n_sentences"])
        for r in sentence_chunks(df, max_chars=8).collect()
    }
    assert out == {0: ("aaa. bbb.", 2), 1: ("ccc.", 1)}
    # sentences never split even when one alone exceeds the budget
    big = spark.createDataFrame(
        [(2, "supercalifragilistic sentence beyond budget. tiny.")],
        "doc_id long, text string",
    )
    chunks = sentence_chunks(big, max_chars=10).collect()
    assert all("." in r["chunk_text"] for r in chunks)


def test_dedupe_repeated_segments_collapses_loops(spark):
    from pipeline_dataengineer_spark.operators.corpus import (
        dedupe_repeated_segments,
    )

    loop = "alpha beta gamma delta epsilon "  # exactly one 5-word segment
    df = spark.createDataFrame(
        [
            (1, (loop * 4).strip()),            # 4x repetition -> 1 kept
            (2, "unique words only here now"),  # nothing removed
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_removed"])
        for r in dedupe_repeated_segments(df, words_per_segment=5).collect()
    }
    assert out[1] == (loop.strip(), 1, 3)
    assert out[2] == ("unique words only here now", 1, 0)


def test_dedupe_repeated_segments_keeps_first_order(spark):
    from pipeline_dataengineer_spark.operators.corpus import (
        dedupe_repeated_segments,
    )

    # segments (w=2): "a b", "c d", "a b", "e f" -> keep a b, c d, e f
    df = spark.createDataFrame(
        [(1, "a b c d a b e f")], "doc_id long, text string"
    )
    out = dedupe_repeated_segments(df, words_per_segment=2).collect()[0]
    assert out["clean_text"] == "a b c d e f"
    assert out["n_kept"] == 3 and out["n_removed"] == 1


def test_fim_transform_reconstruction_and_determinism(spark):
    """The three pieces must reassemble the original text exactly,
    split points are layout-independent, untransformed docs pass
    through, and the PSM/SPM strings carry the pieces in the paper's
    order."""
    from pipeline_dataengineer_spark.operators.corpus import fim_transform

    rows = [(i, f"doc {i} " + "abcdefghij" * (1 + i % 7)) for i in range(60)]
    rows.append((60, ""))      # empty: never transforms
    rows.append((61, None))    # NULL: never transforms
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = fim_transform(df, fim_rate=0.6).collect()
    by_id = {r["doc_id"]: r for r in out}
    applied = [r for r in out if r["fim_applied"]]
    assert 10 < len(applied) < 55  # rate ~0.6, scramble-gated
    for r in applied:
        text = r["text"]
        lo, hi = r["split_lo"], r["split_hi"]
        assert 0 <= lo <= hi <= len(text)
        pre, mid, suf = text[:lo], text[lo:hi], text[hi:]
        assert r["fim_text"] == f"<PRE>{pre}<SUF>{suf}<MID>{mid}"
    assert by_id[60]["fim_applied"] is False
    assert by_id[61]["fim_applied"] is False
    assert by_id[61]["fim_text"] is None
    for r in out:
        if not r["fim_applied"]:
            assert r["fim_text"] == r["text"]
            assert r["split_lo"] is None
    # layout independence
    out2 = {
        r["doc_id"]: (r["fim_applied"], r["split_lo"], r["split_hi"])
        for r in fim_transform(df.repartition(9), fim_rate=0.6).collect()
    }
    assert out2 == {
        r["doc_id"]: (r["fim_applied"], r["split_lo"], r["split_hi"])
        for r in out
    }
    # SPM mode ordering
    spm = {
        r["doc_id"]: r
        for r in fim_transform(df, fim_rate=0.6, spm=True).collect()
    }
    for r in applied:
        s = spm[r["doc_id"]]
        text = r["text"]
        lo, hi = r["split_lo"], r["split_hi"]
        assert s["fim_text"] == (
            f"<PRE><SUF>{text[hi:]}<MID>{text[:lo]}{text[lo:hi]}"
        )


def test_span_corruption_reconstruction(spark):
    """Removing the sentinels and splicing the target spans back at
    their recorded starts must reproduce the original text exactly;
    short docs pass through; determinism across layouts."""
    from pipeline_dataengineer_spark.operators.corpus import span_corruption

    rows = [(i, f"row {i}: " + "the quick brown fox " * (2 + i % 5))
            for i in range(40)]
    rows.append((40, "ab"))   # shorter than n_spans -> passthrough
    rows.append((41, None))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in span_corruption(df, n_spans=3).collect()}
    for i in range(40):
        r = out[i]
        text = r["text"]
        sl = r["span_len"]
        starts = r["span_starts"]
        assert len(starts) == 3
        # spans are in order and non-overlapping
        for a, b in zip(starts, starts[1:]):
            assert a + sl <= b
        # reconstruct
        rebuilt = ""
        prev = 0
        spans = []
        for s in starts:
            rebuilt += text[prev:s]
            spans.append(text[s:s + sl])
            prev = s + sl
        rebuilt_corr = ""
        prev = 0
        for j, s in enumerate(starts):
            rebuilt_corr += text[prev:s] + f"<extra_id_{j}>"
            prev = s + sl
        rebuilt_corr += text[prev:]
        assert r["corrupted"] == rebuilt_corr
        assert r["targets"] == "".join(
            f"<extra_id_{j}>{sp}" for j, sp in enumerate(spans)
        )
    assert out[40]["corrupted"] == "ab" and out[40]["targets"] == ""
    assert out[41]["corrupted"] is None
    again = {
        r["doc_id"]: (r["corrupted"], r["targets"])
        for r in span_corruption(df.repartition(7), n_spans=3).collect()
    }
    assert again == {
        k: (v["corrupted"], v["targets"]) for k, v in out.items()
    }


def test_mixture_epochs_expectation_and_determinism(spark):
    from pyspark.sql import functions as F

    from pipeline_dataengineer_spark.operators.corpus import mixture_epochs

    rows = [(i, ["hq", "mid", "low", "skip"][i % 4]) for i in range(4000)]
    df = spark.createDataFrame(rows, "k long, s string")
    out = mixture_epochs(
        df, "k", "s", {"hq": 2.5, "mid": 1.0, "low": 0.3}
    )
    per = {
        r["s"]: r["n"]
        for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()
    }
    assert "skip" not in per  # unweighted stratum dropped
    assert per["mid"] == 1000  # exactly 1 epoch
    assert 2300 < per["hq"] < 2700  # ~2.5x of 1000
    assert 200 < per["low"] < 400  # ~0.3x
    # epoch indexes are 1..n_copies per key
    hq = out.filter(F.col("s") == "hq")
    mx = hq.groupBy("k").agg(
        F.max("epoch").alias("m"), F.count("*").alias("c")
    )
    assert mx.filter(F.col("m") != F.col("c")).count() == 0
    assert set(
        r["m"] for r in mx.select("m").distinct().collect()
    ) == {2, 3}
    # deterministic across layouts
    a = sorted((r["k"], r["epoch"]) for r in out.collect())
    b = sorted(
        (r["k"], r["epoch"])
        for r in mixture_epochs(
            df.repartition(11), "k", "s",
            {"hq": 2.5, "mid": 1.0, "low": 0.3},
        ).collect()
    )
    assert a == b


def test_prefix_lm_split_reassembles(spark):
    from pipeline_dataengineer_spark.operators.corpus import prefix_lm_split

    rows = [(i, "x" * 0 + f"document {i} " + "word " * (i % 9)) for i in range(50)]
    rows += [(50, "ab"), (51, "a"), (52, ""), (53, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in prefix_lm_split(df).collect()}
    for i in range(50):
        r = out[i]
        text = r["text"]
        pos = r["split_pos"]
        assert 1 <= pos <= len(text) - 1
        # band: within [0.25, 0.75] of length (clamped to [1, n-1])
        assert pos >= max(int(len(text) * 0.25) - 1, 1)
        assert pos <= min(-(-len(text) * 3 // 4) + 1, len(text) - 1)
        assert r["context"] + r["continuation"] == text
        assert len(r["context"]) == pos
    assert out[50]["split_pos"] == 1  # n=2: only split point
    assert out[51]["split_pos"] is None  # n=1: no valid split
    assert out[52]["split_pos"] is None
    assert out[53]["context"] is None
    # layout independence
    again = {
        r["doc_id"]: r["split_pos"]
        for r in prefix_lm_split(df.repartition(7)).collect()
    }
    assert again == {k: v["split_pos"] for k, v in out.items()}
