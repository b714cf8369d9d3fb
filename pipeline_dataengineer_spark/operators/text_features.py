"""Corpus-level text featurization: TF-IDF, document frequency.

The per-document stats in ``functions/textstats.py`` are narrow maps;
TF-IDF is the first *corpus-relative* feature — a term's weight
depends on how many documents contain it. Shape: one explode, one
(id, term) aggregate, a partial-aggregable document-frequency
aggregate joined back on ``term``, and one broadcast of the (tiny)
corpus size.
North-star text-analysis extension (no analog in the reference).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def terms(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term) rows: lowercase, split on single spaces, drop
    empties. Deliberately the simplest portable tokenizer — identical
    semantics in any engine's string_split (oracle parity)."""
    from pipeline_dataengineer_spark.catalog import scale_out

    return scale_out(df.select(id_col, text_col)).select(
        id_col,
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
    ).filter(F.col("term") != "")


def tf_idf(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", round_to: int = 4
) -> DataFrame:
    """(id, term, tf, df, tfidf) with tfidf = tf * ln(N / df).

    N arrives via a 1-row cross join (broadcast NL join of a scalar —
    never a driver collect), so the whole computation stays lazy and
    distributed.
    """
    t = terms(df, id_col, text_col)
    tf = t.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    # Document frequency as a groupBy aggregate joined back on term —
    # NOT a window count. A window over `term` has no partial
    # aggregation: every (id, term) row for a stopword lands in one
    # task's buffer, the classic skew killer on exactly the hottest
    # keys. The groupBy is map-side combinable (only partial counts
    # shuffle), and the join back on term is AQE-skew-splittable,
    # which a window exchange never is.
    docfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    tf = tf.join(docfreq, "term")
    n_docs = df.select(
        F.count_distinct(F.col(id_col)).cast("double").alias("_n")
    )
    return (
        tf.crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            "df",
            F.round(F.col("tf") * F.log(F.col("_n") / F.col("df")), round_to).alias(
                "tfidf"
            ),
        )
    )


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_posting_size: int | None = None,
) -> DataFrame:
    """Posting lists: (term, doc_freq, postings) with postings the
    sorted distinct doc ids containing the term — the retrieval-side
    complement of tf_idf.

    One shuffle on term with partial aggregation (collect_set combines
    map-side). Posting lists for stopword-grade terms are the classic
    giant-row risk at 100 TB: a web corpus puts every doc id for "the"
    into ONE collect_set buffer. ``max_posting_size`` is the enforced
    defense (same two-phase shape as the LSH bucket cap): a cheap
    partial-aggregable distinct-count pass finds over-the-cap terms,
    and a broadcast anti-join strips their rows BEFORE the collect_set
    ever builds the list. Dropped terms are REPORTED, never silent:
    the returned DataFrame carries ``.index_audit =
    {"dropped_terms", "max_dropped_doc_freq"}`` and a warning is
    logged. A term that frequent is a stopword, not a retrieval
    signal — classic IR systems stoplist it for the same reason."""
    t = terms(df, id_col, text_col)
    audit = {"dropped_terms": 0, "max_dropped_doc_freq": 0}
    if max_posting_size is not None:
        # Not cached: the audit collect below and the anti-join each
        # run this count pass once — it is map-side-combinable and
        # cheap, and a persist here would either leak (the returned
        # plan is lazy) or be released before the anti-join runs.
        hot = (
            t.groupBy("term")
            .agg(F.count_distinct(F.col(id_col)).alias("__df"))
            .filter(F.col("__df") > max_posting_size)
        )
        stats = hot.agg(
            F.count("*").alias("n"),
            F.coalesce(F.max("__df"), F.lit(0)).alias("m"),
        ).collect()[0]
        audit = {
            "dropped_terms": int(stats["n"]),
            "max_dropped_doc_freq": int(stats["m"]),
        }
        if audit["dropped_terms"]:
            import logging

            logging.getLogger(__name__).warning(
                "inverted_index: dropped %d terms with doc_freq > %d "
                "(largest %d) — stopword-grade posting lists exceed the "
                "cap and are excluded from the index.",
                audit["dropped_terms"],
                max_posting_size,
                audit["max_dropped_doc_freq"],
            )
            t = t.join(F.broadcast(hot.select("term")), "term", "left_anti")
    out = t.groupBy("term").agg(
        F.count_distinct(F.col(id_col)).alias("doc_freq"),
        F.sort_array(F.collect_set(F.col(id_col))).alias("postings"),
    )
    out.index_audit = audit
    return out


def bm25_rank(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
) -> DataFrame:
    """Okapi BM25 retrieval scoring: (id, n_hits, score) for every
    document matching at least one query term, with

        score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
        idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)      (Lucene form)

    The ranking function behind classic search (and the lexical side
    of hybrid retrieval for RAG corpora) — the scoring complement of
    ``inverted_index``.

    Scale shape (round 10): the query vocabulary is a LITERAL list,
    so each query term's frequency is a conditional count inside the
    SAME per-document aggregate that computes document length — one
    explode, ONE corpus exchange carrying (id, dl, tf_0..tf_k) — no
    separate (id, term) aggregate, no per-term dfreq join, no doclen
    equi-join (guide §2.3/§2.4: the old shape's three corpus-keyed
    exchanges collapse to one narrow map-side-combined one). A second
    fold turns the per-doc rows into ONE combinable stats aggregate
    (N, avgdl, df per term) that broadcasts back as a single row, and
    scoring is a fused projection — everything downstream of the
    per-doc aggregate is doc-count-sized.
    """
    if not query_terms:
        raise ValueError("bm25_rank: query_terms must be non-empty")
    q_terms = sorted({t.lower() for t in query_terms})
    t = terms(df, id_col, text_col)
    # Per-document length AND per-query-term frequencies in ONE
    # map-side-combinable aggregate (empty documents produce no term
    # rows, so N/avgdl exclude them — identical to the old doclen).
    pop = t.groupBy(id_col).agg(
        F.count("*").alias("__dl"),
        *[
            F.count(F.when(F.col("term") == term, 1)).alias(f"__tf{i}")
            for i, term in enumerate(q_terms)
        ],
    )
    # Global stats in ONE combinable aggregate: corpus size, average
    # document length, and per-term document frequency.
    stats = pop.agg(
        F.count("*").cast("double").alias("__n"),
        F.avg("__dl").alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
            for i in range(len(q_terms))
        ],
    )

    def per_term(i: int):
        tf = F.col(f"__tf{i}")
        dfq = F.col(f"__df{i}")
        idf = F.log((F.col("__n") - dfq + 0.5) / (dfq + 0.5) + 1.0)
        denom = tf + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))
        return F.when(tf > 0, idf * tf * (k1 + 1.0) / denom).otherwise(0.0)

    n_hits = reduce(
        lambda a, i: a + (F.col(f"__tf{i}") > 0).cast("long"),
        range(len(q_terms)),
        F.lit(0).cast("long"),
    )
    score = reduce(
        lambda a, i: a + per_term(i), range(len(q_terms)), F.lit(0.0)
    )
    return (
        pop.crossJoin(F.broadcast(stats))
        .withColumn("n_hits", n_hits)
        .filter(F.col("n_hits") > 0)
        .select(
            F.col(id_col),
            "n_hits",
            F.round(score, round_to).alias("score"),
        )
    )


def word_repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", round_to: int = 4
) -> DataFrame:
    """Per-document repetition diagnostics (the Gopher-rules family):
    (id, n_words, n_distinct, dup_word_frac, top_word_frac).

    dup_word_frac = 1 - distinct/total; top_word_frac = most frequent
    word's share. Highly repetitive documents (boilerplate, SEO spam,
    generation loops) score high on both and get filtered before
    training. Two chained aggregations, both map-side combinable; the
    only wide exchange is on (id, term), same as tf_idf."""
    t = terms(df, id_col, text_col)
    wc = t.groupBy(id_col, "term").agg(F.count("*").alias("cnt"))
    total = F.sum("cnt")
    return wc.groupBy(id_col).agg(
        total.alias("n_words"),
        F.count("*").alias("n_distinct"),
        F.round(F.lit(1.0) - F.count("*") / total, round_to).alias("dup_word_frac"),
        F.round(F.max("cnt") / total, round_to).alias("top_word_frac"),
    )


def char_trigrams(
    df: DataFrame,
    id_col: str,
    text_col: str,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """(id, carry_cols..., gram) rows: every sliding 3-char window of
    the lowercased text. Pure codegen (`transform(sequence(...))` +
    explode) — no Python, no shuffle; gram rows stay co-located with
    their document. Docs shorter than 3 chars produce no grams (the
    `sequence` guard matters: Spark's sequence(1, 0) counts *down*,
    so the length filter is load-bearing, not cosmetic).
    ``carry_cols`` ride the explode so downstream per-doc aggregates
    can group on (id, carry...) instead of joining the attributes
    back on (round 10, guide §2.4)."""
    carry = list(carry_cols or [])
    t = F.lower(F.col(text_col))
    return (
        df.select(id_col, *carry, t.alias("__t"))
        .filter(F.length("__t") >= 3)
        .select(
            id_col,
            *carry,
            F.explode(
                F.expr("transform(sequence(1, length(__t) - 2),"
                       " i -> substring(__t, i, 3))")
            ).alias("gram"),
        )
    )


def train_char_trigram_lm(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Char-trigram language model: (gram, logp) with
    logp = ln(count(gram) / count(2-char context)), the context count
    derived from the same trigram table (sum over shared prefix) so
    the model is self-consistent and engine-portable.

    The CCNet/KenLM-style quality-filter recipe: train on a reference
    corpus, score candidate documents by perplexity, drop the tail.
    Scale shape: both aggregates are map-side combinable groupBys on
    the gram key, and the result is BOUNDED — at most |charset|³ rows
    regardless of corpus size — which is what makes the scoring join
    broadcastable at 100 TB."""
    cnt = char_trigrams(df, id_col, text_col).groupBy("gram").agg(
        F.count("*").alias("__c")
    )
    ctx = cnt.groupBy(F.substring("gram", 1, 2).alias("__pfx")).agg(
        F.sum("__c").alias("__cc")
    )
    # ctx is ≤ |charset|² rows but derived, so Catalyst has no size
    # estimate and plans a shuffle join — broadcast it explicitly
    # (round 10, guide §3.1: hint when you know a side is small)
    return cnt.join(
        F.broadcast(ctx), F.substring("gram", 1, 2) == F.col("__pfx")
    ).select(
        "gram", F.log(F.col("__c") / F.col("__cc")).alias("logp")
    )


def perplexity(
    df: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    unk_logp: float = -16.11809565095832,  # ln(1e-7)
    round_to: int = 4,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Score documents against a trigram LM: (id, carry_cols...,
    n_grams, ppl) with ppl = exp(-mean logp); unseen grams get
    `unk_logp` (a flat unknown penalty — enough for filtering, no
    backoff chain to shuffle).

    The LM side is explicitly broadcast (bounded size, see
    train_char_trigram_lm), so the corpus is never shuffled for the
    join; the per-doc mean partial-aggregates before its one exchange
    because a document's grams are born co-located with it.
    ``carry_cols`` are functionally dependent doc attributes (e.g.
    the language) grouped along with the id — callers that need them
    downstream avoid a doc-sized join back (round 10, guide §2.4)."""
    carry = list(carry_cols or [])
    grams = char_trigrams(df, id_col, text_col, carry_cols=carry)
    scored = grams.join(F.broadcast(lm), "gram", "left")
    return (
        scored.groupBy(id_col, *carry)
        .agg(
            F.count("*").alias("n_grams"),
            F.avg(F.coalesce("logp", F.lit(unk_logp))).alias("__avglp"),
        )
        .select(
            id_col,
            *carry,
            "n_grams",
            F.round(F.exp(-F.col("__avglp")), round_to).alias("ppl"),
        )
    )


def positional_terms(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, term): ``terms`` with 1-based token positions (the
    posexplode twin) — the input of the positional index."""
    from pipeline_dataengineer_spark.catalog import scale_out

    return (
        scale_out(df.select(id_col, text_col))
        .select(
            id_col,
            F.posexplode(
                F.split(F.lower(F.col(text_col)), " ")
            ).alias("pos0", "term"),
        )
        .filter(F.col("term") != "")
        .select(id_col, (F.col("pos0") + 1).alias("pos"), "term")
    )


def positional_index(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Positional posting lists: (term, id, positions) with positions
    the sorted 1-based token offsets of the term in that document —
    what phrase and proximity queries need beyond ``inverted_index``'s
    doc-id lists. One shuffle on (term, id) with map-side-combinable
    collect_list; the per-row buffer is one document's occurrences of
    one term (bounded by document length, never corpus-sized)."""
    t = positional_terms(df, id_col, text_col)
    return t.groupBy("term", id_col).agg(
        F.sort_array(F.collect_list("pos")).alias("positions")
    )


def phrase_search(
    index: DataFrame, phrase: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """Exact phrase matching over a ``positional_index``: documents
    where the phrase's terms occur CONSECUTIVELY, with match count
    and first match position. Returns (id, n_matches, first_pos).

    Scale shape: the index is first cut to the phrase's terms (a
    broadcast IN filter on the term key — the touched slice is
    phrase-vocabulary-sized, not index-sized), then ONE groupBy(id)
    pivots each doc's per-term position arrays into a map, and the
    consecutive-offset intersection is a pure array expression:
    match positions = filter(pos[t0], p -> ∀i p+i ∈ pos[ti])."""
    if not phrase:
        raise ValueError("phrase_search: phrase must be non-empty")
    terms_l = [t.lower() for t in phrase]
    cut = index.filter(F.col("term").isin(*set(terms_l)))
    per_doc = cut.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct("term", "positions"))
        ).alias("__tp")
    )
    # every phrase term must be present in the doc
    present = per_doc.filter(
        sum(
            (
                F.map_contains_key(F.col("__tp"), t).cast("int")
                for t in set(terms_l)
            ),
            F.lit(0),
        )
        == len(set(terms_l))
    )
    start = F.element_at(F.col("__tp"), terms_l[0])
    rest = list(enumerate(terms_l[1:], start=1))
    if rest:
        # NOTE: the lambda must take exactly ONE positional arg with
        # no defaults — PySpark inspects the signature to set the
        # higher-order function's arity
        def phrase_cond(p):
            conds = [
                F.array_contains(F.element_at(F.col("__tp"), t), p + i)
                for i, t in rest
            ]
            out = conds[0]
            for c in conds[1:]:
                out = out & c
            return out

        matches = F.filter(start, phrase_cond)
    else:
        matches = start
    return (
        present.select(
            id_col,
            F.size(matches).alias("n_matches"),
            F.array_min(matches).alias("first_pos"),
        )
        .filter(F.col("n_matches") > 0)
    )


def hashed_doc_vectors(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
) -> DataFrame:
    """Feature-hashing ("hashing trick") bag-of-words vectors:
    (id, vector array<double> of length ``dim``) with
    vector[h(term) mod dim] += sign(term), sign = ±1 from a second
    hash bit (the signed trick keeps collisions mean-zero —
    Weinberger et al.). The model-free way to get REAL vectors for
    similarity/clustering plumbing entirely inside the engine, and a
    fixture-friendly stand-in where inference runs elsewhere.

    Integer-exact (counts, not floats) so the whole path
    hash-checks. One (id, bucket) combinable aggregate, then an
    in-group pivot to the dense array via the ordered-struct sort —
    per-row state is one document's ≤ dim buckets."""
    t = terms(df, id_col, text_col)
    h = F.xxhash64("term")
    bucket = F.pmod(h, F.lit(dim)).cast("int")
    sign = F.when(
        F.pmod(F.shiftright(h, 8), F.lit(2)) == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    b = t.groupBy(id_col, bucket.alias("__b")).agg(
        F.sum(sign).alias("__v")
    )
    pairs = F.map_from_entries(
        F.collect_list(F.struct("__b", "__v"))
    )
    dense = F.expr(
        f"transform(sequence(0, {dim - 1}), "
        "i -> cast(coalesce(element_at(__m, i), 0) AS double))"
    )
    return (
        b.groupBy(id_col)
        .agg(pairs.alias("__m"))
        .select(id_col, dense.alias("vector"))
    )


def compression_ratio(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """(id, n_bytes, ratio): deflate-compressed size over raw UTF-8
    size — the Dolma/CCNet-family junk signal no token statistic
    replaces: generation loops, keyword stuffing, and templated spam
    compress far below prose (ratio ≪ prose's ~0.4–0.7), while
    high-entropy noise compresses above it. Arrow batch pass (zlib is
    not expressible in codegen); one pass, no shuffle, docs stay
    co-located. Empty/NULL docs yield NULL ratio."""
    import pyarrow as pa
    import zlib

    from pyspark.sql import types as T

    from pipeline_dataengineer_spark.catalog import scale_out

    src = scale_out(df.select(id_col, text_col)).select(
        F.col(id_col).alias("__id"), F.col(text_col).alias("__text")
    )
    schema = T.StructType(
        [
            src.schema["__id"],
            T.StructField("n_bytes", T.LongType()),
            T.StructField("ratio", T.DoubleType()),
        ]
    )

    def fn(batches):
        for batch in batches:
            ids = batch.column("__id")
            nb, ratio = [], []
            for t in batch.column("__text"):
                s = t.as_py()
                if not s:
                    nb.append(0)
                    ratio.append(None)
                    continue
                raw = s.encode("utf-8")
                nb.append(len(raw))
                ratio.append(
                    round(len(zlib.compress(raw, 6)) / len(raw), round_to)
                )
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(nb, type=pa.int64()),
                 pa.array(ratio, type=pa.float64())],
                names=["__id", "n_bytes", "ratio"],
            )

    return src.mapInArrow(fn, schema).withColumnRenamed("__id", id_col)


def extract_keywords(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 3,
) -> DataFrame:
    """Top-N TF-IDF terms per document — the "what is this document
    about" summary feeding tagging/faceting. Rides ``tf_idf`` (all
    its skew guarantees apply) plus one ranked window per doc; the
    cut is deterministic (score, then term, descending). Returns
    (id, keywords array<string> in rank order)."""
    scored = tf_idf(df, id_col, text_col)
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").desc()
    )
    ranked = scored.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= top_n
    )
    ordered = F.transform(
        F.sort_array(F.collect_list(F.struct("__rn", "term"))),
        lambda x: x["term"],
    )
    return ranked.groupBy(id_col).agg(ordered.alias("keywords"))


def tfidf_cosine_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.3,
    max_df: int | None = None,
    round_to: int = 4,
) -> DataFrame:
    """All document pairs with TF-IDF cosine similarity >= threshold,
    via a postings self-join — sparse lexical similarity WITHOUT
    embeddings (the model-free cousin of the embedding near-dup
    path, and exact: no LSH misses).

    Relational shape: pairs meet once per SHARED TERM (a self-join of
    the weight table on term), the dot product is ONE combinable
    sum(w_a·w_b) per pair, and norms join in from a per-doc
    aggregate. Nothing is quadratic in the corpus — the pair space is
    bounded by Σ_term df(term)², which ``max_df`` caps explicitly:
    terms in more than ``max_df`` docs (stopwords — precisely the
    terms whose df² blows up, and whose idf≈0 contributes least) are
    EXCLUDED from scoring, a documented semantic cap like
    inverted_index's max_posting_size, applied identically in the
    oracle. Output: (id_a, id_b, cosine) with id_a < id_b."""
    w = tf_idf(df, id_col=id_col, text_col=text_col, round_to=6)
    if max_df is not None:
        w = w.filter(F.col("df") <= max_df)
    norms = w.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("tfidf") * F.col("tfidf"))).alias("__norm")
    )
    a = w.select(
        "term", F.col(id_col).alias("id_a"), F.col("tfidf").alias("__wa")
    )
    b = w.select(
        "term", F.col(id_col).alias("id_b"), F.col("tfidf").alias("__wb")
    )
    dots = (
        a.join(b, "term")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("__wa") * F.col("__wb")).alias("__dot"))
    )
    na = norms.select(F.col(id_col).alias("id_a"), F.col("__norm").alias("__na"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("__norm").alias("__nb"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("__dot") / (F.col("__na") * F.col("__nb")), round_to
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def oov_rate(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    term_col: str = "term",
) -> DataFrame:
    """Out-of-vocabulary rate per document against a reference
    vocabulary (tokenizer-coverage / domain-shift screen: high OOV →
    the tokenizer will shred the text into bytes, or the doc is off-
    distribution). Tokens are the same lowered whitespace terms the
    TF-IDF family uses. Output: (id, n_tokens, n_oov, oov_rate).

    Scale: the vocabulary joins BROADCAST (a vocab is bounded by
    construction — if yours isn't, cap it upstream); per-doc counts
    partial-aggregate before their one exchange because a document's
    tokens are born co-located."""
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda t: t != "",
            )
        ).alias("__tok"),
    )
    marked = toks.join(
        F.broadcast(vocab.select(F.col(term_col).alias("__tok")).distinct()
                    .withColumn("__in_vocab", F.lit(1))),
        "__tok",
        "left",
    )
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(
            F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)
        ).alias("n_oov"),
        F.round(
            F.sum(
                F.when(F.col("__in_vocab").isNull(), 1.0).otherwise(0.0)
            )
            / F.count(F.lit(1)),
            6,
        ).alias("oov_rate"),
    )


def zipf_fit(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 1000,
) -> DataFrame:
    """Zipf rank-frequency fit over the corpus vocabulary: OLS of
    ln(freq) on ln(rank) across the top_k most frequent terms —
    natural language sits near slope −1; templated/generated text
    drifts flat, noise drifts steep. Returns ONE row
    (slope, intercept, r2, n_terms).

    Scale: term counts are a combinable groupBy; ranking the top_k
    cut is a window over the top_k-row table only (the vocab-sized
    aggregate is cut FIRST by a TakeOrdered top-k, so the window
    never sees the full vocabulary); the regression is one combinable
    aggregate over top_k rows. Ties in count rank by term so the cut
    and ranks are deterministic cross-engine."""
    counts = (
        df.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda t: t != "",
                )
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = counts.orderBy(
        F.col("freq").desc(), F.col("term")
    ).limit(top_k)
    w = Window.orderBy(F.col("freq").desc(), F.col("term"))
    ranked = top.select(
        F.ln(F.row_number().over(w).cast("double")).alias("x"),
        F.ln(F.col("freq").cast("double")).alias("y"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    return agg.select(
        # CASE guards: Spark 4 ANSI throws on double division by zero
        # (a single-distinct-term corpus has varx = 0)
        F.when(varx > 0, F.round(cov / varx, 6)).alias("slope"),
        F.when(
            varx > 0, F.round((sy - (cov / varx) * sx) / n, 6)
        ).alias("intercept"),
        F.when(
            (varx > 0) & (vary > 0),
            F.round((cov * cov) / (varx * vary), 6),
        ).alias("r2"),
        n.cast("long").alias("n_terms"),
    )


def _bigram_pairs(text_col: str):
    """array<struct<v,w>> of ADJACENT word pairs — a pure array zip
    (slice against slice), so bigram extraction is a narrow fan-out
    riding the scan instead of a fact-fact positional self-join (the
    SortMergeJoin the plan audit flagged in the first cut)."""
    ws = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    n = F.size(ws)
    return F.zip_with(
        F.slice(ws, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(ws, 2, F.greatest(n - 1, F.lit(0))),
        lambda v, w: F.struct(v.alias("v"), w.alias("w")),
    )


def train_kn_bigram_lm(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram language model over lowered
    whitespace words (Kneser & Ney 1995; Chen & Goodman 1999's
    standard formulation) — the strongest classic n-gram smoother,
    and the classic upgrade over the add-nothing conditional LM in
    train_char_trigram_lm:

        p(w|v) = max(c(vw) − d, 0)/c(v·) + λ(v)·p_cont(w)
        λ(v)   = d · N1+(v·) / c(v·)
        p_cont(w) = N1+(·w) / N1+(··)

    Returns the BIGRAM table (v, w, logp) plus per-context fallback
    rows (v, NULL, log λ(v)·p_cont-mass is NOT representable per
    unseen w, so instead): the companion ``kn_score`` joins seen
    bigrams and falls back to λ(v)·p_cont(w) computed from the two
    broadcast side tables it also returns. All tables are
    vocabulary-bounded (combinable groupBys), hence broadcastable —
    the corpus never shuffles to score.

    Returns (bigrams, contexts, continuations): bigrams (v, w,
    p_seen), contexts (v, lam), continuations (w, p_cont)."""
    bigrams_raw = df.select(
        F.explode(_bigram_pairs(text_col)).alias("__b")
    ).select(F.col("__b.v").alias("v"), F.col("__b.w").alias("w"))
    c_vw = bigrams_raw.groupBy("v", "w").agg(F.count(F.lit(1)).alias("c"))
    c_v = c_vw.groupBy("v").agg(
        F.sum("c").alias("cv"), F.count(F.lit(1)).alias("n1p_fwd")
    )
    n1p_bwd = c_vw.groupBy("w").agg(F.count(F.lit(1)).alias("n1p"))
    total_types = c_vw.count()
    d = float(discount)
    bigrams = c_vw.join(c_v, "v").select(
        "v",
        "w",
        (
            F.greatest(F.col("c") - F.lit(d), F.lit(0.0))
            / F.col("cv")
        ).alias("p_seen"),
    )
    contexts = c_v.select(
        "v", (F.lit(d) * F.col("n1p_fwd") / F.col("cv")).alias("lam")
    )
    continuations = n1p_bwd.select(
        "w", (F.col("n1p") / F.lit(float(total_types))).alias("p_cont")
    )
    return bigrams, contexts, continuations


def kn_score(
    df: DataFrame,
    lm: tuple[DataFrame, DataFrame, DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
    unk_logp: float = -16.11809565095832,  # ln(1e-7)
    round_to: int = 4,
) -> DataFrame:
    """Score documents against a KN bigram LM: (id, n_bigrams, ppl)
    with ppl = exp(−mean ln p) where p(w|v) = p_seen(vw) +
    λ(v)·p_cont(w) for KNOWN contexts (the interpolated form — seen
    bigrams get both terms), λ(v)·p_cont(w) when only the context is
    known, and exp(unk_logp) when the context itself is unseen. All
    three LM tables broadcast; the corpus never shuffles to score.

    OOV continuation floor: when the context v is known but w was
    never seen as a continuation ANYWHERE (p_seen and p_cont both
    absent — the only way the interpolated p can be 0, since both
    terms are strictly positive when present), the log-prob is
    floored to ``unk_logp`` instead of ln(0); previously ln(0)
    yielded NULL and avg() silently dropped the bigram, biasing ppl
    LOW on exactly the docs the floor was meant to penalize (and
    leaving n_bigrams disagreeing with the mean's denominator)."""
    bigrams, contexts, continuations = lm
    big = df.select(
        F.col(id_col), F.explode(_bigram_pairs(text_col)).alias("__b")
    ).select(id_col, F.col("__b.v").alias("v"), F.col("__b.w").alias("w"))
    scored = (
        big.join(F.broadcast(bigrams), ["v", "w"], "left")
        .join(F.broadcast(contexts), "v", "left")
        .join(F.broadcast(continuations), "w", "left")
        .select(
            id_col,
            F.when(F.col("lam").isNull(), F.lit(unk_logp))
            .when(
                F.col("p_seen").isNull() & F.col("p_cont").isNull(),
                F.lit(unk_logp),
            )
            .otherwise(
                F.ln(
                    F.coalesce(F.col("p_seen"), F.lit(0.0))
                    + F.col("lam")
                    * F.coalesce(F.col("p_cont"), F.lit(0.0))
                )
            )
            .alias("__lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.exp(-F.avg("__lp")), round_to).alias("ppl"),
    )
