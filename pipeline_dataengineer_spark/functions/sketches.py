"""Mergeable sketch aggregates: HLL distinct counts, frequent-items
(approx_top_k), and KLL quantiles.

The scale story for COUNT(DISTINCT) at 100 TB: an exact distinct
count shuffles every distinct value; a Datasketches HLL sketch is a
fixed ~KB state that merges associatively, so each partition (or each
day, or each source shard) builds its own sketch and union-merge runs
over dimension-sized state — the same incremental-maintenance shape
as operators/incremental.py:merge_agg_states, but for cardinality.

Built on Spark's JVM Datasketches expressions (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``; Spark 4.1
``approx_top_k_accumulate/_combine/_estimate``;
``kll_sketch_agg_double`` family) — no Python in the loop. All three
families follow the same build/merge/estimate trio: per-shard states
merge over dimension-sized rows, the incremental-maintenance shape of
operators/incremental.py:merge_agg_states.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_sketches(
    df: DataFrame, keys: list[str], value_col: str, lg_k: int = 12
) -> DataFrame:
    """Per-key HLL sketch state over ``value_col`` — the partial,
    mergeable form (a ``sketch`` binary column). Persist this instead
    of raw distinct values; tomorrow's delta merges in without
    re-reading history. lg_k=12 → ~2% relative error, 4 KB/key."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch")
    )


def merge_hll(*states: DataFrame, keys: list[str]) -> DataFrame:
    """Union any number of per-key sketch states into one (same
    schema). Sketch union is the monoid merge — row traffic is
    |keys| x ~4 KB regardless of how much raw data built each state."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy(*keys).agg(
        F.hll_union_agg("sketch", F.lit(True)).alias("sketch")
    )


def hll_estimate(state: DataFrame, keys: list[str]) -> DataFrame:
    """Finalize: distinct-count estimate per key from the sketch."""
    return state.select(
        *keys, F.hll_sketch_estimate("sketch").alias("approx_distinct")
    )


def approx_distinct_by(
    df: DataFrame, keys: list[str], value_col: str, lg_k: int = 12
) -> DataFrame:
    """One-shot per-key approximate distinct count via HLL — the
    single-pass form of the build/merge/estimate trio above. Unlike
    ``approx_count_distinct`` the intermediate state is exportable,
    which is what makes the incremental variant possible."""
    return hll_estimate(hll_sketches(df, keys, value_col, lg_k), keys)


# ------------------------------------------------------------------
# Frequent items (Datasketches approx_top_k, Spark 4.1) — same
# build/merge/estimate trio as HLL: per-shard states merge over
# dimension-sized rows, so "top URLs yesterday + today" never
# re-reads yesterday's raw data.
# ------------------------------------------------------------------


def topk_states(
    df: DataFrame, keys: list[str], value_col: str, max_items: int = 10_000
) -> DataFrame:
    """Per-key frequent-items sketch state (mergeable binary-struct
    column). ``max_items`` bounds the sketch: counts are EXACT while
    distinct values per key stay under it, approximate (guaranteed
    over-estimates, Misra-Gries family) beyond."""
    cols = [F.col(c) for c in keys]
    return df.groupBy(*cols).agg(
        F.expr(
            f"approx_top_k_accumulate({value_col}, {int(max_items)})"
        ).alias("topk_state")
    )


def merge_topk(*states: DataFrame, keys: list[str]) -> DataFrame:
    """Combine any number of per-key frequent-items states."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy(*keys).agg(
        F.expr("approx_top_k_combine(topk_state)").alias("topk_state")
    )


def topk_estimate(
    state: DataFrame, keys: list[str], k: int = 10, max_items: int = 10_000
) -> DataFrame:
    """Finalize: explode each key's sketch into (item, est_count)
    rows, deterministically ordered (count desc, then item) — ties at
    the k boundary never flap between runs. ``max_items`` must match
    the build-side value (the estimate is asked for the sketch's full
    tracked set, then cut to k AFTER the deterministic sort, so the
    sketch's own tie order never leaks into results)."""
    from pyspark.sql import Window

    est = state.select(
        *keys,
        F.explode(
            F.expr(f"approx_top_k_estimate(topk_state, {int(max_items)})")
        ).alias("e"),
    ).select(
        *keys,
        F.col("e.item").alias("item"),
        F.col("e.count").alias("est_count"),
    )
    w = Window.partitionBy(*keys).orderBy(F.col("est_count").desc(), F.col("item"))
    return (
        est.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


# ------------------------------------------------------------------
# KLL quantile sketches (Spark 4.1) — mergeable quantile state: the
# partial-aggregate form of approx_percentile, for incremental
# maintenance of percentile dashboards over append-only data.
# ------------------------------------------------------------------


def kll_states(
    df: DataFrame, keys: list[str], value_col: str, k: int = 200
) -> DataFrame:
    """Per-key KLL(double) quantile sketch state. k=200 → ~1.65%
    worst-case rank error, a few KB per key."""
    return df.groupBy(*keys).agg(
        F.expr(
            f"kll_sketch_agg_double(CAST({value_col} AS DOUBLE), {int(k)})"
        ).alias("kll_state")
    )


def merge_kll(*states: DataFrame, keys: list[str]) -> DataFrame:
    """Merge per-key KLL states (rank-error bounds compose). Spark
    exposes KLL merge as a BINARY SCALAR (``kll_sketch_merge_double``)
    rather than an aggregate, so the group-wise merge is a
    collect_list + reduce fold: the per-key buffer holds one ~KB
    sketch per INPUT STATE (shard/day), not per raw row — bounded by
    how many states are being merged, which is the point."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    fold = (
        "reduce(slice(sketches, 2, size(sketches) - 1), sketches[0], "
        "(acc, x) -> kll_sketch_merge_double(acc, x))"
    )
    return (
        merged.groupBy(*keys)
        .agg(F.collect_list("kll_state").alias("sketches"))
        .select(*keys, F.expr(fold).alias("kll_state"))
    )


def kll_quantiles(
    state: DataFrame, keys: list[str], qs: list[float]
) -> DataFrame:
    """Finalize: one row per key with a quantile estimate per q in
    ``qs`` (columns q_50 style) plus the exact row count the sketch
    saw (KLL tracks n exactly — a free consistency check)."""
    cols = [
        F.expr(f"kll_sketch_get_quantile_double(kll_state, {q})").alias(
            f"q_{str(q).replace('.', '_')}"
        )
        for q in qs
    ]
    return state.select(
        *keys,
        F.expr("kll_sketch_get_n_double(kll_state)").alias("n"),
        *cols,
    )


# ------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — the theta-sketch shape.
# What it adds over HLL: the state is an actual hash SAMPLE of the
# distinct values, so set algebra works — union (merge the k-min
# sets) AND intersection (Jaccard over the union's k-min set), which
# HLL cannot do. "How many users did A and B both see" over per-shard
# states, without re-reading raw data.
#
# Scale shape: the per-key state is the k smallest xxhash64 values of
# the column. Build is two bounded stages: a salted partial (each
# (key, salt) bucket keeps its own k-min via array_sort+slice over a
# set whose EXPECTED size is distinct/salts, with the k cap applied
# before the merge) and a final fold whose buffer is salts x k — the
# same bounded-by-shard-count argument as merge_kll. All JVM-side
# (collect_set / array_sort / slice / flatten) — no Python.
# ------------------------------------------------------------------


def _kmin_fold(col: str, k: int) -> str:
    """SQL that merges an array of sorted hash arrays into one k-min
    set: flatten → distinct → sort → first k."""
    return (
        f"slice(array_sort(array_distinct(flatten({col}))), 1, {int(k)})"
    )


def kmv_states(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    k: int = 1024,
    salts: int = 32,
    prefilter_margin: float = 4.0,
) -> DataFrame:
    """Per-key KMV state: ``kmv`` = sorted array of the k smallest
    xxhash64 values of ``value_col`` (fewer if the key has fewer
    distinct values — in that regime the sketch is EXACT). Relative
    error of the estimator is ~1/sqrt(k-2) (~3% at k=1024).

    BOUNDED BUFFERS, not just bounded output: the salted
    ``collect_set`` would otherwise buffer ~distinct/salts hashes for
    a mega-cardinality key (the round-2 inverted-index lesson — cap
    the buffer, not just the result). A first combinable pass takes
    approx_count_distinct per key; keys whose estimate exceeds
    ``prefilter_margin * k * salts`` get a hash-space threshold
    filter of ``prefilter_margin * k / n_est`` BEFORE the collect, so
    each salt bucket buffers ~margin*k/salts values no matter how
    large the key is. Safety: the k-th smallest hash sits at ~k/n of
    the hash space; the filter keeps margin*k/n of it, so dropping a
    true k-min hash needs HLL to overestimate n by >margin x — HLL's
    ~2% error makes the 4x default margin astronomically safe, and
    small keys (n_est below the trigger) are never filtered at all
    (the exact regime stays exact by construction)."""
    h = F.xxhash64(F.col(value_col))
    hashed = df.select(*keys, h.alias("__h"))
    trigger = float(prefilter_margin) * k * salts
    est = hashed.groupBy(*keys).agg(
        F.approx_count_distinct("__h").alias("__nd")
    )
    frac = F.when(
        F.col("__nd") > trigger,
        F.lit(float(prefilter_margin) * k) / F.col("__nd"),
    ).otherwise(F.lit(1.0))
    # signed-hash threshold covering `frac` of the 2^64 space from
    # the bottom (Long.MIN upward)
    thresh = (
        F.lit(-9.223372036854776e18) + frac * F.lit(1.8446744073709552e19)
    )
    filtered = hashed.join(
        F.broadcast(est.select(*keys, thresh.alias("__t"))), keys
    ).filter(F.col("__h").cast("double") <= F.col("__t"))
    partial = (
        filtered.groupBy(*keys, F.pmod("__h", F.lit(salts)).alias("__salt"))
        .agg(
            F.slice(
                F.array_sort(F.collect_set("__h")), 1, k
            ).alias("__part")
        )
    )
    return (
        partial.groupBy(*keys)
        .agg(F.collect_list("__part").alias("__parts"))
        .select(*keys, F.expr(_kmin_fold("__parts", k)).alias("kmv"))
    )


def merge_kmv(*states: DataFrame, keys: list[str], k: int = 1024) -> DataFrame:
    """Union per-key KMV states: the k-min of the combined hash sets.
    This IS the distinct-union sketch — estimate it for |A ∪ B|."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    return (
        merged.groupBy(*keys)
        .agg(F.collect_list("kmv").alias("__parts"))
        .select(*keys, F.expr(_kmin_fold("__parts", k)).alias("kmv"))
    )


def kmv_estimate(state: DataFrame, keys: list[str], k: int = 1024) -> DataFrame:
    """Distinct-count estimate per key. If the state holds fewer than
    k hashes the count is exact (= size); otherwise the order
    statistic: (k-1) / u_(k) with hashes normalized to (0, 1]."""
    u = "(CAST(element_at(kmv, size(kmv)) AS DOUBLE) + 9.223372036854776e18) / 1.8446744073709552e19"
    est = F.expr(
        f"CASE WHEN size(kmv) < {int(k)} THEN CAST(size(kmv) AS DOUBLE) "
        f"ELSE ({int(k)} - 1) / ({u}) END"
    )
    return state.select(*keys, est.alias("approx_distinct"))


def kmv_intersection(
    a: DataFrame, b: DataFrame, keys: list[str], k: int = 1024
) -> DataFrame:
    """Per-key |A ∩ B| estimate from two KMV states: Jaccard over the
    UNION's k-min set (the fraction of it present in both sides'
    sketches) times the union estimate. Exact when both keys' states
    are below k."""
    ab = (
        a.select(*keys, F.col("kmv").alias("kmv_a"))
        .join(b.select(*keys, F.col("kmv").alias("kmv_b")), keys)
        .withColumn(
            "kmv",
            F.expr(
                f"slice(array_sort(array_distinct("
                f"concat(kmv_a, kmv_b))), 1, {int(k)})"
            ),
        )
    )
    union_est = kmv_estimate(ab.select(*keys, "kmv"), keys, k)
    jac = ab.select(
        *keys,
        (
            F.size(
                F.array_intersect(
                    F.array_intersect("kmv", "kmv_a"), F.col("kmv_b")
                )
            )
            / F.size("kmv")
        ).alias("__jac"),
    )
    return union_est.join(jac, keys).select(
        *keys,
        (F.col("approx_distinct") * F.col("__jac")).alias(
            "approx_intersection"
        ),
    )


def bitmap_states(
    df: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """Per-(key, bucket) roaring-style bitmap state over an integer
    ``value_col`` — the EXACT counterpart of ``hll_sketches``. Spark's
    bitmap expressions slice the integer domain into 32k-bit buckets
    (``bitmap_bucket_number``) and OR each value's bit into a binary
    bitmap — a mergeable monoid state like the sketch families, but
    lossless: merge then count equals a one-pass COUNT(DISTINCT).

    The scale trade vs HLL: state is O(domain/32k) buckets per key
    (dense ids compress superbly; sparse 64-bit hash domains do not —
    use HLL there), and the count is exact, which materialized-view
    maintenance often requires."""
    return df.groupBy(
        *keys,
        F.expr(f"bitmap_bucket_number({value_col})").alias("bucket"),
    ).agg(
        F.expr(f"bitmap_construct_agg(bitmap_bit_position({value_col}))").alias(
            "bitmap"
        )
    )


def merge_bitmap(*states: DataFrame, keys: list[str]) -> DataFrame:
    """OR-merge bitmap states (same schema). Exact: bits survive any
    merge order / slicing of the input — the incremental-maintenance
    law, proven in tests against the one-pass build."""
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), states)
    return u.groupBy(*keys, "bucket").agg(
        F.expr("bitmap_or_agg(bitmap)").alias("bitmap")
    )


def bitmap_distinct(state: DataFrame, keys: list[str]) -> DataFrame:
    """Finalize: exact distinct count per key = popcount summed over
    the key's buckets (map-side combinable)."""
    return state.groupBy(*keys).agg(
        F.sum(F.expr("bitmap_count(bitmap)")).alias("n_distinct")
    )


# ------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — mergeable
# point-frequency state. The gap the other families leave open:
# HLL answers "how many distinct", approx_top_k answers "which are
# the heaviest", KLL answers "what rank"; Count-Min answers "how
# often does THIS item occur" for arbitrary items in O(depth)
# lookups over a depth x width count table, with the one-sided
# guarantee est >= true and est <= true + (e/width)*N w.p.
# 1 - exp(-depth).
#
# Relational formulation (no opaque binary state): the sketch IS a
# DataFrame of (keys..., d, bucket, cnt) rows — at most depth*width
# rows per key group regardless of input size, built by ONE
# combinable groupBy count (map-side partial aggregation shrinks
# every partition to <= depth*width rows before the shuffle). Merge
# is a plain summing groupBy — the same monoid shape as the other
# families, so incremental maintenance (yesterday's state + today's
# delta) never re-reads history.
#
# The hash family is pairwise-independent affine over the Mersenne
# prime P = 2^31-1 — h_d(x) = ((a_d*(x mod P) + b_d) mod P) mod
# width — in PORTABLE integer arithmetic (products < 2^62, safe
# under ANSI), with an exact SQL twin (`cm_bucket_sql`) so an
# external engine replays bucket placement bit-for-bit, collisions
# included: estimates are hash-checkable, not just rows-checkable.
# ------------------------------------------------------------------

CM_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime, also the Lehmer modulus)
# fixed pairwise-independent (a, b) pairs; depth <= 8. a in [1, P),
# classic minstd/PRNG multipliers — any fixed a works, these are
# documented constants so the SQL twin can be audited by eye.
_CM_A = [48_271, 69_621, 16_807, 39_373, 40_014, 45_991, 53_668, 62_089]
_CM_B = [0, 12_345, 7_919, 104_729, 1_299_709, 217, 15_485_863, 999_983]


def cm_bucket(value: Column | str, d: int, width: int) -> Column:
    """Row d's bucket for ``value``: affine hash mod width. The inner
    ``mod P`` bounds the product under 2^62 (ANSI-safe)."""
    v = F.col(value) if isinstance(value, str) else value
    x = F.pmod(v.cast("long"), F.lit(CM_P))
    return F.pmod(
        F.pmod(x * _CM_A[d] + _CM_B[d], F.lit(CM_P)), F.lit(width)
    )


def cm_bucket_sql(value_expr: str, d: int, width: int) -> str:
    """The same bucket arithmetic as ANSI SQL text (sign-safe ``%``
    wrapping, see sampling.bucket_sql) — lets an oracle engine replay
    the sketch exactly."""
    p = CM_P
    nonneg = f"(((({value_expr}) % {p}) + {p}) % {p})"
    return f"((({nonneg} * {_CM_A[d]} + {_CM_B[d]}) % {p}) % {width})"


def cm_hash_str(value: Column | str) -> Column:
    """Portable string→long hash for Count-Min over non-numeric keys
    (URLs, tokens, tenant ids): the classic base-31 polynomial over
    UNICODE CODEPOINTS, folded mod P at every step so the accumulator
    never leaves [0, P) (ANSI-safe, engine-portable). NULL hashes to
    NULL (the row is sketched under no bucket, same as a NULL numeric
    key). BMP codepoints only — astral chars split into surrogate
    halves differently across engines; strip or re-encode upstream if
    your keys contain them (same caveat as text.strip_accents)."""
    v = F.col(value) if isinstance(value, str) else value
    return F.aggregate(
        F.split(v.cast("string"), ""),
        F.lit(0).cast("long"),
        lambda acc, ch: F.pmod(acc * 31 + F.ascii(ch), F.lit(CM_P)),
    )


def cm_hash_str_sql(value_expr: str) -> str:
    """DuckDB twin of cm_hash_str — list_reduce over the string's
    codepoints with the identical (·31 + cp) mod P fold, seeded by a
    prepended 0 (list_reduce uses the first element as the initial
    accumulator)."""
    p = CM_P
    cps = (
        f"list_transform(range(1, length({value_expr}) + 1), "
        f"i -> unicode(array_extract({value_expr}, CAST(i AS INT))))"
    )
    return (
        f"list_reduce([CAST(0 AS BIGINT)] || {cps}, "
        f"(acc, c) -> (acc * 31 + c) % {p})"
    )


# Spark's DataType.simpleString spellings: ByteType -> "tinyint",
# ShortType -> "smallint" (NOT "byte"/"short" — those are the class
# names; round-5 listed them and silently rejected small int keys)
_CM_INTEGRAL = ("tinyint", "smallint", "int", "bigint", "boolean")


def _cm_value_expr(df: DataFrame, value_col: str) -> Column:
    """The sketchable long expression for ``value_col``: integral
    types pass through, strings go through cm_hash_str, and
    fractional/temporal/complex types RAISE — casting them to long
    silently (the old behavior) either truncated (double) or NULLed
    (string), breaking the one-sided est>=true guarantee without a
    word. Cast explicitly upstream if truncation is what you want."""
    dt = df.schema[value_col].dataType.simpleString()
    if dt in _CM_INTEGRAL:
        return F.col(value_col).cast("long")
    if dt == "string":
        return cm_hash_str(value_col)
    raise TypeError(
        f"Count-Min value column {value_col!r} has type {dt}; only "
        "integral and string keys are sketchable (hash or cast "
        "fractional/temporal keys explicitly — e.g. "
        "F.unix_timestamp(ts) or round(x*100).cast('long'))"
    )


def cm_states(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    depth: int = 4,
    width: int = 2048,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the per-key Count-Min table: rows (keys..., d, bucket,
    cnt), at most depth*width per key group. ``weight_col`` turns it
    into a weighted-frequency sketch (e.g. bytes per URL instead of
    hits per URL). String keys hash through cm_hash_str first (still
    oracle-replayable via cm_hash_str_sql); fractional/temporal types
    raise — see _cm_value_expr."""
    if not 1 <= depth <= len(_CM_A):
        raise ValueError(f"depth must be in [1, {len(_CM_A)}]")
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    v = _cm_value_expr(df, value_col)
    stacked = df.select(
        *keys,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        cm_bucket(v, d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("__db"),
        w.alias("__w"),
    )
    return stacked.groupBy(
        *keys, F.col("__db.d").alias("d"), F.col("__db.bucket").alias("bucket")
    ).agg(F.sum("__w").alias("cnt"))


def merge_cm(*states: DataFrame, keys: list[str]) -> DataFrame:
    """Sum-merge any number of CM states (identical depth/width
    assumed — the table coordinates ARE (d, bucket)). Counter monoid:
    merge-then-estimate equals build-over-the-union exactly."""
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), states)
    return u.groupBy(*keys, "d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cm_estimate(
    state: DataFrame,
    items: DataFrame,
    item_col: str,
    keys: list[str] | None = None,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Point-frequency estimates: min over the depth rows of each
    item's bucket counts (absent bucket = 0). ``items`` is the small
    side (the things you want counted) and is exploded to depth rows
    then broadcast against the bounded state table — the corpus that
    built the state is long gone."""
    keys = keys or []
    v = _cm_value_expr(items, item_col)
    probes = items.select(
        *keys,
        F.col(item_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        cm_bucket(v, d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("__db"),
    ).select(*keys, item_col, "__db.d", "__db.bucket")
    joined = probes.join(
        state, on=[*keys, "d", "bucket"], how="left"
    ).withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
    return joined.groupBy(*keys, item_col).agg(
        F.min("cnt").alias("est_count")
    )


def cm_inner_product(
    state_a: DataFrame, state_b: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """Inner-product estimate from two Count-Min states (Cormode &
    Muthukrishnan §4.2): est = min over depth rows of
    Σ_bucket cnt_a(d,b) · cnt_b(d,b). Since
    Σ_v f_a(v)·f_b(v) is exactly the row count of the equi-join
    between the two sketched columns, this is a JOIN-SIZE ESTIMATE
    from two fixed-size states — the planner question ("how big is
    this join?") answered without touching either table again, with
    the same one-sided guarantee as point queries (never an
    underestimate). Cost: one equi-join of two depth×width tables +
    two tiny aggregates — independent of the data that built them."""
    keys = keys or []
    a = state_a.select(*keys, "d", "bucket", F.col("cnt").alias("__ca"))
    b = state_b.select(*keys, "d", "bucket", F.col("cnt").alias("__cb"))
    per_d = (
        a.join(b, [*keys, "d", "bucket"])
        .groupBy(*keys, "d")
        .agg(F.sum(F.col("__ca") * F.col("__cb")).alias("__ip"))
    )
    return per_d.groupBy(*keys).agg(F.min("__ip").alias("est_inner_product"))
