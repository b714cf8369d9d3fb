"""Deterministic, engine-portable sampling and dataset splitting.

Training-data pipelines need samples and train/val/test splits that
are (a) reproducible run-to-run, (b) stable under repartitioning, and
(c) computable with zero shuffles. ``df.sample(seed=...)`` fails (a)
across engines and (b) across partition layouts; ``orderBy(rand())``
costs a full sort. Instead we bucket rows by a Lehmer / Park-Miller
multiplicative hash of a key column:

    bucket = ((key mod P) * 48271 mod P) mod buckets,  P = 2^31 - 1

which is a pure narrow projection (no shuffle, pushable past joins),
identical in any engine with 64-bit integer arithmetic (the product
is < 2^47, safe under Spark 4 ANSI overflow checking), and assigns
every row a stable bucket independent of data layout. The reference
has no sampling at all (SURVEY.md §2 Part B); this is a north-star
extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MERSENNE_31 = 2_147_483_647  # 2^31 - 1, the Lehmer modulus
LEHMER_MULT = 48_271


def portable_bucket(key: Column | str, buckets: int) -> Column:
    """Stable bucket in [0, buckets) from an integer key; the inner
    ``mod P`` keeps the product under 2^47 so ANSI mode never throws."""
    k = F.col(key) if isinstance(key, str) else key
    scrambled = F.pmod(F.pmod(k.cast("long"), F.lit(MERSENNE_31)) * LEHMER_MULT,
                       F.lit(MERSENNE_31))
    return F.pmod(scrambled, F.lit(buckets))


def bucket_sql(key_expr: str, buckets: int) -> str:
    """The same bucket function as ANSI SQL text (for oracles and for
    pushing the sample predicate into non-Spark engines).

    Spark's pmod is always non-negative but SQL ``%`` is
    sign-preserving in most engines (DuckDB, Postgres), so the first
    step wraps to ``((x % P) + P) % P``; every later operand is then
    already non-negative and plain ``%`` matches pmod."""
    nonneg = f"(((({key_expr}) % {MERSENNE_31}) + {MERSENNE_31}) % {MERSENNE_31})"
    return f"(({nonneg} * {LEHMER_MULT}) % {MERSENNE_31}) % {buckets}"


SCRAMBLE_MULT_2 = 69_621  # the other classic minstd multiplier


def portable_scramble(key: Column | str) -> Column:
    """Non-linear integer scramble in [0, 2^31): multiply–xor–multiply.

    ``portable_bucket`` is an affine Lehmer step — perfect for bucket
    membership, but ORDER-PRESERVING on small consecutive keys (ids
    0..n stay monotone until the product wraps the modulus), so it
    cannot drive a shuffle permutation. The xor-shift folds between
    the two multiplies break linearity: max monotone run on
    consecutive ids is ~2. Not bijective (xor folding) — callers
    needing a total order must tie-break by the key itself. Same
    arithmetic as ``scramble_sql`` (bitwise ops on non-negative
    longs are engine-portable)."""
    k = F.col(key) if isinstance(key, str) else key
    h = F.pmod(
        F.pmod(k.cast("long"), F.lit(MERSENNE_31)) * LEHMER_MULT,
        F.lit(MERSENNE_31),
    )
    h = h.bitwiseXOR(F.shiftright(h, 15))
    h = F.pmod(h * SCRAMBLE_MULT_2, F.lit(MERSENNE_31))
    return h.bitwiseXOR(F.shiftright(h, 13))


def scramble_sql(key_expr: str) -> str:
    """``portable_scramble`` as ANSI-ish SQL text (DuckDB/Postgres
    xor() / >> on non-negative BIGINTs match Spark's operators)."""
    m = MERSENNE_31
    nonneg = f"(((({key_expr}) % {m}) + {m}) % {m})"
    h1 = f"(({nonneg} * {LEHMER_MULT}) % {m})"
    h2 = f"xor({h1}, {h1} >> 15)"
    h3 = f"(({h2} * {SCRAMBLE_MULT_2}) % {m})"
    return f"xor({h3}, {h3} >> 13)"


def deterministic_sample(
    df: DataFrame, key: Column | str, fraction: float, buckets: int = 1_000_000
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash: reproducible,
    layout-independent, and a plain filter — at 100 TB it rides the
    scan (no shuffle, combines with predicate pushdown)."""
    return df.filter(portable_bucket(key, buckets) < int(fraction * buckets))


def hash_split(
    df: DataFrame,
    key: Column | str,
    weights: dict[str, float],
    buckets: int = 1_000_000,
) -> DataFrame:
    """Add a ``split`` column ('train'/'val'/'test'/...) partitioning
    rows by cumulative hash-bucket ranges. Weights must sum to ~1.
    Every row lands in exactly one split, and membership is stable
    across runs, engines, and repartitioning — the property that
    matters when the corpus is rebuilt incrementally."""
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    b = portable_bucket(key, buckets)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        branch = F.when(b < int(cum * buckets), F.lit(name))
        expr = branch if expr is None else expr.when(b < int(cum * buckets), F.lit(name))
    expr = F.lit(names[0]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    key: Column | str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    buckets: int = 1_000_000,
) -> DataFrame:
    """Per-stratum deterministic sample (the hash analogue of
    ``df.sampleBy``): each stratum keeps its own fraction, strata not
    listed keep ``default_fraction``. Still a pure narrow filter —
    no shuffle, no per-stratum scan, stable under repartitioning —
    which is what sampleBy(seed=...) cannot promise across engines
    or layouts. Typical use: rebalance a web corpus by source/lang
    without materializing per-stratum tables."""
    b = portable_bucket(key, buckets)
    thresh = None
    for stratum, frac in fractions.items():
        branch_val = F.lit(int(frac * buckets))
        if thresh is None:
            thresh = F.when(F.col(strata_col) == stratum, branch_val)
        else:
            thresh = thresh.when(F.col(strata_col) == stratum, branch_val)
    thresh = (
        F.lit(int(default_fraction * buckets))
        if thresh is None
        else thresh.otherwise(F.lit(int(default_fraction * buckets)))
    )
    return df.filter(b < thresh)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    target_frac: float,
    resolution: int = 1_000_000,
    ref_weight: float | None = None,
) -> DataFrame:
    """Deterministic weight-proportional sampling: row i survives with
    probability ``min(1, target_frac * w_i / mean(w))`` — the expected
    kept fraction is ~target_frac while up/down-weighting rows by
    ``weight_col`` (the training-mixture shape: quality-weighted
    document retention instead of uniform).

    Same scale contract as the uniform sampler: the keep decision is
    ``portable_bucket(key, resolution) < threshold_i``, a pure narrow
    projection — stable under repartitioning, no shuffle of the fact
    table. The only non-narrow step is ONE scalar aggregate for
    mean(w), which arrives back by broadcast (1-row cross join —
    Catalyst folds it into the filter stage), so the plan is
    scan → broadcast scalar → filter.

    NULL or non-positive weights drop the row (a weight of 0 means
    "never sample"), keeping semantics total and explicit.

    ``ref_weight`` replaces the computed mean with an explicit
    normalizer. Besides skipping the scalar aggregate, it makes the
    kept SET exactly portable across engines: with a constant
    normalizer every row's threshold is the same elementwise IEEE754
    expression everywhere, whereas a data-computed mean can differ in
    the last ulp with summation order and flip a boundary row."""
    if ref_weight is not None:
        base = df
        norm = F.lit(float(ref_weight))
    else:
        mean_w = df.select(F.avg(F.col(weight_col)).alias("__mean_w"))
        base = df.crossJoin(F.broadcast(mean_w))
        norm = F.col("__mean_w")
    thresh = (
        F.least(
            F.lit(1.0),
            F.lit(float(target_frac)) * F.col(weight_col) / norm,
        )
        * resolution
    )
    out = base.filter(
        F.col(weight_col).isNotNull()
        & (F.col(weight_col) > 0)
        & (portable_bucket(key_col, resolution) < thresh)
    )
    return out if ref_weight is not None else out.drop("__mean_w")


def group_sample(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    k: int,
    oversample: float = 4.0,
    buckets: int = 1_000_000,
) -> DataFrame:
    """Exactly min(k, |group|) rows per group — the k rows whose
    Lehmer bucket (tie-broken by ``id_col``) is smallest. The
    fixed-count analogue of ``stratified_sample``'s fixed-fraction:
    "give me 1000 documents per language", reproducibly, independent
    of layout.

    Definition first, plan second: the SAMPLE is defined as the k
    bucket-smallest rows per group, so the result is engine-portable
    and layout-stable. The naive plan — rank window over every group
    — funnels each group's FULL row set through one task (a hot
    group at 100 TB is a straggler/OOM). Instead:

    1. per-group counts (combinable aggregate, dimension-sized);
    2. narrow prefilter keeping each group's smallest-bucket slice,
       thresholded at ``oversample * k / n`` of the bucket space —
       survivors are group-count-independent (~oversample*k);
    3. exact rank window over survivors only;
    4. EXACTNESS GUARD: any group whose survivor count came up short
       of min(k, n) (possible only by bucket-collision bad luck at
       P < Chernoff-tail levels) is re-ranked over its full rows and
       unioned back. The guard keeps the operator exactly equal to
       its definition while the fast path does ~oversample*k work
       per group regardless of group size.
    """
    b = portable_bucket(F.col(id_col), buckets)
    counts = df.groupBy(*keys).agg(F.count("*").alias("__n"))
    with_b = df.withColumn("__b", b)
    # no forced broadcast: `counts` is one row per GROUP, and groups
    # can be mega-cardinality (per-user sampling) — AQE picks
    # broadcast when the stats say it fits
    joined = with_b.join(counts, keys)
    thresh = F.least(
        F.lit(buckets),
        F.ceil(F.lit(float(oversample) * k * buckets) / F.col("__n")),
    )
    survivors = joined.filter(F.col("__b") < thresh)
    w = Window.partitionBy(*keys).orderBy("__b", id_col)
    ranked = survivors.withColumn("__rn", F.row_number().over(w))
    # guard: groups where the prefilter kept fewer than min(k, n)
    got = survivors.groupBy(*keys).agg(F.count("*").alias("__got"))
    short = (
        counts.join(got, keys, "left")
        .filter(
            F.coalesce(F.col("__got"), F.lit(0))
            < F.least(F.lit(k), F.col("__n"))
        )
        .select(*keys)
    )
    fast = ranked.join(short, keys, "left_anti")
    slow = (
        with_b.join(short, keys, "left_semi")
        .withColumn("__rn", F.row_number().over(w))
    )
    out = fast.select(df.columns + ["__rn"]).unionByName(
        slow.select(df.columns + ["__rn"])
    )
    return out.filter(F.col("__rn") <= k).drop("__rn")


def time_series_folds(
    df: DataFrame,
    time_col: str,
    n_folds: int,
    unit_col_name: str = "fold",
) -> DataFrame:
    """Expanding-window cross-validation folds for temporal data —
    the split discipline that keeps a model from training on its own
    future. The distinct TIME UNITS (not rows — row-level splits leak
    a test day's other rows into train) are cut into ``n_folds + 1``
    contiguous chunks by ntile; fold k (1-based) trains on chunks
    1..k and tests on chunk k+1. Returns one row per (input row,
    fold) with a ``role`` column ('train'/'test'); rows in chunks
    beyond a fold's test chunk are absent from that fold.

    Scale shape: the ntile window runs over the DISTINCT time units
    (a dimension-sized table — days/hours, not the fact table); the
    chunk id joins back by broadcast; the per-fold expansion is a
    generate_series explode bounded by n_folds. Everything downstream
    (one model fit per fold) filters on (fold, role) — partition
    pruning if the caller writes partitioned by fold."""
    if n_folds < 1:
        raise ValueError("n_folds must be >= 1")
    # NULL-dated rows can belong to no fold (there is no order to cut
    # on) — drop them EXPLICITLY, before the unit table, so a NULL
    # neither occupies an ntile slot (skewing every real chunk's
    # boundary) nor vanishes silently in the tag-back equi-join
    df = df.filter(F.col(time_col).isNotNull())
    units = df.select(F.col(time_col).alias("__u")).distinct()
    w = Window.orderBy("__u")
    chunked = units.withColumn(
        "__chunk", F.ntile(n_folds + 1).over(w)
    )
    tagged = df.join(
        F.broadcast(chunked), F.col(time_col) == F.col("__u")
    ).drop("__u")
    folds = tagged.withColumn(
        unit_col_name,
        F.explode(F.sequence(F.col("__chunk") - 1, F.lit(n_folds))),
    ).filter(F.col(unit_col_name) >= 1)
    # in fold k: chunk <= k -> train, chunk == k+1 -> test. A row of
    # chunk c appears in folds c-1..n (as test in fold c-1, train in
    # the rest); the explode above generates exactly that range.
    return folds.withColumn(
        "role",
        F.when(F.col("__chunk") == F.col(unit_col_name) + 1, F.lit("test"))
        .otherwise(F.lit("train")),
    ).drop("__chunk")


def rebalance_classes(
    df: DataFrame,
    class_col: str,
    target: int | None = None,
    order_key: str | None = None,
) -> DataFrame:
    """Deterministic oversampling to class balance: every class is
    replicated up to exactly ``target`` rows (default: the majority
    class count). Row i of a class (in ``portable_scramble`` order —
    layout-independent) gets ``target // n`` copies plus one extra if
    i <= target % n, so counts land EXACTLY on target with maximal
    row diversity (no row is repeated twice more than any other),
    reproducibly — unlike sample-with-replacement, which leaves
    class sizes random AND unstable across engines.

    Classes larger than target are left as-is (use
    ``stratified_sample`` to downsample). ``order_key`` defaults to
    ``class_col``-scrambled order of the first column.

    Scale shape: class counts are one combinable aggregate broadcast
    back; the copy factor is a pure projection + bounded explode
    (factor = ceil(target/n)); the only shuffle is the per-class
    row_number window — partitioned by class, which is exactly the
    dimension being balanced (salt upstream if one class dominates
    AND needs numbering; majority classes short-circuit the window
    via the factor-1 fast path below)."""
    key = order_key or df.columns[0]
    # NULL-class rows pass through untouched: an equi-join on the
    # class key would silently DROP them (NULL never equals NULL) —
    # the same outer-row hazard safe_join guards against. They are
    # not a class to balance, but they are the caller's rows.
    null_class = df.filter(F.col(class_col).isNull())
    df = df.filter(F.col(class_col).isNotNull())
    counts = df.groupBy(class_col).agg(F.count("*").alias("__n"))
    if target is None:
        target = counts.agg(F.max("__n")).collect()[0][0]
        if target is None:
            return null_class
    tgt = F.lit(int(target))
    with_n = df.join(F.broadcast(counts), class_col)
    # fast path: classes already at/over target never enter the window
    full = with_n.filter(F.col("__n") >= tgt).drop("__n")
    minority = with_n.filter(F.col("__n") < tgt)
    w = Window.partitionBy(class_col).orderBy(
        portable_scramble(key), F.col(key)
    )
    ranked = minority.withColumn("__rn", F.row_number().over(w))
    copies = (tgt / F.col("__n")).cast("long") + F.when(
        F.col("__rn") <= F.pmod(tgt, F.col("__n")), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        ranked.withColumn("__c", copies)
        .withColumn("__i", F.explode(F.sequence(F.lit(1), F.col("__c"))))
        .drop("__n", "__rn", "__c", "__i")
        .unionByName(full)
        .unionByName(null_class)
    )


def sample_negatives(
    anchors: DataFrame,
    anchor_col: str,
    pool: DataFrame,
    item_col: str,
    k: int,
    positives: DataFrame | None = None,
) -> DataFrame:
    """Deterministic negative sampling for contrastive/embedding
    training: for every distinct anchor, pick ``k`` pseudo-random
    items from the pool — reproducibly (a pure function of the ids:
    re-runs, repartitions and other engines agree), with NO
    anchor×pool cross join anywhere.

    Shape: the pool gets its exact global index once
    (operators/order.py:global_row_index — two-phase, no unkeyed
    window); each anchor explodes to k probe rows whose pool index
    is the NON-LINEAR ``portable_scramble`` of (anchor·131 +
    probe_no) mod pool size — the scramble (not the affine Lehmer
    bucket) because the affine step is order-preserving: under it
    one anchor's k probes form a fixed-stride arithmetic progression
    over the pool index and adjacent anchors receive translated
    copies of the same pattern (correlated negative sets). Negatives
    arrive via ONE equi-join on the index; anchor==negative pairs
    are always removed (an item is never its own negative).
    ``positives`` (anchor,
    item pairs — pass columns named like ``anchor_col``/``item_col``)
    are removed with a LEFT ANTI hash join. Probe collisions and
    removed positives mean a group can come back with FEWER than k
    negatives (documented; loop callers re-probe with k' > k rather
    than this operator guessing). Integer anchor/item keys (the
    portable hash domain — hash strings to ids upstream).

    Returns (anchor, negative) distinct pairs."""
    from pipeline_dataengineer_spark.operators.order import (
        global_row_index,
    )

    pool_idx = global_row_index(
        pool.select(F.col(item_col)).distinct(), [item_col], "__idx"
    )
    n = pool_idx.count()
    if n == 0:
        raise ValueError("sample_negatives: empty pool")
    a = anchors.select(F.col(anchor_col)).distinct()
    probes = a.select(
        anchor_col,
        F.explode(
            F.array(*[F.lit(i) for i in range(k)])
        ).alias("__i"),
    ).select(
        anchor_col,
        F.pmod(
            portable_scramble(
                F.col(anchor_col).cast("long") * 131 + F.col("__i")
            ),
            F.lit(n),
        ).alias("__idx"),
    )
    cand = (
        probes.join(pool_idx, "__idx")
        .select(
            F.col(anchor_col),
            F.col(item_col).alias("negative"),
        )
        .filter(
            ~F.col(anchor_col).cast("long").eqNullSafe(
                F.col("negative").cast("long")
            )
        )
        .distinct()
    )
    if positives is not None:
        pos = positives.select(
            F.col(anchor_col),
            F.col(item_col).alias("negative"),
        )
        cand = cand.join(pos, [anchor_col, "negative"], "left_anti")
    return cand


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    weights: dict[str, float],
    id_a: str = "id_a",
    id_b: str = "id_b",
    buckets: int = 1_000_000,
) -> DataFrame:
    """``hash_split`` whose unit of assignment is the NEAR-DUP
    CLUSTER, not the row — the contamination control a train/val
    split needs after any near-dup detector has run: if doc A (train)
    and its near-duplicate B (val) straddle the split, the eval set
    is contaminated and the val loss is fiction. Splitting on the
    cluster root makes straddling impossible by construction.

    ``pairs`` is any (id_a, id_b) near-dup pair set (minhash LSH,
    simhash, embedding cosine, the exact prefix-filter join — all of
    this module's detectors emit that shape). Roots come from
    ``connected_components`` (min reachable id, deterministic);
    unpaired rows are their own root. The split is then the portable
    hash bucket of the root — stable across runs, engines, layouts,
    and incremental corpus rebuilds, exactly like ``hash_split``.

    Scale shape: components run on the PAIR set (tiny next to the
    corpus — near-dup pairs, not rows), one equi-join attaches roots
    to the corpus, and the split itself is a narrow projection that
    rides the scan. Returns ``df`` + (``root``, ``split``).

    INTEGER ids only (same contract as ``portable_bucket``, whose
    cross-engine SQL twin is integer arithmetic): a string doc id
    would silently cast to NULL roots, so non-integral id types
    raise here instead. Map string ids through a key table first.

    Reference parity: composes the same public building blocks the
    engine already verifies one by one (connected_components oracled
    by closed form; hash_split oracled via bucket_sql)."""
    from pyspark.sql import types as T

    from pipeline_dataengineer_spark.operators.graph import (
        connected_components,
    )

    id_type = df.schema[id_col].dataType
    if not isinstance(
        id_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        raise ValueError(
            "leakage_safe_split: integer id column required (got "
            f"{id_type.simpleString()} for {id_col!r}); the cluster "
            "root feeds portable_bucket, whose engine-portable twin "
            "is integer arithmetic. Map string ids via a key table."
        )
    comps = connected_components(pairs, src=id_a, dst=id_b)
    joined = df.join(
        comps.withColumnRenamed("node", id_col),
        id_col,
        "left",
    )
    rooted = joined.withColumn(
        "root",
        F.coalesce(F.col("component"), F.col(id_col).cast("long")),
    ).drop("component")
    return hash_split(rooted, "root", weights, buckets)


def split_contamination_report(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    split_col: str = "split",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """The AUDIT for ``leakage_safe_split``'s guarantee (and the
    indictment of a row-hashed split): count near-dup pairs by the
    (unordered) pair of splits their endpoints landed in. Off-diagonal
    rows are eval contamination — doc A trains while its near-dup B
    evaluates. Run it after ANY split of a deduplicated corpus; a
    leakage-safe split yields an empty off-diagonal by construction,
    a plain row-hash split does not.

    Scale shape: two equi-joins attach endpoint splits to the PAIR
    set (pair-sized, tiny next to the corpus), then one pair-sized
    groupBy; the corpus itself is scanned once per side and never
    shuffled beyond the join. Returns (split_a, split_b, n_pairs)
    with split_a <= split_b.

    Endpoints absent from ``df`` are NOT dropped (round-9 ADVICE: an
    audit that silently undercounts contamination when ``df`` covers
    only one split's rows fails in the worst direction) — the joins
    are LEFT joins from the pair set, and a pair with any unmatched
    endpoint surfaces under split ``"__missing__"``. A matched row
    whose split value is NULL surfaces as ``"__null__"`` instead
    (round-10 ADVICE: a join miss and a present-but-unlabeled row
    are different data defects; conflating them hides whichever one
    you went looking for). Both are RESERVED labels: a corpus whose
    split column actually contains either string is indistinguishable
    from the defect it names — rename such splits before auditing.
    Both sort into the off-diagonal like any other mismatch. The
    split columns are cast to STRING for the labels, so (split_a,
    split_b) are string labels and the least/greatest canonical
    ordering is lexicographic — splits are categorical names, never
    quantities, so only the unordered PAIR identity matters."""
    a = df.select(
        F.col(id_col).alias(id_a),
        F.col(split_col).alias("__sa"),
        F.lit(True).alias("__ma"),
    )
    b = df.select(
        F.col(id_col).alias(id_b),
        F.col(split_col).alias("__sb"),
        F.lit(True).alias("__mb"),
    )
    j = pairs.join(a, id_a, "left").join(b, id_b, "left")
    # match marker, not coalesce-on-split: NULL __ma can ONLY mean the
    # join missed, while a NULL split on a matched row is its own bug
    sa = F.when(
        F.col("__ma").isNull(), F.lit("__missing__")
    ).otherwise(F.coalesce(F.col("__sa").cast("string"), F.lit("__null__")))
    sb = F.when(
        F.col("__mb").isNull(), F.lit("__missing__")
    ).otherwise(F.coalesce(F.col("__sb").cast("string"), F.lit("__null__")))
    lo = F.least(sa, sb)
    hi = F.greatest(sa, sb)
    return j.groupBy(lo.alias("split_a"), hi.alias("split_b")).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
