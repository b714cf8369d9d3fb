"""Vector math over ``ArrayType(FloatType)`` embedding columns.

All JVM-side via higher-order functions (``zip_with`` +
``aggregate``) — no Python UDF in the hot path. At 100 TB the
embedding column stays columnar in Tungsten and the dot products run
inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Elementwise product then sum — `zip_with` + `aggregate`.
    Accumulate in DOUBLE to avoid float32 error buildup."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a, b); NULL-safe on zero vectors (returns NULL, not NaN)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


def random_projection(
    vec: Column | str, in_dim: int, out_dim: int, seed: int = 1
) -> Column:
    """Johnson-Lindenstrauss dimensionality reduction as a PURE
    codegen expression: project onto ``out_dim`` deterministic ±1
    directions (Achlioptas sign matrix) and scale by 1/sqrt(out_dim).
    Distances are preserved within ~1/sqrt(out_dim) distortion — the
    cheap shrink before ANN/clustering when d is large.

    The sign matrix is a deterministic function of (seed, j, i) —
    sha256 parity, well-mixed so rows are near-orthogonal, which the
    JL distortion bound needs (a lattice-like hash gives correlated
    rows and ruins it; pytest guards the distortion band). The matrix
    is baked into the plan as literal arrays, so the SAME matrix is
    reproducible anywhere (the oracle replays it bit-for-bit) — no
    RNG, no broadcast variable, no Python at execution time. Each
    output coordinate is one zip_with multiply + left-fold sum over
    the input array, all inside whole-stage codegen."""
    signs_rows = projection_signs_sql(in_dim, out_dim, seed)
    v = _c(vec)
    scale = 1.0 / float(out_dim) ** 0.5
    outs = []
    for j in range(out_dim):
        signs = F.array(*[F.lit(s) for s in signs_rows[j]])
        acc = F.aggregate(
            F.zip_with(v, signs, lambda x, s: x * s),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        outs.append(acc * F.lit(scale))
    return F.array(*outs)


def projection_signs_sql(in_dim: int, out_dim: int, seed: int = 1) -> list[list[float]]:
    """The sign matrix as plain Python lists — the single source of
    truth shared by the Spark expression and any oracle replay."""
    import hashlib

    def sign(j: int, i: int) -> float:
        h = hashlib.sha256(f"{seed}:{j}:{i}".encode()).digest()[0]
        return 1.0 if h % 2 == 0 else -1.0

    return [[sign(j, i) for i in range(in_dim)] for j in range(out_dim)]
