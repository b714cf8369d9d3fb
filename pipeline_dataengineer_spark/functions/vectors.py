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
