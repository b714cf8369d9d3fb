"""Column-function library (all JVM-side built-ins unless noted)."""

from pipeline_dataengineer_spark.functions.text import (
    strip_accents,
    merge_columns,
    split_commercialisation_dates,
    normalize_empty_to_null,
)
from pipeline_dataengineer_spark.functions.dates import (
    max_date_minus,
    high_water_mark,
)
from pipeline_dataengineer_spark.functions.vectors import (
    dot,
    l2_norm,
    cosine_similarity,
)

__all__ = [
    "strip_accents",
    "merge_columns",
    "split_commercialisation_dates",
    "normalize_empty_to_null",
    "max_date_minus",
    "high_water_mark",
    "dot",
    "l2_norm",
    "cosine_similarity",
]
