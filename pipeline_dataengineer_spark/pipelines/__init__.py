"""End-to-end pipeline compositions (the reference's dataflows,
re-expressed as reusable Spark plans)."""

from pipeline_dataengineer_spark.pipelines.recall_ingest import (
    RECALL_COLUMNS,
    recall_schema,
    parse_json_records,
    transform_recall_records,
    ingest_batch,
)

__all__ = [
    "RECALL_COLUMNS",
    "recall_schema",
    "parse_json_records",
    "transform_recall_records",
    "ingest_batch",
]
