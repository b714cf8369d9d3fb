"""SparkSession factory tuned for this engine.

Mirrors the role of the reference's session builder
(``src/spark_pgsql/spark_streaming.py:17-29``) minus the Kafka/JDBC
jar resolution (the test datasets are parquet). Designed for a real
multi-executor cluster — locally it runs ``local[N]``.

Scale posture: AQE on (runtime coalesce + skew-join handling),
shuffle partitions sized to the parallelism actually available
instead of the 200 default, UTC session timezone so timestamp
semantics match the DuckDB oracle, Arrow enabled for the
Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    """Local parallelism: $SPARK_GRAFT_CPUS, else machine cores."""
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "pipeline-dataengineer-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    **extra_conf: str,
) -> SparkSession:
    """Build (or reuse) a tuned SparkSession.

    On a real cluster the ``master`` comes from spark-submit; here we
    default to ``local[cpus]``. Every config below is equally valid at
    1000-executor scale except the master itself.
    """
    cpus = cpus or default_parallelism()
    # $SPARK_GRAFT_SHUFFLE_PARTITIONS overrides the cores-sized
    # default: sizing shuffles to local parallelism is right at bench
    # scale, but a fixed-partition-count shuffle grows per-partition
    # bytes linearly with the data — the round-10 sf10 spot tier
    # measured q_tpch_q21_shape at 19.7x for 10x data with 32
    # partitions (~2M lineitem rows each, spilling) vs ~linear once
    # partitions scale with input. On a real cluster this is
    # tune_for_scale's job; the env knob is the local equivalent.
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "0")
    ) or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # AQE: runtime partition coalescing + skew-join splitting. At
        # 100 TB this is what keeps a statically mis-sized shuffle from
        # becoming stragglers.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Size shuffles to actual parallelism, not the 200 default.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow transfer for pandas UDF / createDataFrame(pandas).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    for k, v in extra_conf.items():
        builder = builder.config(k.replace("__", "."), v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_for_scale(spark: SparkSession, target_rows: int | None = None) -> None:
    """Re-size shuffle partitions for a known workload size.

    Rule of thumb: aim for 64-256 MB per shuffle partition. With AQE's
    coalescing enabled the static number only needs to be an upper
    bound, so err high for big inputs.
    """
    if target_rows is not None:
        # ~100 bytes/row heuristic, 128 MB per partition target.
        parts = max(default_parallelism(), target_rows * 100 // (128 << 20))
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
