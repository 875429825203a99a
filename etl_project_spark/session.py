"""SparkSession factory with the engine's standard configuration.

The reference pins every timestamp to naive UTC (tz stripped at
/root/reference/dags/airflow_dags.py:45-48); we reproduce that convention
with a UTC session timezone and TIMESTAMP_NTZ columns.

Scale posture: AQE on (runtime coalescing + skew-join splitting), explicit
shuffle partitioning sized for the local harness but overridable for a real
cluster, Arrow enabled for the pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Session-settable confs every query needs regardless of who built the
# SparkSession (the driver's verify harness builds its own). Applied by
# ``prepare(spark)`` at query time, defensively.
_RUNTIME_CONFS = {
    # naive-UTC convention (SURVEY.md §1): deterministic timestamp maths.
    "spark.sql.session.timeZone": "UTC",
    # the driver testdata's events.parquet stores TIMESTAMP(NANOS) which
    # Spark's vectorized reader rejects; read as long-nanos and convert
    # (see catalog.load_table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # AQE: runtime shuffle coalescing + skew-join handling.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow transfer for the few pandas-UDF operators.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def prepare(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally-built session."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — get_spark sets it at build time
    return spark


def get_spark(
    app_name: str = "etl-project-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Defaults target the local[32] harness; on a real cluster pass
    ``master=None`` with spark-submit-provided master and raise
    ``shuffle_partitions`` to ~2-3x total cores (or rely on AQE coalescing
    from a high initial value).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Whole-stage codegen emits one class per query shape; a session
        # running many distinct queries fills the JVM's default 240MB JIT
        # code cache, after which generated code runs INTERPRETED (10-20x
        # slowdowns on random queries). Size it for a query-diverse
        # workload and let the sweeper evict cold code.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        # split wide scans finer than the 128MB default so local[32]
        # parallelizes small test files; harmless at scale (AQE coalesces).
        .config("spark.sql.files.maxPartitionBytes", "64m")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return prepare(builder.getOrCreate())
