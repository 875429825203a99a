"""Table loading + view registration over the driver's Parquet corpus.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one Parquet file per table under
``{sf_dir}/{name}.parquet``.

The one physical quirk handled here: ``events.parquet`` stores its ``ts``
column as Parquet TIMESTAMP(NANOS), which Spark's Parquet reader rejects
outright ([PARQUET_TYPE_ILLEGAL]). With
``spark.sql.legacy.parquet.nanosAsLong=true`` the column arrives as a
long of nanoseconds-since-epoch; we convert with integer division (``div
1000`` — float division would lose precision: 2024 epoch-nanos ≈ 1.7e18 >
2^53) into a TIMESTAMP_NTZ, matching DuckDB's microsecond truncation of the
same file so oracle hashes agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_project_spark.session import prepare

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# (sf_dir, name) -> analyzed DataFrame, valid for one Spark application.
# Re-reading the same parquet re-lists the directory and re-reads the
# footer schema on every load; memoizing the *DataFrame* (a logical plan,
# not data) makes repeated loads free while every action still scans
# storage. Keyed by applicationId — not id(spark), which CPython can
# recycle after a stopped session is collected — and cleared whenever the
# application changes so plans bound to dead sessions are never returned
# (and never pinned for process lifetime).
_df_cache: dict[tuple[str, str], DataFrame] = {}
_cache_app_id: str | None = None


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one corpus table, normalizing physical-type quirks."""
    global _cache_app_id
    app_id = spark.sparkContext.applicationId
    if app_id != _cache_app_id:
        _df_cache.clear()
        _cache_app_id = app_id
    key = (sf_dir, name)
    cached = _df_cache.get(key)
    if cached is not None:
        return cached
    prepare(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # long nanos -> naive-UTC microsecond timestamp (floor, like DuckDB)
        df = df.withColumn(
            "ts", F.expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)")
        )
    _df_cache[key] = df
    return df


def table_fingerprint(sf_dir: str, name: str) -> tuple:
    """A cheap identity of one table's bytes on disk: (path, mtime_ns,
    size) per file under the parquet path. Derived-state memo caches
    (k-means Lloyd state, BPE merges) key on this alongside sf_dir so a
    regenerated fixture under the same path invalidates them instead of
    serving stale models (r4 advice); costs one stat() per file, no
    reads."""
    import os

    p = f"{sf_dir}/{name}.parquet"
    if os.path.isdir(p):
        files = sorted(
            os.path.join(p, f) for f in os.listdir(p) if not f.startswith("_")
        )
    else:
        files = [p]
    out = []
    for f in files:
        st = os.stat(f)
        out.append((f, st.st_mtime_ns, st.st_size))
    return tuple(out)


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register each corpus table as a temp view for spark.sql queries."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
