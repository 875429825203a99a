"""etl_project_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ETL pipeline (abrook7/ETL_Project: Airflow → Postgres → S3 →
Redshift crypto-OHLCV pipeline), re-expressed Spark-first:

- the reference's dataflow (REST ingest → normalize → append → daily
  export → warehouse) becomes batch/streaming DataFrame programs over
  partitioned Parquet (``etl_project_spark.ingest``, ``.sources``,
  ``.streaming``);
- the reference's query surface (projections, date filters, global and
  grouped aggregates, top-k — /root/reference/sql/Redshift_queries.sql:1-24
  and the QuickSight dashboard aggregations) becomes declarative DataFrame
  queries optimized by Catalyst (``etl_project_spark.operators``);
- beyond the reference, large-scale training-data-pipeline operators:
  deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard),
  similarity search over embeddings, text analysis, and multimodal column
  plumbing.

Design rules (see SURVEY.md §7): DataFrame/SQL only, no RDDs; built-in
``pyspark.sql.functions`` in the hot path; Pandas UDFs only where built-ins
cannot express the semantics; every operator designed for a multi-executor
cluster (broadcast small dims, partition-prune on date keys, AQE on).
"""

from etl_project_spark.session import get_spark
from etl_project_spark.catalog import load_table, register_views

__all__ = ["get_spark", "load_table", "register_views"]

__version__ = "0.1.0"
