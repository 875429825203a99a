"""Set operations and multi-dimensional aggregations (rollup / cube /
grouping sets) — absent from the reference (SURVEY.md §2g), shipped as
phase-3 core surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_project_spark.catalog import load_table
from etl_project_spark.registry import register


def _day_users(spark, sf_dir: str, day: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("ts").cast("date") == F.lit(day).cast("date")).select(
        "user_id"
    )


@register(
    "s1_union_all",
    oracle="""
    SELECT event_id, value, 'hi' AS bucket FROM events WHERE value > 90
    UNION ALL
    SELECT event_id, value, 'lo' AS bucket FROM events WHERE value < 2
    """,
)
def s1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two tagged slices — the engine's replacement for the
    reference's per-coin fan-out (SURVEY.md O3): union once, partition by
    the tag downstream."""
    ev = load_table(spark, sf_dir, "events")
    hi = ev.filter(F.col("value") > 90).select(
        "event_id", "value", F.lit("hi").alias("bucket")
    )
    lo = ev.filter(F.col("value") < 2).select(
        "event_id", "value", F.lit("lo").alias("bucket")
    )
    return hi.unionAll(lo)


@register(
    "s2_intersect",
    oracle="""
    SELECT user_id FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-10'
    INTERSECT
    SELECT user_id FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-11'
    """,
)
def s2_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): users active on both days — planned as an
    aggregate + semi join."""
    return _day_users(spark, sf_dir, "2024-01-10").intersect(
        _day_users(spark, sf_dir, "2024-01-11")
    )


@register(
    "s3_except",
    oracle="""
    SELECT user_id FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-10'
    EXCEPT
    SELECT user_id FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-11'
    """,
)
def s3_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): churned users — day-A actives absent on day B.
    ``subtract`` is EXCEPT DISTINCT (``exceptAll`` would keep surplus
    duplicate occurrences, the wrong semantics here)."""
    return _day_users(spark, sf_dir, "2024-01-10").subtract(
        _day_users(spark, sf_dir, "2024-01-11")
    )


@register(
    "s4_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def s4_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals (flag → flag+status → grand total) in
    one pass via Expand — no repeated scans."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"), F.count("*").alias("n_rows")
    )


@register(
    "s6_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(l_extendedprice) AS DOUBLE) AS sum_price,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def s6_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (per-flag and per-status subtotals, no
    cross) — one Expand + single aggregate, the general form rollup/cube
    specialize."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"]], "l_returnflag", "l_linestatus"
    ).agg(F.sum("l_extendedprice").alias("sum_price"), F.count("*").alias("n_rows"))


@register(
    "s7_pivot",
    oracle="""
    SELECT user_id % 10 AS user_mod,
           CAST(SUM(CASE WHEN event_type = 'click'    THEN value END) AS DOUBLE) AS click,
           CAST(SUM(CASE WHEN event_type = 'error'    THEN value END) AS DOUBLE) AS error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN value END) AS DOUBLE) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup'   THEN value END) AS DOUBLE) AS signup,
           CAST(SUM(CASE WHEN event_type = 'view'     THEN value END) AS DOUBLE) AS view
    FROM events GROUP BY 1
    """,
)
def s7_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT event_type into columns (the dashboard's per-category matrix).
    Values are enumerated explicitly — at scale an un-enumerated pivot
    costs an extra distinct-values job and an unbounded column count."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("user_mod", F.col("user_id") % 10)
        .groupBy("user_mod")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .sum("value")
    )


@register(
    "s5_cube",
    oracle="""
    SELECT event_type, user_id % 10 AS user_mod,
           CAST(SUM(value) AS DOUBLE) AS sum_value,
           COUNT(*) AS n_rows
    FROM events GROUP BY CUBE (event_type, user_id % 10)
    """,
)
def s5_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions — all 4 grouping combinations in one
    Expand + hash aggregate."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("user_mod", F.col("user_id") % 10)
        .cube("event_type", "user_mod")
        .agg(F.sum("value").alias("sum_value"), F.count("*").alias("n_rows"))
    )
