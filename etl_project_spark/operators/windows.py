"""Window-function operators (ranking, offsets, running/moving frames).

Not present in the reference (SURVEY.md §2g: "no window functions") —
shipped under the phase-3 extension mandate; these are what the
reference's dashboard queries become once per-coin tables unify into one
keyed table.

Scale: every window here partitions by a high-cardinality key (user_id /
n_nationkey), so the sort is per-partition-local after one hash shuffle —
no global sort. Skewed keys are handled by AQE; for pathological keys,
pre-aggregate or salt before ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_project_spark.catalog import load_table
from etl_project_spark.registry import register


@register(
    "w1_topn_per_key",
    oracle="""
    SELECT user_id, event_id, value, rn FROM (
        SELECT user_id, event_id, value,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY value DESC, event_id
               ) AS rn
        FROM events
    ) WHERE rn <= 3
    """,
)
def w1_topn_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events per user by value — row_number + filter. Catalyst
    rewrites rank-limit windows into a per-partition top-k (WindowGroupLimit)
    so only 3 rows per key survive the shuffle."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.select("user_id", "event_id", "value", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "w2_lag_delta",
    oracle="""
    SELECT user_id, event_id, value,
           value - LAG(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS delta
    FROM events
    """,
)
def w2_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user value delta vs previous event (LAG) — the bar-to-bar price
    change the reference's dashboard implies."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@register(
    "w3_running_sum",
    oracle="""
    SELECT user_id, event_id, ts,
           CAST(SUM(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_value
    FROM events
    """,
)
def w3_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running cumulative value per user (cumulative volume curve)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id", "event_id", "ts", F.sum("value").over(w).alias("running_value")
    )


@register(
    "w4_rank_in_group",
    oracle="""
    SELECT n_nationkey, s_suppkey, s_acctbal,
           RANK() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS bal_rank,
           DENSE_RANK() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS bal_dense_rank
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    """,
)
def w4_rank_in_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK / DENSE_RANK within dimension groups, over a broadcast join."""
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    joined = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    )
    w = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"))
    return joined.select(
        "n_nationkey",
        "s_suppkey",
        "s_acctbal",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
    )


@register(
    "w6_distribution",
    oracle="""
    SELECT s_suppkey, s_nationkey,
           NTILE(4) OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
)
def w6_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (NTILE / PERCENT_RANK / CUME_DIST)
    per nation — account-balance quartiling. The s_suppkey tiebreak makes
    ntile assignment deterministic across engines."""
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey")
    )
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "w5_moving_avg",
    oracle="""
    SELECT user_id, event_id, ts,
           AVG(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
           ) AS ma5
    FROM events
    """,
)
def w5_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-row trailing moving average per user — the smoothed price line of
    the reference dashboard."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-4, 0)
    return ev.select(
        "user_id", "event_id", "ts", F.avg("value").over(w).alias("ma5")
    )


@register(
    "w7_running_drawdown",
    oracle="""
    SELECT user_id, event_id, ts, value,
           MAX(value) OVER w AS run_max,
           ROUND((MAX(value) OVER w - value)
                 / NULLIF(MAX(value) OVER w, 0), 6) AS drawdown
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def w7_running_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-peak drawdown per user — the monitoring curve every
    metric dashboard draws (how far the current value sits below the
    best seen so far): running MAX over the (ts, event_id)-ordered
    stream, drawdown = (peak − value)/peak rounded to 6dp (one IEEE
    division over exact window maxima; NULLIF guards a zero peak
    identically in both engines). Nested-window composition the w1–w6
    family doesn't cover: an aggregate window feeding row-level
    arithmetic against its own input."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run_max = F.max("value").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        run_max.alias("run_max"),
        F.round(
            (run_max - F.col("value"))
            / F.nullif(run_max, F.lit(0)),
            6,
        ).alias("drawdown"),
    )


@register(
    "w8_range_frame_trailing_hour",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS t_us, value
        FROM events
    )
    SELECT user_id, event_id, t_us,
           CAST(COUNT(value) OVER w AS BIGINT) AS trailing_1h_n,
           ROUND(SUM(value) OVER w, 6) AS trailing_1h_sum
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY t_us
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def w8_range_frame_trailing_hour(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TIME-based trailing window via a RANGE frame — the window-frame
    surface w1-w7 don't touch (they are all ROWS frames): per user,
    the count and sum of values in the trailing hour of EVENT TIME,
    however many rows that is. ROWS frames answer "last k events";
    RANGE frames answer "last hour" — rate limiting, rolling exposure,
    trailing-volume features all need the latter, and Spark plans it
    as a RangeFrame inside the same WindowExec (no self-join, no
    explode-per-event). Ordering is epoch MICROSECONDS (long), so the
    frame bound is the exact integer 3.6e9 in both engines and RANGE
    peer semantics (all rows with equal order value join the frame)
    agree by the SQL standard.

    Shape: one hash shuffle on user_id + per-partition sort — w3's
    exact plan class with a RangeFrame instead of a RowFrame. The sum
    is ROUND(·, 6): the frame's value SET is identical in both
    engines, so only ulp-scale addition-order noise is absorbed."""
    ev = load_table(spark, sf_dir, "events")
    t_us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "user_id", "event_id", t_us.alias("t_us"), "value"
    ).select(
        "user_id",
        "event_id",
        "t_us",
        F.count("value").over(w).alias("trailing_1h_n"),
        F.round(F.sum("value").over(w), 6).alias("trailing_1h_sum"),
    )
