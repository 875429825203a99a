"""Skew-handling operators: salted aggregation and salted joins.

The reference never needed these (≤864 rows/day, SURVEY.md §6); at
100 TB a handful of hot keys (one viral document, one dominant user)
routinely overwhelms single reducers. Two standard remedies, expressed
so results are bit-identical to the unsalted plans (verified by the
DuckDB oracle / equivalence tests):

- **salted two-phase aggregation** — append a random-ish salt to the
  group key, partially aggregate on (key, salt) so the hot key's rows
  spread over N reducers, then aggregate again on key alone. Works for
  any algebraic aggregate (sum/count/min/max; avg = sum+count pair).
- **salted broadcast replication join** (for when AQE's skew-join split
  isn't available, e.g. deliberately bucketed layouts): replicate the
  small side N× with salt ids, scatter the big side uniformly.

AQE (`spark.sql.adaptive.skewJoin.enabled`, on in session.py) already
splits skewed sort-merge partitions at runtime; these operators are for
aggregation skew and for engines/layouts where AQE can't see the skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_project_spark.catalog import load_table
from etl_project_spark.registry import register

N_SALTS = 16


def _salt(n_salts: int = N_SALTS) -> Column:
    """Deterministic per-row salt (hash of the row's id-ish columns would
    also do; monotonically_increasing_id keeps it cheap and uniform
    within partitions without an RNG, so reruns are stable)."""
    return (F.monotonically_increasing_id() % n_salts).alias("salt")


def salted_sum_count(
    df: DataFrame, key: str, value: str, n_salts: int = N_SALTS
) -> DataFrame:
    """Two-phase salted SUM/COUNT per key: (key, salt) partial → key final.

    Phase 1's shuffle spreads each hot key over ``n_salts`` reducers;
    phase 2 shuffles only |keys|·n_salts pre-aggregated rows. Results are
    exactly the single-phase groupBy's (sum/count are associative)."""
    partial = (
        df.select(F.col(key), F.col(value), _salt(n_salts))
        .groupBy(key, "salt")
        .agg(F.sum(value).alias("_s"), F.count("*").alias("_c"))
    )
    return partial.groupBy(key).agg(
        F.sum("_s").alias("sum_value"), F.sum("_c").alias("n_rows")
    )


@register(
    "sk1_salted_agg",
    oracle="""
    SELECT user_id, CAST(SUM(value) AS DOUBLE) AS sum_value,
           COUNT(*) AS n_rows
    FROM events GROUP BY user_id
    """,
)
def sk1_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation over events.user_id — hash-identical
    to the plain GROUP BY (the oracle), but hot keys fan over 16 reducers
    in phase 1. The pattern to reach for when one key holds >1 partition's
    worth of rows."""
    ev = load_table(spark, sf_dir, "events")
    return salted_sum_count(ev, "user_id", "value")


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = N_SALTS,
) -> DataFrame:
    """Inner equi-join resilient to big-side key skew WITHOUT AQE:
    replicate the (broadcastable) small side across n_salts salt ids and
    scatter the big side uniformly, so one hot key's rows land on
    n_salts different tasks instead of one.

    With a broadcast small side Spark never shuffles the big side at all,
    so this form only matters when the join must shuffle (e.g. both sides
    large): then replace F.broadcast with the same salt columns on a
    shuffled join. Kept here in its broadcast form as the testable
    pattern."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn("salt", (F.monotonically_increasing_id() % n_salts))
    return big_salted.join(F.broadcast(small_rep), [key, "salt"]).drop("salt")


@register(
    "sk2_salted_join",
    oracle="""
    SELECT n.n_name AS nation_name,
           COUNT(*) AS n_customers,
           CAST(SUM(c.c_acctbal) AS DOUBLE) AS sum_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
    """,
)
def sk2_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer⋈nation through the salted-replication join (nation
    replicated 16×, customers scattered) then per-nation rollup —
    hash-identical to the plain join's result."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").withColumnRenamed(
        "n_nationkey", "c_nationkey"
    )
    joined = salted_broadcast_join(c, n, "c_nationkey")
    return joined.groupBy(F.col("n_name").alias("nation_name")).agg(
        F.count("*").alias("n_customers"),
        F.sum("c_acctbal").alias("sum_bal"),
    )
