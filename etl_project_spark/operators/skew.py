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


SK3_TARGET_PARTITIONS = 32  # reducer count the salt hint is sized for


@register(
    "sk3_skew_profile",
    oracle=f"""
    WITH ev AS (
        SELECT CAST(user_id AS VARCHAR) AS k FROM events
    ), oc AS (
        SELECT CAST(o_custkey AS VARCHAR) AS k FROM orders
    ), lo AS (
        SELECT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem
    ), prof AS (
        SELECT 'events.user_id' AS relation, k FROM ev
        UNION ALL SELECT 'orders.o_custkey', k FROM oc
        UNION ALL SELECT 'lineitem.l_orderkey', k FROM lo
    ), kc AS (
        SELECT relation, k, COUNT(*) AS c FROM prof GROUP BY relation, k
    )
    SELECT relation,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(MAX(c) AS BIGINT) AS max_key_count,
           ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS max_share,
           ROUND(CASE WHEN COUNT(*) = 1 THEN 1.0 ELSE
               (LN(CAST(SUM(c) AS DOUBLE))
                - SUM(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE)))
                  / CAST(SUM(c) AS DOUBLE))
               / LN(CAST(COUNT(*) AS DOUBLE)) END, 6) AS norm_entropy,
           ROUND(CAST(MAX(c) AS DOUBLE) * COUNT(*) / SUM(c), 6)
               AS skew_ratio,
           CAST(LEAST(CEIL(CAST(MAX(c) AS DOUBLE)
                           / GREATEST(CAST(SUM(c) AS DOUBLE)
                                      / {SK3_TARGET_PARTITIONS}, 1.0)),
                      {SK3_TARGET_PARTITIONS}) AS BIGINT) AS n_salts_hint
    FROM kc
    GROUP BY relation
    """,
)
def sk3_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/group-key SKEW PROFILE — the diagnostic that decides whether
    a key needs sk1/sk2's salting (or AQE's skew split) before a 100 TB
    shuffle, run here over the three hottest keys in the schema
    (``events.user_id``, ``orders.o_custkey``, ``lineitem.l_orderkey``).
    Per key: row/key cardinalities, the heaviest key's count and share,
    normalized Shannon entropy of the key distribution (1.0 = uniform,
    → 0 = one key dominates; computed via the aggregate identity
    H = ln(n) − (Σ c·ln c)/n so NO per-key share window is needed —
    a constant-partition window would drag the whole key relation to
    one reducer), skew_ratio
    = max_count / mean_count (how many average keys the hottest key
    weighs), and n_salts_hint = ceil(max_count / ideal_reducer_rows)
    capped at the reducer count — the salt factor that levels the
    hottest key across {SK3_TARGET_PARTITIONS} reducers.

    Shape: per profiled key ONE groupBy(key).count() with map-side
    combine (the same exchange the real join/agg would pay — profiling
    costs nothing extra in shuffle shape), then an O(|keys|) summary
    aggregate to ONE row; output is O(profiled keys). At 100 TB the
    exact pass swaps for tx12's Misra-Gries heavy hitters + a8's HLL
    key count on a sample — same output schema, sketch inputs. Engine
    parity: counts and ratios are exact-integer arithmetic in doubles;
    the entropy ln-term sum rounds at 6dp (lm2/dq3 rule); the CASE
    guards n_keys=1 where ln(n_keys)=0 would divide by zero.
    """
    tables = [
        ("events.user_id", "events", "user_id"),
        ("orders.o_custkey", "orders", "o_custkey"),
        ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
    ]
    outs = []
    for label, table, col in tables:
        kc = (
            load_table(spark, sf_dir, table)
            .select(F.col(col).cast("string").alias("k"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        outs.append(
            kc.select(
                F.col("c"),
                (F.col("c").cast("double") * F.log(F.col("c").cast("double")))
                .alias("clnc"),
            )
            .agg(
                F.sum("c").cast("long").alias("n_rows"),
                F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.max("c").cast("long").alias("max_key_count"),
                F.round(F.max("c").cast("double") / F.sum("c"), 6).alias(
                    "max_share"
                ),
                F.round(
                    F.when(F.count(F.lit(1)) == 1, F.lit(1.0)).otherwise(
                        (
                            F.log(F.sum("c").cast("double"))
                            - F.sum("clnc") / F.sum("c").cast("double")
                        )
                        / F.log(F.count(F.lit(1)).cast("double"))
                    ),
                    6,
                ).alias("norm_entropy"),
                F.round(
                    F.max("c").cast("double") * F.count(F.lit(1)) / F.sum("c"),
                    6,
                ).alias("skew_ratio"),
                F.least(
                    F.ceil(
                        F.max("c").cast("double")
                        / F.greatest(
                            F.sum("c").cast("double") / SK3_TARGET_PARTITIONS,
                            F.lit(1.0),
                        )
                    ),
                    F.lit(SK3_TARGET_PARTITIONS).cast("long"),
                )
                .cast("long")
                .alias("n_salts_hint"),
            )
            .select(F.lit(label).alias("relation"), "*")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
