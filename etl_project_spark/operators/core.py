"""Reference query surface: projections, filters, aggregates, top-k.

Re-expresses every relational operator the reference runs in
Postgres/Redshift (SURVEY.md §2c-2e) over the driver corpus. The
reference's time-series bar table maps onto ``events`` (ts ≙
time_period_start, value ≙ volume_traded, user_id ≙ coin key); see
FIXTURES.md.

Reference sites cited per query:
- P1/P2 projections  — /root/reference/sql/Redshift_queries.sql:2-3,12-15
- F1/F2 date filters — /root/reference/dags/airflow_dags.py:64,
                       /root/reference/sql/Redshift_queries.sql:9
- A1 count / A2 max-min — /root/reference/sql/Redshift_queries.sql:6-9,21-24
- A3 daily sums — QuickSight dashboard aggregations (SURVEY.md §2d)
- T1 top-1 by volume — /root/reference/sql/Redshift_queries.sql:11-18
- T2 ordered series — dashboard line chart (SURVEY.md §2e)

Scale notes: every filter here is a single scan-side predicate (pushed to
the Parquet reader — verify with ``.explain``: PushedFilters); aggregates
are partial-aggregated map-side before the shuffle; T1/topk plan as
TakeOrderedAndProject (no global sort). On a production layout the date
filters become partition pruning over ``period_date=…`` directories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_project_spark.catalog import load_table
from etl_project_spark.registry import register


# --- P: projections & scalar expressions ------------------------------------


@register(
    "p1_select_all",
    oracle="SELECT * FROM events",
)
def p1_select_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 full projection: ``SELECT * FROM bitcoin_prices``
    (Redshift_queries.sql:2-3) on events."""
    return load_table(spark, sf_dir, "events")


@register(
    "p2_projection",
    oracle="SELECT event_id, ts, value FROM events",
)
def p2_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 column-subset projection (Redshift_queries.sql:12-15). Column
    pruning reaches the scan: ReadSchema lists only these three columns."""
    return load_table(spark, sf_dir, "events").select("event_id", "ts", "value")


@register(
    "p4_derived_date",
    oracle="""
    SELECT event_id, ts, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS period_date
    FROM events
    """,
)
def p4_derived_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 derived partition-date column: ``period_date =
    date(time_period_start)`` (airflow_dags.py:49). Output as a midnight
    timestamp: DATE values round-trip to pandas differently per engine
    (datetime64 vs datetime.date), which breaks value hashing."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "ts",
        F.col("ts").cast("date").cast("timestamp_ntz").alias("period_date"),
    )


@register(
    "p3_timestamp_parse",
    oracle="""
    SELECT event_id,
           CAST(STRPTIME(ts_str, '%Y-%m-%dT%H:%M:%S.%f') AS TIMESTAMP) AS ts_parsed
    FROM (SELECT event_id, STRFTIME(ts, '%Y-%m-%dT%H:%M:%S.%f') AS ts_str
          FROM events)
    """,
)
def p3_timestamp_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 ISO8601 parse + naive-UTC convention (airflow_dags.py:45-48):
    round-trip ts through an ISO string and re-parse, as the reference does
    with the CoinAPI response timestamps."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.to_timestamp_ntz(
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
            F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
        ).alias("ts_parsed"),
    )


@register(
    "p5_json_extract",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events
    """,
)
def p5_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events payload column (the engine's
    form of the reference's API-response normalization S2 when the raw
    JSON lands in a column instead of the driver). ``get_json_object`` is
    JVM-side; for full-schema payloads use ``from_json`` with an explicit
    StructType so Catalyst can prune unused fields."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


# --- F: filters --------------------------------------------------------------


@register(
    "f1_eq_date_filter",
    oracle="SELECT * FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-15'",
)
def f1_eq_date_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 execution-date equality filter: ``WHERE period_date = '{ds}'``
    (airflow_dags.py:64) — the reference's one manual predicate pushdown;
    Catalyst pushes it to the scan for free."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("ts").cast("date") == F.lit("2024-01-15").cast("date"))


@register(
    "f2_date_arith_filter",
    oracle="SELECT * FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-30' - 1",
)
def f2_date_arith_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 date-arithmetic filter: ``WHERE period_date = current_date - 1``
    (Redshift_queries.sql:9), anchored to the corpus max date so the result
    is deterministic."""
    ev = load_table(spark, sf_dir, "events")
    anchor = F.date_sub(F.lit("2024-01-30").cast("date"), 1)
    return ev.filter(F.col("ts").cast("date") == anchor)


@register(
    "f3_categorical_filter",
    oracle="SELECT * FROM events WHERE event_type = 'purchase' AND value > 50.0",
)
def f3_categorical_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical + numeric conjunction filter (dashboard slicing);
    both predicates push to the Parquet reader."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 50.0))


# --- A: aggregations ---------------------------------------------------------


@register(
    "a1_count_yesterday",
    oracle="""
    SELECT COUNT(event_id) AS n_rows FROM events
    WHERE CAST(ts AS DATE) = DATE '2024-01-30' - 1
    """,
)
def a1_count_yesterday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 global COUNT of yesterday's rows (Redshift_queries.sql:6-9)."""
    ev = load_table(spark, sf_dir, "events")
    anchor = F.date_sub(F.lit("2024-01-30").cast("date"), 1)
    return ev.filter(F.col("ts").cast("date") == anchor).agg(
        F.count("event_id").alias("n_rows")
    )


@register(
    "a2_global_minmax",
    oracle="""
    SELECT max(value) AS max_value, min(value) AS min_value,
           CAST(sum(value) AS DOUBLE) AS sum_value,
           avg(value) AS avg_value
    FROM events
    """,
)
def a2_global_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 global multi-aggregate, no GROUP BY (Redshift_queries.sql:21-24):
    single partial-agg + 1-row final reduce; no wide shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.max("value").alias("max_value"),
        F.min("value").alias("min_value"),
        F.sum("value").alias("sum_value"),
        F.avg("value").alias("avg_value"),
    )


@register(
    "a3_daily_stats",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS period_date,
           CAST(sum(value) AS DOUBLE) AS sum_value,
           COUNT(*) AS n_events,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events GROUP BY 1
    """,
)
def a3_daily_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 dashboard daily rollup: sum/count/min/max per day (SURVEY.md §2d).
    Map-side partial aggregation bounds the shuffle at |days| keys."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.col("ts").cast("date").cast("timestamp_ntz").alias("period_date")
        )
        .agg(
            F.sum("value").alias("sum_value"),
            F.count("*").alias("n_events"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


@register(
    "a3g_keyed_daily_stats",
    oracle="""
    SELECT user_id, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS period_date,
           CAST(sum(value) AS DOUBLE) AS sum_value,
           COUNT(*) AS n_events
    FROM events GROUP BY 1, 2
    """,
)
def a3g_keyed_daily_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped variant of A3: the engine unifies the reference's
    table-per-coin (O3 fan-out) into one table with a key column, so every
    per-coin dashboard aggregate becomes a (key, day) groupBy."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id",
            F.col("ts").cast("date").cast("timestamp_ntz").alias("period_date"),
        )
        .agg(F.sum("value").alias("sum_value"), F.count("*").alias("n_events"))
    )


@register(
    "a4_distinct_agg",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events GROUP BY 1
    """,
)
def a4_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (extension beyond reference §2g): Spark plans
    count(distinct) as a two-stage expand + partial agg."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


@register(
    "a5_approx_distinct",
    oracle=None,  # approximate — no hash-equality oracle possible
    # local checker compares against the exact count within rtol instead;
    # rsd=0.01 → 3-sigma relative error ≈ 0.03
    approx_oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS approx_users
    FROM events GROUP BY 1
    """,
    rtol=0.03,
)
def a5_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — the 100 TB-scale substitute for
    exact count(distinct) (no expand, single pass, mergeable sketches)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users")
    )


# --- T: sorts / limits / top-k ----------------------------------------------


@register(
    "t1_top1_by_value",
    oracle="""
    SELECT ts, event_id, value FROM events
    ORDER BY value DESC, event_id ASC LIMIT 1
    """,
)
def t1_top1_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 highest-volume trading period (Redshift_queries.sql:11-18).
    Plans as TakeOrderedAndProject — per-partition top-1 then driver merge,
    no global sort. event_id tiebreak keeps the row deterministic."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("ts", "event_id", "value")
        .orderBy(F.desc("value"), F.asc("event_id"))
        .limit(1)
    )


@register(
    "t2_topk_by_value",
    oracle="""
    SELECT ts, event_id, value FROM events
    ORDER BY value DESC, event_id ASC LIMIT 100
    """,
)
def t2_topk_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k generalization of T1 (k=100) — still TakeOrderedAndProject:
    O(n) scan + per-partition heap, not an O(n log n) sort."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("ts", "event_id", "value")
        .orderBy(F.desc("value"), F.asc("event_id"))
        .limit(100)
    )


@register(
    "t3_ordered_series",
    oracle="SELECT ts, value FROM events WHERE user_id = 7",
)
def t3_ordered_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 time-ordered series scan feeding the dashboard line chart.
    The dashboard orders by ts; the oracle hash is order-insensitive so the
    sort is semantically free to keep."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("user_id") == 7).select("ts", "value").orderBy("ts")


# a6's skewness/kurtosis are computed from RAW POWER SUMS with one
# shared sample-corrected formula in BOTH engines, instead of each
# engine's builtin (Spark: population moments; DuckDB: bias-corrected —
# a 1+O(1/n) factor that crossed the 2dp rounding boundary at the
# sf0.001 group sizes, r6). l_quantity is small and integer-valued, so
# s1..s4 are exact in doubles and the identical op sequence yields
# identical IEEE results. (At 100 TB row counts the power sums need
# DECIMAL accumulators; quantity^4 · n approaches 2^53.)
_A6_SKEW_SQL = (
    "(((s3 / n) - 3 * (s1 / n) * (s2 / n) + 2 * POWER(s1 / n, 3))"
    " / POWER((s2 / n) - POWER(s1 / n, 2), 1.5))"
    " * SQRT(n * (n - 1.0)) / (n - 2)"
)
_A6_KURT_SQL = (
    "((n - 1.0) / ((n - 2) * (n - 3))) * ((n + 1.0) * "
    "(((s4 / n) - 4 * (s1 / n) * (s3 / n) + 6 * POWER(s1 / n, 2) * (s2 / n)"
    " - 3 * POWER(s1 / n, 4))"
    " / POWER((s2 / n) - POWER(s1 / n, 2), 2) - 3) + 6)"
)


@register(
    "a6_stat_moments",
    oracle=f"""
    WITH p AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               SUM(l_quantity) AS s1,
               SUM(POWER(l_quantity, 2)) AS s2,
               SUM(POWER(l_quantity, 3)) AS s3,
               SUM(POWER(l_quantity, 4)) AS s4,
               ROUND(CORR(l_extendedprice, l_quantity), 6) AS price_qty_corr,
               ROUND(COVAR_SAMP(l_extendedprice, l_quantity), 4)
                   AS price_qty_covar,
               ROUND(STDDEV_SAMP(l_discount), 6) AS disc_stddev,
               ROUND(VAR_SAMP(l_tax), 6) AS tax_var,
               ROUND(QUANTILE_CONT(l_quantity, 0.5), 4) AS qty_median,
               ROUND(QUANTILE_CONT(l_extendedprice, 0.9), 4) AS price_p90
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, price_qty_corr, price_qty_covar, disc_stddev,
           tax_var,
           ROUND({_A6_SKEW_SQL}, 2) + 0.0 AS qty_skew,
           ROUND({_A6_KURT_SQL}, 2) AS qty_kurt,
           qty_median, price_p90
    FROM p ORDER BY l_returnflag
    """,
)
def a6_stat_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface: correlation, covariance, stddev/
    variance, higher moments, exact interpolated percentiles — one
    hash-aggregate pass, all moments computed map-side-partial.
    Skewness/kurtosis are the SAMPLE-corrected statistics, built in
    both engines from the same exact power sums with one shared
    formula (see _A6_SKEW_SQL) — builtin skewness()/kurtosis() differ
    in bias correction between engines and the 1+O(1/n) factor crosses
    the 2dp rounding boundary on small groups. Exact percentile is a
    sort-based aggregate — at 100 TB swap in percentile_approx
    (t-digest, mergeable) and accept bounded error."""
    li = load_table(spark, sf_dir, "lineitem")
    p = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("l_quantity").alias("s1"),
        F.sum(F.pow("l_quantity", F.lit(2))).alias("s2"),
        F.sum(F.pow("l_quantity", F.lit(3))).alias("s3"),
        F.sum(F.pow("l_quantity", F.lit(4))).alias("s4"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias(
            "price_qty_corr"
        ),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 4).alias(
            "price_qty_covar"
        ),
        F.round(F.stddev_samp("l_discount"), 6).alias("disc_stddev"),
        F.round(F.var_samp("l_tax"), 6).alias("tax_var"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias(
            "qty_median"
        ),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias(
            "price_p90"
        ),
    )
    return (
        p.select(
            "l_returnflag",
            "price_qty_corr",
            "price_qty_covar",
            "disc_stddev",
            "tax_var",
            (F.round(F.expr(_A6_SKEW_SQL), 2) + 0.0).alias("qty_skew"),
            F.round(F.expr(_A6_KURT_SQL), 2).alias("qty_kurt"),
            "qty_median",
            "price_p90",
        )
        .orderBy("l_returnflag")
    )


@register(
    "a7_approx_percentile",
    approx_oracle="""
    SELECT l_returnflag,
           QUANTILE_DISC(l_extendedprice, 0.5) AS price_p50,
           QUANTILE_DISC(l_extendedprice, 0.9) AS price_p90,
           QUANTILE_DISC(l_extendedprice, 0.99) AS price_p99
    FROM lineitem
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    rtol=0.01,
)
def a7_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via percentile_approx (Greenwald-Khanna
    style sketch): the mergeable single-pass substitute for the exact
    sort-based percentile at 100 TB — partial sketches merge map-side,
    so the shuffle moves one sketch per group per task, never values.
    Checked against DuckDB's exact discrete quantiles within 1%
    (accuracy=10000 bounds rank error at 1e-4)."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = lambda q: F.expr(  # noqa: E731
        f"approx_percentile(l_extendedprice, {q}, 10000)"
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            pa(0.5).alias("price_p50"),
            pa(0.9).alias("price_p90"),
            pa(0.99).alias("price_p99"),
        )
        .orderBy("l_returnflag")
    )


@register("smp1_stratified_sample", oracle=None)  # seeded RNG — rows-only
def smp1_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling (training-data curation: rebalance a corpus by
    source/language/quality band): per-stratum Bernoulli fractions via
    sampleBy with a fixed seed — deterministic for a given seed and
    partitioning, but RNG-defined, so no SQL oracle (rows-only; the
    per-stratum rate is asserted within binomial tolerance in
    tests/test_properties.py). Executes as a scan-local filter: no
    shuffle, no collect, scales linearly."""
    docs = load_table(spark, sf_dir, "documents")
    fractions = {"src0": 0.8, "src1": 0.5, "src2": 0.25, "src3": 0.1}
    sampled = docs.sampleBy("source", fractions=fractions, seed=42)
    return sampled.groupBy("source").agg(
        F.count("*").alias("n_sampled"),
        F.countDistinct("doc_id").alias("n_unique"),
    )


_SMP2_FRACTIONS = {"src0": 0.8, "src1": 0.5, "src2": 0.25, "src3": 0.1}
# stratum keep-threshold as fixed-width lowercase hex of floor(f * 2^32):
# md5's first 8 hex chars are uniform, and lexicographic order on
# same-length lowercase hex equals numeric order, so `prefix < threshold`
# keeps each doc independently with probability f — identically in any
# engine that has md5, with no RNG anywhere.
_SMP2_THRESHOLDS = {
    s: f"{int(f * 2**32):08x}" for s, f in _SMP2_FRACTIONS.items()
}
_SMP2_SQL_CASE = "CASE source " + " ".join(
    f"WHEN '{s}' THEN '{t}'" for s, t in _SMP2_THRESHOLDS.items()
) + " END"


@register(
    "smp2_hash_stratified_sample",
    oracle=f"""
    SELECT doc_id, source FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < {_SMP2_SQL_CASE}
    """,
)
def smp2_hash_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-stratum Bernoulli via the
    md5 of the row key instead of an RNG — the production form for
    training-data curation, because the sample is REPRODUCIBLE across
    reruns, engines, partitionings, and retries (a resumed 100 TB job
    re-selects exactly the same rows). Scan-local filter: no shuffle, no
    state; exact-membership differential check (not just rate bounds)."""
    docs = load_table(spark, sf_dir, "documents")
    threshold = F.element_at(
        F.create_map(
            *[
                F.lit(x)
                for pair in _SMP2_THRESHOLDS.items()
                for x in pair
            ]
        ),
        F.col("source"),
    )
    return docs.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8) < threshold
    ).select("doc_id", "source")


@register(
    "dq1_constraint_audit",
    oracle="""
    SELECT COUNT(*) AS row_count,
           COUNT(DISTINCT o_orderkey) AS distinct_keys,
           (COUNT(*) - COUNT(DISTINCT o_orderkey)) AS dup_key_violations,
           (COUNT(*) - COUNT(o_custkey)) AS null_custkey_violations,
           -- CAST: SUM(int) -> HUGEINT in DuckDB -> pandas float64;
           -- Spark emits int64 and the driver hash needs both integral
           CAST(COALESCE(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END),
                         0) AS BIGINT)
               AS nonpositive_price_violations,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                             THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS bad_status_violations,
           MIN(o_orderdate) AS min_orderdate,
           MAX(o_orderdate) AS max_orderdate
    FROM orders
    """,
)
def dq1_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass data-quality constraint audit over ``orders`` — the
    Deequ-style validation gate a pipeline runs before promoting a load
    (the reference loads blindly; SURVEY §1 lists silent-dup and
    bad-row hazards this catches): primary-key uniqueness, foreign-key
    completeness, value-range and domain checks, and freshness bounds,
    all as ONE aggregation.

    Shape: every metric is an algebraic or sketchable aggregate, so the
    whole audit is one scan + one partial-aggregated reduce to a single
    row — adding more constraints adds columns, not passes. At 100 TB
    this is the cheapest query in the pipeline (no shuffle wider than
    one row per partition) and the natural place for a circuit breaker:
    a nonzero violation column aborts the promote step."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count("*").alias("row_count"),
        F.count_distinct(F.col("o_orderkey")).alias("distinct_keys"),
        (F.count("*") - F.count_distinct(F.col("o_orderkey"))).alias(
            "dup_key_violations"
        ),
        (F.count("*") - F.count("o_custkey")).alias("null_custkey_violations"),
        F.coalesce(
            F.sum((F.col("o_totalprice") <= 0).cast("long")), F.lit(0)
        ).alias("nonpositive_price_violations"),
        F.coalesce(
            F.sum((~F.col("o_orderstatus").isin("O", "F", "P")).cast("long")),
            F.lit(0),
        ).alias("bad_status_violations"),
        F.min("o_orderdate").alias("min_orderdate"),
        F.max("o_orderdate").alias("max_orderdate"),
    )


@register(
    "dq2_iqr_outliers",
    oracle="""
    WITH q AS (
        SELECT quantile_cont(value, 0.25) AS q1,
               quantile_cont(value, 0.75) AS q3
        FROM events
    )
    SELECT event_id, value,
           ROUND(q1 - 1.5 * (q3 - q1), 6) AS lo,
           ROUND(q3 + 1.5 * (q3 - q1), 6) AS hi
    FROM events, q
    WHERE value < q1 - 1.5 * (q3 - q1)
       OR value > q3 + 1.5 * (q3 - q1)
    """,
)
def dq2_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier quarantine: events whose value falls outside
    [q1 - 1.5*IQR, q3 + 1.5*IQR] — the standard distribution-based
    data-quality screen run alongside dq1's constraint audit (dq1
    catches rule violations; this catches plausible-looking garbage).

    Shape: one exact-percentile aggregate (a single 1-row reduce; both
    engines use linear interpolation so the fences agree bit-for-bit on
    this corpus), broadcast back over one filtering scan. At 100 TB the
    exact percentile becomes approx_percentile on a mergeable sketch
    (a7) and the fence check stays a scan-local filter — the quarantine
    never shuffles the fact table."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.agg(
        F.percentile("value", F.lit(0.25)).alias("q1"),
        F.percentile("value", F.lit(0.75)).alias("q3"),
    )
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    return (
        ev.crossJoin(F.broadcast(q))
        .filter((F.col("value") < lo) | (F.col("value") > hi))
        .select(
            "event_id",
            "value",
            F.round(lo, 6).alias("lo"),
            F.round(hi, 6).alias("hi"),
        )
    )


# train/val/test assignment: first 8 md5 hex chars of the key, split at
# 90% / 95% of the 32-bit hex space (same deterministic-hash family as
# smp2 — reproducible across engines, reruns, and partitionings)
_SPLIT_TRAIN_MAX = f"{int(0.90 * 16**8):08x}"
_SPLIT_VAL_MAX = f"{int(0.95 * 16**8):08x}"


@register(
    "smp3_train_val_test",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                     < '{_SPLIT_TRAIN_MAX}' THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                     < '{_SPLIT_VAL_MAX}' THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def smp3_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment by hashing the
    stable row key — the split rule a training pipeline must use so (a)
    every rerun/engine/partitioning assigns identically, (b) membership
    is decidable per row with no global state, and (c) adding documents
    never moves an existing one across splits (no leakage from val to
    train on corpus growth). Scan-local projection: no shuffle, no RNG.
    Exact-membership differential check, same contract as smp2."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    return docs.select(
        "doc_id",
        F.when(h < _SPLIT_TRAIN_MAX, "train")
        .when(h < _SPLIT_VAL_MAX, "val")
        .otherwise("test")
        .alias("split"),
    )


_HIST_LO, _HIST_HI, _HIST_BINS = 0.0, 500.0, 20


@register(
    "a9_value_histogram",
    oracle=f"""
    SELECT LEAST(CAST(FLOOR((value - {_HIST_LO})
               / (({_HIST_HI} - {_HIST_LO}) / {_HIST_BINS})) AS BIGINT),
               {_HIST_BINS - 1}) AS bucket,
           COUNT(*) AS n
    FROM events
    GROUP BY 1
    """,
)
def a9_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of event values ({_HIST_BINS} buckets over
    [{_HIST_LO}, {_HIST_HI}], top edge clamped into the last bucket) —
    the profile panel behind every dashboard distribution plot, and the
    binning primitive quality pipelines use for score stratification.
    One scan, one {_HIST_BINS}-row aggregate; bucket arithmetic is a
    pure projection so partial aggregation collapses each partition to
    its bucket counts before the exchange."""
    ev = load_table(spark, sf_dir, "events")
    width = (_HIST_HI - _HIST_LO) / _HIST_BINS
    bucket = F.least(
        F.floor((F.col("value") - _HIST_LO) / width).cast("long"),
        F.lit(_HIST_BINS - 1),
    )
    return ev.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "a10_bivariate_stats",
    oracle="""
    SELECT ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 6)
               AS covar_qty_price,
           ROUND(stddev_samp(l_quantity), 6) AS std_qty,
           ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope
    FROM lineitem
    """,
)
def a10_bivariate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics over the fact table: Pearson correlation,
    sample covariance, stddev, and the least-squares slope of price on
    quantity — the single-pass sufficient-statistics family (all are
    algebraic over sum/sum²/sum-of-products, so they partial-aggregate
    map-side and merge exactly). Rounded to 6 decimals: the sufficient
    statistics are summation-order-sensitive in the last ~2 ulps."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "corr_qty_price"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 6).alias(
            "covar_qty_price"
        ),
        F.round(F.stddev_samp("l_quantity"), 6).alias("std_qty"),
        F.round(
            F.regr_slope("l_extendedprice", "l_quantity"), 6
        ).alias("slope"),
    )


PSI_BUCKETS = 10
PSI_SPLIT = "2024-01-16 00:00:00"  # reference window < split <= current


@register(
    "dq3_psi_drift",
    oracle=f"""
    WITH ref AS (
        SELECT value FROM events
        WHERE ts < TIMESTAMP '{PSI_SPLIT}'
    ), cur AS (
        SELECT value FROM events
        WHERE ts >= TIMESTAMP '{PSI_SPLIT}'
    ), bounds AS (
        -- GREATEST vs 1e-12: a degenerate reference window (min == max)
        -- makes w = 0, where Spark's floor(x/0) is NULL but DuckDB's is
        -- inf (then a BIGINT-cast error) — the clamp sends everything
        -- to bucket 0 identically in both engines (r4 advice); for any
        -- real window w >> 1e-12 and GREATEST is a bit-exact no-op
        SELECT MIN(value) AS mn, MAX(value) AS mx,
               GREATEST((MAX(value) - MIN(value)) / {PSI_BUCKETS}, 1e-12)
                   AS w
        FROM ref
    ), rb AS (
        SELECT LEAST(GREATEST(CAST(FLOOR((value - mn) / w) AS BIGINT), 0),
                     {PSI_BUCKETS - 1}) AS bucket,
               COUNT(*) AS n_ref
        FROM ref CROSS JOIN bounds GROUP BY 1
    ), cb AS (
        SELECT LEAST(GREATEST(CAST(FLOOR((value - mn) / w) AS BIGINT), 0),
                     {PSI_BUCKETS - 1}) AS bucket,
               COUNT(*) AS n_cur
        FROM cur CROSS JOIN bounds GROUP BY 1
    ), tot AS (
        SELECT CAST((SELECT COUNT(*) FROM ref) AS BIGINT) AS nr,
               CAST((SELECT COUNT(*) FROM cur) AS BIGINT) AS nc
    ), grid AS (
        SELECT i AS bucket FROM UNNEST(generate_series(0,
            {PSI_BUCKETS - 1})) AS g(i)
    )
    SELECT grid.bucket,
           CAST(COALESCE(n_ref, 0) AS BIGINT) AS n_ref,
           CAST(COALESCE(n_cur, 0) AS BIGINT) AS n_cur,
           ROUND(((COALESCE(n_ref, 0) + 0.5) / (nr + {PSI_BUCKETS * 0.5}))
                 - ((COALESCE(n_cur, 0) + 0.5)
                    / (nc + {PSI_BUCKETS * 0.5})), 6) AS share_delta,
           ROUND((((COALESCE(n_ref, 0) + 0.5) / (nr + {PSI_BUCKETS * 0.5}))
                  - ((COALESCE(n_cur, 0) + 0.5)
                     / (nc + {PSI_BUCKETS * 0.5})))
                 * LN(((COALESCE(n_ref, 0) + 0.5)
                       / (nr + {PSI_BUCKETS * 0.5}))
                      / ((COALESCE(n_cur, 0) + 0.5)
                         / (nc + {PSI_BUCKETS * 0.5}))), 6) AS psi_term
    FROM grid
    LEFT JOIN rb ON grid.bucket = rb.bucket
    LEFT JOIN cb ON grid.bucket = cb.bucket
    CROSS JOIN tot
    """,
)
def dq3_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift report between two time windows
    of ``events.value`` — the feature-drift monitor an ML pipeline runs
    before trusting a new data window (PSI > 0.25 on any feature is the
    classic retrain/investigate trigger). {PSI_BUCKETS} equal-width
    buckets are fitted on the REFERENCE window's min/max (the standard
    protocol: the monitored window is scored against the reference
    grid, out-of-range values clamp into the edge buckets); shares are
    Laplace-smoothed (+0.5 per bucket) so empty buckets don't blow up
    the log; psi_term = (p_ref - p_cur) * ln(p_ref / p_cur) per bucket
    — the total PSI is their sum.

    Engine parity: bucket ids are floor() of an identical IEEE chain
    over exact inputs; shares are single divisions of exact integers;
    ROUND(…, 6) absorbs LN ulp (the lm2 rule). Shape: two filtered
    scans (one partial-agg count shuffle each at {PSI_BUCKETS}-bucket
    width), a 2-value broadcast of window totals, and a {PSI_BUCKETS}-
    row grid join — nothing is ever wider than the bucket count; at
    100 TB add more features as more (feature, bucket) rows, same
    plan."""
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(PSI_SPLIT).cast("timestamp")
    ref = ev.filter(F.col("ts") < split).select("value")
    cur = ev.filter(F.col("ts") >= split).select("value")
    bounds = ref.agg(
        F.min("value").alias("mn"),
        # clamp vs the degenerate min==max window (oracle's GREATEST
        # comment): floor(x/0) is NULL here but inf-then-error in DuckDB
        F.greatest(
            (F.max("value") - F.min("value")) / PSI_BUCKETS, F.lit(1e-12)
        ).alias("w"),
    )

    def bucketed(side: DataFrame, out: str) -> DataFrame:
        b = F.least(
            F.greatest(
                F.floor((F.col("value") - F.col("mn")) / F.col("w")).cast(
                    "long"
                ),
                F.lit(0).cast("long"),
            ),
            F.lit(PSI_BUCKETS - 1).cast("long"),
        )
        return (
            side.crossJoin(F.broadcast(bounds))
            .select(b.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(out))
        )

    rb = bucketed(ref, "n_ref")
    cb = bucketed(cur, "n_cur")
    tot = ref.agg(F.count(F.lit(1)).alias("nr")).crossJoin(
        cur.agg(F.count(F.lit(1)).alias("nc"))
    )
    grid = spark.range(PSI_BUCKETS).select(F.col("id").alias("bucket"))
    sm = PSI_BUCKETS * 0.5
    p_ref = (F.coalesce(F.col("n_ref"), F.lit(0)) + 0.5) / (
        F.col("nr") + F.lit(sm)
    )
    p_cur = (F.coalesce(F.col("n_cur"), F.lit(0)) + 0.5) / (
        F.col("nc") + F.lit(sm)
    )
    return (
        grid.join(rb, "bucket", "left")
        .join(cb, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.coalesce(F.col("n_ref"), F.lit(0)).cast("long").alias("n_ref"),
            F.coalesce(F.col("n_cur"), F.lit(0)).cast("long").alias("n_cur"),
            F.round(p_ref - p_cur, 6).alias("share_delta"),
            F.round((p_ref - p_cur) * F.log(p_ref / p_cur), 6).alias(
                "psi_term"
            ),
        )
    )


SMP4_R = 50  # weighted-sample size


@register(
    "smp4_weighted_sample",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
               -- u = (hash8 + 1) / 16^8 from the md5 hex prefix, folded
               -- digit-by-digit (exact integer arithmetic in doubles);
               -- Spark computes the same integer via conv(hex, 16, 10)
               LN((list_sum(list_transform(generate_series(1, 8), i ->
                       (strpos('0123456789abcdef',
                               array_extract(str_split_regex(
                                   substr(md5(CAST(doc_id AS VARCHAR)),
                                          1, 8), ''), i)) - 1)
                       * 16 ** (8 - i))) + 1) / 4294967296.0)
               / n_chars AS k
        FROM documents
    )
    SELECT doc_id, weight, sample_rank FROM (
        SELECT doc_id, weight,
               ROW_NUMBER() OVER (ORDER BY k DESC, doc_id) AS sample_rank
        FROM keyed
    ) WHERE sample_rank <= {SMP4_R}
    """,
)
def smp4_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (the
    Efraimidis-Spirakis A-ES rule): each document draws a "uniform"
    u from its md5 hash, keys on ln(u)/w, and the top-{SMP4_R} keys
    are the sample — inclusion probability proportional to weight,
    reproducible across reruns, engines, and partitionings because the
    randomness is the hash (smp2/smp3's determinism contract extended
    to WEIGHTED selection). This is the execution half of importance
    resampling: score with pp7's DSIR log-ratios, plug exp(score) in
    as the weight, and this operator materializes the resampled
    corpus. Weight here is n_chars (any positive column works).

    Shape: scan-local key projection, then ONE top-{SMP4_R}. The
    row_number window itself is UNPARTITIONED, but Catalyst's
    LimitPushDownThroughWindow rewrites the rank<={SMP4_R} filter into
    a TakeOrderedAndProject BELOW the window (per-partition top-R
    heaps merged driver-side, 0 shuffles), so the single-task window
    sort only ever sees {SMP4_R} rows, never the corpus. (Spark 3.5+
    has a second bounding rewrite, InferWindowGroupLimit, that fires
    when the limit pushdown doesn't; either node bounds the window.)
    Pinned in tests/test_plans.py
    (test_smp4_weighted_sample_plans_as_take_ordered): the bounding
    node must sit below the window, so a Spark upgrade that drops
    both rewrites is caught. Engine parity: u's integer is folded
    from the same 8 hex digits both sides (exact ≤ 16^8 in doubles),
    the division and ln are single IEEE/libm ops over identical
    operands (lm2 precedent), and ties break on doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("double")
    u = (h + F.lit(1.0)) / F.lit(4294967296.0)
    k = F.log(u) / F.col("n_chars")
    keyed = docs.select(
        "doc_id",
        F.col("n_chars").cast("double").alias("weight"),
        k.alias("k"),
    )
    w = Window.orderBy(F.desc("k"), F.asc("doc_id"))
    return (
        keyed.select(
            "doc_id", "weight", F.row_number().over(w).alias("sample_rank")
        )
        .filter(F.col("sample_rank") <= SMP4_R)
    )


@register(
    "dq4_corpus_report",
    oracle="""
    WITH d AS (
        SELECT doc_id, source, lang, n_chars,
               LEN(str_split(lower(text), ' ')) AS n_tokens,
               md5(array_to_string(
                   list_sort(list_distinct(str_split(lower(text), ' '))),
                   ' ')) AS fp
        FROM documents
    )
    SELECT 'volume' AS section, 'n_docs' AS metric, source AS dim,
           CAST(COUNT(*) AS DOUBLE) AS value FROM d GROUP BY source
    UNION ALL
    SELECT 'volume', 'n_tokens', source, CAST(SUM(n_tokens) AS DOUBLE)
    FROM d GROUP BY source
    UNION ALL
    SELECT 'volume', 'n_chars_p50', source,
           ROUND(quantile_cont(n_chars, 0.5), 6) FROM d GROUP BY source
    UNION ALL
    SELECT 'volume', 'n_chars_p95', source,
           ROUND(quantile_cont(n_chars, 0.95), 6) FROM d GROUP BY source
    UNION ALL
    SELECT 'lang', 'n_docs', lang, CAST(COUNT(*) AS DOUBLE)
    FROM d GROUP BY lang
    UNION ALL
    SELECT 'dup', 'exact_dup_docs', 'corpus',
           CAST(COUNT(*) - COUNT(DISTINCT fp) AS DOUBLE) FROM d
    UNION ALL
    SELECT 'quality', 'n_gate_pass', source,
           CAST(SUM(CASE WHEN n_chars BETWEEN 150 AND 500
                         AND lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
    FROM d GROUP BY source
    """,
)
def dq4_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus DATASHEET in one relation — (section, metric, dim,
    value): per-source volumes (docs, tokens, exact length percentiles),
    language mix, corpus-wide exact-duplicate mass (dd2's fingerprint),
    and the quality-gate pass counts (clean_corpus's default gates).
    This is the report a dataset card publishes and a curation run
    diffs release-over-release; every cell is exact (counts, sums, and
    true interpolated percentiles — Spark percentile() and DuckDB
    quantile_cont agree bit-for-bit at 6dp on integral inputs), so the
    whole datasheet hash-matches the oracle.

    Shape: ONE corpus scan (the projected relation is materialized,
    then three bounded aggregations consume it: by source, by lang,
    global), unioned into the long frame — at 100 TB the output is
    O(sources + langs) rows; nothing about the report grows with the
    corpus."""
    from etl_project_spark.operators.dedup import _tokens

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        "lang",
        "n_chars",
        F.size(_tokens()).alias("n_tokens"),
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(_tokens())))
        ).alias("fp"),
    ).localCheckpoint(eager=True)
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(n_chars, 0.95)"), 6).alias("p95"),
        F.sum(
            (
                F.col("n_chars").between(150, 500) & (F.col("lang") == "en")
            ).cast("long")
        ).alias("n_gate"),
    )

    def row(section: str, metric: str, dim, value) -> DataFrame:
        return per_src.select(
            F.lit(section).alias("section"),
            F.lit(metric).alias("metric"),
            dim.alias("dim"),
            value.cast("double").alias("value"),
        )

    vol = (
        row("volume", "n_docs", F.col("source"), F.col("n_docs"))
        .unionByName(
            row("volume", "n_tokens", F.col("source"), F.col("n_tokens"))
        )
        .unionByName(
            row("volume", "n_chars_p50", F.col("source"), F.col("p50"))
        )
        .unionByName(
            row("volume", "n_chars_p95", F.col("source"), F.col("p95"))
        )
        .unionByName(
            row("quality", "n_gate_pass", F.col("source"), F.col("n_gate"))
        )
    )
    lang = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("lang").alias("section"),
        F.lit("n_docs").alias("metric"),
        F.col("lang").alias("dim"),
        F.col("n").cast("double").alias("value"),
    )
    dup = d.agg(
        (F.count(F.lit(1)) - F.countDistinct("fp")).alias("n")
    ).select(
        F.lit("dup").alias("section"),
        F.lit("exact_dup_docs").alias("metric"),
        F.lit("corpus").alias("dim"),
        F.col("n").cast("double").alias("value"),
    )
    return vol.unionByName(lang).unionByName(dup)


@register(
    "dq6_source_token_kl",
    oracle="""
    WITH tok AS (
        SELECT source, unnest(str_split(lower(text), ' ')) AS w
        FROM documents
    ), pair AS (
        SELECT source, w, COUNT(*) AS c FROM tok GROUP BY source, w
    ), cw AS (
        SELECT w, SUM(c) AS c_w FROM pair GROUP BY w
    ), ns AS (
        SELECT source, SUM(c) AS n_s FROM pair GROUP BY source
    ), tot AS (
        SELECT SUM(c_w) AS n, COUNT(*) AS v FROM cw
    )
    SELECT pair.source,
           CAST(MAX(n_s) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(v), 6) AS vocab_coverage,
           ROUND(SUM((CAST(c AS DOUBLE) / n_s)
                     * LN((CAST(c AS DOUBLE) / n_s)
                          / (CAST(c_w AS DOUBLE) / n))), 6) AS kl_nats
    FROM pair
    JOIN cw USING (w)
    JOIN ns USING (source)
    CROSS JOIN tot
    GROUP BY pair.source
    """,
)
def dq6_source_token_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram-distribution KL divergence against the whole
    corpus — the mixture diagnostic a curation run reads before setting
    source weights (pp4/smp6): a crawl slice whose token distribution
    sits far from the corpus (high KL) is off-domain or degenerate
    boilerplate, and its weight deserves a second look (the CCNet /
    DoReMi-style per-domain divergence signal). KL(p_s || q) =
    sum_w p_s(w) * ln(p_s(w) / q(w)) needs no smoothing: every word a
    source contributes is by construction in the corpus distribution,
    so q(w) > 0 wherever p_s(w) > 0. vocab_coverage (share of corpus
    vocabulary the source exercises) separates "narrow vocabulary" from
    "different vocabulary" when reading the KL.

    Shape: the corpus is tokenized and scanned ONCE into (source, word)
    partial counts — the only corpus-wide exchange, with map-side
    combine collapsing each partition to its distinct pairs; the
    materialized pair relation (|sources| x |vocab|, checkpointed like
    dq4's projection) then feeds all three derived aggregates (word
    totals, source totals, corpus scalars) without re-scanning. The
    word-marginal join keys on word (vocabulary-sized shuffle at
    100 TB, never corpus-sized); source totals and the 1-row corpus
    scalar broadcast. Output is O(sources). Engine parity: shares are
    single divisions of exact integer counts; the per-source ln-term
    sum is <= |vocab| O(1) doubles, so ROUND(..., 6) absorbs both the
    LN ulp and summation-order drift (the lm2/dq3 rule)."""
    docs = load_table(spark, sf_dir, "documents")
    pair = (
        docs.select(
            "source", F.explode(F.split(F.lower("text"), " ")).alias("w")
        )
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    cw = pair.groupBy("w").agg(F.sum("c").alias("c_w"))
    ns = pair.groupBy("source").agg(F.sum("c").alias("n_s"))
    tot = cw.agg(
        F.sum("c_w").alias("n"), F.count(F.lit(1)).alias("v")
    )
    p = F.col("c").cast("double") / F.col("n_s")
    q = F.col("c_w").cast("double") / F.col("n")
    return (
        pair.join(cw, "w")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.max("n_s").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.max("v"), 6
            ).alias("vocab_coverage"),
            F.round(F.sum(p * F.log(p / q)), 6).alias("kl_nats"),
        )
    )


@register(
    "dq7_categorical_drift",
    oracle=f"""
    WITH w AS (
        SELECT event_type,
               CASE WHEN ts < TIMESTAMP '{PSI_SPLIT}' THEN 0 ELSE 1 END
                   AS win
        FROM events
    ), ct AS (
        SELECT win, event_type, COUNT(*) AS o FROM w GROUP BY win, event_type
    ), rt AS (
        SELECT win, SUM(o) AS n_w FROM ct GROUP BY win
    ), colt AS (
        SELECT event_type, SUM(o) AS n_t FROM ct GROUP BY event_type
    ), tot AS (
        SELECT SUM(o) AS n FROM ct
    ), terms AS (
        SELECT ct.event_type, ct.win, ct.o, rt.n_w, colt.n_t, tot.n,
               (CAST(rt.n_w AS DOUBLE) * colt.n_t / tot.n) AS e
        FROM ct JOIN rt USING (win) JOIN colt USING (event_type)
        CROSS JOIN tot
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN win = 0 THEN o ELSE 0 END) AS BIGINT)
               AS n_ref,
           CAST(SUM(CASE WHEN win = 1 THEN o ELSE 0 END) AS BIGINT)
               AS n_cur,
           ROUND(SUM(CASE WHEN win = 1 THEN o ELSE 0 END)
                     / MAX(CASE WHEN win = 1 THEN CAST(n_w AS DOUBLE) END)
                 - SUM(CASE WHEN win = 0 THEN o ELSE 0 END)
                     / MAX(CASE WHEN win = 0 THEN CAST(n_w AS DOUBLE) END),
                 6) AS share_delta,
           ROUND(SUM((o - e) * (o - e) / e), 6) AS chi2_term
    FROM terms
    GROUP BY event_type
    """,
)
def dq7_categorical_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical drift report — dq3's sibling for DISCRETE features:
    the ``event_type`` mix compared across the same reference/current
    time split, with each type's share shift and its contribution to
    the Pearson chi-square statistic (o-e)²/e summed over both windows
    (expected counts from the standard independence model
    e = row_total·col_total/n). Σ chi2_term over the output IS the
    test statistic a monitoring job thresholds against the
    chi-square(k-1) critical value before trusting a new data window's
    label mix.

    Shape: ONE (window, type) count aggregate over the corpus —
    map-side combined to 2×|types| rows — then marginals by
    re-aggregation and an O(types) join; output O(types) at any
    corpus size. Engine parity: counts exact; expected counts and
    chi-square terms are identical IEEE chains over exact integers,
    rounded 6dp."""
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(PSI_SPLIT).cast("timestamp")
    ct = (
        ev.select(
            "event_type",
            F.when(F.col("ts") < split, F.lit(0))
            .otherwise(F.lit(1))
            .alias("win"),
        )
        .groupBy("win", "event_type")
        .agg(F.count(F.lit(1)).alias("o"))
        .localCheckpoint(eager=True)
    )
    rt = ct.groupBy("win").agg(F.sum("o").alias("n_w"))
    colt = ct.groupBy("event_type").agg(F.sum("o").alias("n_t"))
    tot = ct.agg(F.sum("o").alias("n"))
    e = F.col("n_w").cast("double") * F.col("n_t") / F.col("n")
    terms = (
        ct.join(F.broadcast(rt), "win")
        .join(F.broadcast(colt), "event_type")
        .crossJoin(F.broadcast(tot))
        .select("event_type", "win", "o", "n_w", e.alias("e"))
    )
    o_in = lambda w: F.sum(F.when(F.col("win") == w, F.col("o")).otherwise(F.lit(0)))  # noqa: E731
    nw_in = lambda w: F.max(F.when(F.col("win") == w, F.col("n_w").cast("double")))  # noqa: E731
    return terms.groupBy("event_type").agg(
        o_in(0).cast("long").alias("n_ref"),
        o_in(1).cast("long").alias("n_cur"),
        F.round(o_in(1) / nw_in(1) - o_in(0) / nw_in(0), 6).alias(
            "share_delta"
        ),
        F.round(
            F.sum(
                (F.col("o") - F.col("e"))
                * (F.col("o") - F.col("e"))
                / F.col("e")
            ),
            6,
        ).alias("chi2_term"),
    )


A11_WINDOW_DAYS = 7  # trailing window for rolling active users (WAU)


@register(
    "a11_rolling_active_users",
    oracle=f"""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), bounds AS (
        SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ud
    ), fan AS (
        SELECT ud.user_id, ud.day + CAST(i AS INT) AS cal
        FROM ud, UNNEST(generate_series(0, {A11_WINDOW_DAYS - 1})) AS u(i)
    )
    SELECT CAST(CAST(cal AS DATE) AS TIMESTAMP) AS period_date,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
    FROM fan, bounds
    WHERE cal BETWEEN d0 AND d1
    GROUP BY 1
    """,
)
def a11_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING ACTIVE USERS (the WAU dashboard metric): for every
    calendar day in the data's range, the count of DISTINCT users
    active in the trailing {A11_WINDOW_DAYS}-day window ending that
    day. Exact sliding-window distincts can't come from a windowed
    aggregate (distinct doesn't decompose over frames), so the engine
    uses the fan-out identity instead: a user active on day D is
    WAU-active on days D..D+{A11_WINDOW_DAYS - 1}, so dedupe to
    (user, day) once, explode each row into its {A11_WINDOW_DAYS}
    covered days, and count distinct per day — NO self-join, no
    per-day window, output clipped to observed days.

    Shape: one (user, day) pre-dedupe (map-side combine collapses the
    per-day event mass first), a {A11_WINDOW_DAYS}x bounded explode,
    one distinct aggregate keyed by (day, user) then day. Linear in
    active (user, day) pairs at any scale — the plan a 100 TB DAU/WAU
    job wants; the day-range clip is a broadcast 1-row bound."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    bounds = ud.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    fan = ud.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day"),
                F.date_add(F.col("day"), A11_WINDOW_DAYS - 1),
            )
        ).alias("cal"),
    )
    return (
        fan.crossJoin(F.broadcast(bounds))
        .filter(
            (F.col("cal") >= F.col("d0")) & (F.col("cal") <= F.col("d1"))
        )
        .groupBy(F.col("cal").cast("timestamp_ntz").alias("period_date"))
        .agg(
            F.count_distinct("user_id").cast("long").alias("active_users")
        )
    )


# --- dq12: corpus version diff --------------------------------------------------


@register(
    "dq12_corpus_diff",
    oracle="""
    WITH ref AS (
        SELECT doc_id, source, md5(text) AS h,
               LEN(str_split(lower(text), ' ')) AS n
        FROM documents
    ), cur AS (
        -- the next corpus build, derived deterministically (dq3/dq10's
        -- ref/cur convention): every 19th doc dropped, every 13th
        -- surviving doc re-crawled with changed text, every 17th doc
        -- re-ingested under a new id
        SELECT doc_id, source,
               md5(CASE WHEN doc_id % 13 = 0 THEN text || ' v2'
                        ELSE text END) AS h,
               LEN(str_split(lower(CASE WHEN doc_id % 13 = 0
                                        THEN text || ' v2'
                                        ELSE text END), ' ')) AS n
        FROM documents WHERE doc_id % 19 != 0
        UNION ALL
        SELECT doc_id + 10000000, source, md5(text),
               LEN(str_split(lower(text), ' '))
        FROM documents WHERE doc_id % 17 = 0
    ), j AS (
        SELECT COALESCE(r.source, c.source) AS source,
               CASE WHEN r.doc_id IS NULL THEN 'added'
                    WHEN c.doc_id IS NULL THEN 'removed'
                    WHEN r.h != c.h THEN 'modified'
                    ELSE 'unchanged' END AS status,
               COALESCE(c.n, 0) - COALESCE(r.n, 0) AS tok_delta
        FROM ref r FULL OUTER JOIN cur c USING (doc_id)
    )
    SELECT source,
           CAST(SUM(CASE WHEN status = 'added' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_added,
           CAST(SUM(CASE WHEN status = 'removed' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_removed,
           CAST(SUM(CASE WHEN status = 'modified' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_modified,
           CAST(SUM(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_unchanged,
           CAST(SUM(tok_delta) AS BIGINT) AS token_delta
    FROM j GROUP BY source
    """,
)
def dq12_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORPUS VERSION DIFF — the release audit run between two corpus
    builds before swapping a training mix onto the new one: per
    source, how many documents were added, removed, or modified
    (content hash changed) and the net token delta. The "cur" build is
    derived deterministically from the same table (dq3/dq10's ref/cur
    convention): every 19th doc dropped, every 13th survivor
    re-crawled with changed text, every 17th doc re-ingested under a
    new id — so both engines construct identical versions and every
    count is exact.

    Shape: the diff is ONE full-outer join on the primary key (at
    100 TB: co-located if both builds are bucketed by doc_id — the
    reason to bucket corpus tables by key) followed by a
    |sources|-row aggregate; content comparison rides the join as a
    128-bit md5 equality, never a text compare."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.lower(F.col("text")), " "))
    ref = docs.select(
        "doc_id", "source", F.md5("text").alias("h"), toks.alias("n")
    )
    mutated = F.when(
        F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" v2"))
    ).otherwise(F.col("text"))
    cur = (
        docs.filter(F.col("doc_id") % 19 != 0)
        .select(
            "doc_id",
            "source",
            F.md5(mutated).alias("h"),
            F.size(F.split(F.lower(mutated), " ")).alias("n"),
        )
        .unionAll(
            docs.filter(F.col("doc_id") % 17 == 0).select(
                (F.col("doc_id") + 10_000_000).alias("doc_id"),
                "source",
                F.md5("text").alias("h"),
                toks.alias("n"),
            )
        )
    )
    r, c = ref.alias("r"), cur.alias("c")
    j = r.join(c, "doc_id", "full_outer").select(
        F.coalesce(F.col("r.source"), F.col("c.source")).alias("source"),
        F.when(F.col("r.h").isNull(), "added")
        .when(F.col("c.h").isNull(), "removed")
        .when(F.col("r.h") != F.col("c.h"), "modified")
        .otherwise("unchanged")
        .alias("status"),
        (
            F.coalesce(F.col("c.n"), F.lit(0))
            - F.coalesce(F.col("r.n"), F.lit(0))
        ).alias("tok_delta"),
    )
    return j.groupBy("source").agg(
        F.sum(F.when(F.col("status") == "added", 1).otherwise(0)).alias(
            "n_added"
        ),
        F.sum(F.when(F.col("status") == "removed", 1).otherwise(0)).alias(
            "n_removed"
        ),
        F.sum(F.when(F.col("status") == "modified", 1).otherwise(0)).alias(
            "n_modified"
        ),
        F.sum(
            F.when(F.col("status") == "unchanged", 1).otherwise(0)
        ).alias("n_unchanged"),
        F.sum("tok_delta").alias("token_delta"),
    )


# --- dq13: column-profile release diff ---------------------------------------

DQ13_COLS = ("text", "lang", "source", "n_chars")


def _dq13_oracle() -> str:
    metric_selects = []
    for col in DQ13_COLS:
        length = (
            f"AVG(LEN({col}))" if col != "n_chars" else f"AVG({col})"
        )
        metric_selects.append(f"""
        SELECT '{col}' AS column_name, 'n_distinct' AS metric,
               CAST(COUNT(DISTINCT {col}) AS DOUBLE) AS v,
               0 AS which FROM ref
        UNION ALL
        SELECT '{col}', 'n_distinct',
               CAST(COUNT(DISTINCT {col}) AS DOUBLE), 1 FROM cur
        UNION ALL
        SELECT '{col}', 'null_frac',
               CAST(COUNT(*) - COUNT({col}) AS DOUBLE) / COUNT(*),
               0 FROM ref
        UNION ALL
        SELECT '{col}', 'null_frac',
               CAST(COUNT(*) - COUNT({col}) AS DOUBLE) / COUNT(*),
               1 FROM cur
        UNION ALL
        SELECT '{col}', 'mean_len', ROUND({length}, 6), 0 FROM ref
        UNION ALL
        SELECT '{col}', 'mean_len', ROUND({length}, 6), 1 FROM cur""")
    melted = " UNION ALL ".join(metric_selects)
    return f"""
    WITH ref AS (
        SELECT doc_id, text, lang, source, n_chars FROM documents
    ), cur AS (
        SELECT doc_id,
               CASE WHEN doc_id % 13 = 0 THEN text || ' v2'
                    ELSE text END AS text,
               lang, source, n_chars
        FROM documents WHERE doc_id % 19 != 0
        UNION ALL
        SELECT doc_id + 10000000, text, lang, source, n_chars
        FROM documents WHERE doc_id % 17 = 0
    ), m AS ({melted})
    SELECT column_name, metric,
           MAX(CASE WHEN which = 0 THEN v END) AS ref_value,
           MAX(CASE WHEN which = 1 THEN v END) AS cur_value,
           ROUND(MAX(CASE WHEN which = 1 THEN v END)
                 - MAX(CASE WHEN which = 0 THEN v END), 6) AS delta
    FROM m GROUP BY column_name, metric
    """


@register("dq13_column_profile_diff", oracle=_dq13_oracle())
def dq13_column_profile_diff(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """COLUMN-PROFILE RELEASE DIFF — dq12's complement: dq12 counts
    row-level adds/removes/modifications, this audits what the new
    build does to each COLUMN's statistical profile (distinct
    cardinality, null fraction, mean length/value) — the gate that
    catches a broken extractor (null_frac spikes), an id-space
    collision (n_distinct drops), or silent truncation (mean_len
    shrinks) even when row counts look healthy. Same deterministic
    ref/cur builds as dq12, so both engines audit identical releases.
    n_chars' mean is the stored value (its staleness against the
    re-crawled text's true length is exactly the drift this surfaces).

    Shape: one aggregate per build computes every column's metrics in
    a single pass (COUNT DISTINCT expands map-side; no per-column
    scans), then the two 1-row wide profiles melt to the long
    (column, metric) relation and diff — output is O(columns), the
    corpus is scanned exactly twice (ref + cur), and nothing joins on
    anything wider than the 12-row melted relation. Engine parity:
    counts and length-sums are exact integers; means are single
    divisions ROUND(6)-published (lm2's rule)."""
    docs = load_table(spark, sf_dir, "documents")
    mutated = F.when(
        F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" v2"))
    ).otherwise(F.col("text"))
    ref = docs.select("doc_id", "text", "lang", "source", "n_chars")
    cur = (
        docs.filter(F.col("doc_id") % 19 != 0)
        .select(
            "doc_id", mutated.alias("text"), "lang", "source", "n_chars"
        )
        .unionAll(
            docs.filter(F.col("doc_id") % 17 == 0).select(
                (F.col("doc_id") + 10_000_000).alias("doc_id"),
                "text",
                "lang",
                "source",
                "n_chars",
            )
        )
    )

    def profile(df: DataFrame, which: int) -> DataFrame:
        aggs = []
        for c in DQ13_COLS:
            length = (
                F.avg(F.length(c)) if c != "n_chars" else F.avg(c)
            )
            aggs += [
                F.count_distinct(F.col(c))
                .cast("double")
                .alias(f"{c}__n_distinct"),
                (
                    (F.count(F.lit(1)) - F.count(c)).cast("double")
                    / F.count(F.lit(1))
                ).alias(f"{c}__null_frac"),
                F.round(length, 6).alias(f"{c}__mean_len"),
            ]
        wide = df.agg(*aggs)
        stack_args = ", ".join(
            f"'{c}', '{m}', `{c}__{m}`"
            for c in DQ13_COLS
            for m in ("n_distinct", "null_frac", "mean_len")
        )
        n = len(DQ13_COLS) * 3
        return wide.selectExpr(
            f"stack({n}, {stack_args}) AS (column_name, metric, v)"
        ).select("column_name", "metric", "v", F.lit(which).alias("which"))

    m = profile(ref, 0).unionAll(profile(cur, 1))
    rv = F.max(F.when(F.col("which") == 0, F.col("v")))
    cv = F.max(F.when(F.col("which") == 1, F.col("v")))
    return m.groupBy("column_name", "metric").agg(
        rv.alias("ref_value"),
        cv.alias("cur_value"),
        F.round(cv - rv, 6).alias("delta"),
    )
