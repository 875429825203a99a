"""Event-time / time-series operators: tumbling, sliding, session windows
and OHLCV bar resampling.

This is the heart of the reference's domain — 5-minute OHLCV bars
(/root/reference/dags/airflow_dags.py:30,35: ``period_id=5MIN``). The
reference receives pre-aggregated bars from CoinAPI; the engine can
*derive* them from a raw event stream, batch or streaming (the streaming
forms with watermarks live in ``etl_project_spark.streaming``).

Scale: ``F.window`` is a projection (bucket computation) + hash
aggregation — identical cost profile to the daily groupBy (A3). Sliding
windows multiply rows by (size/slide); session windows shuffle once by
key and merge sorted runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_project_spark.catalog import load_table
from etl_project_spark.registry import register


@register(
    "ts1_tumbling_5min",
    oracle="""
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
           CAST(SUM(value) AS DOUBLE) AS sum_value,
           COUNT(*) AS n_events
    FROM events GROUP BY 1
    """,
)
def ts1_tumbling_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute windows — the reference's bar cadence
    (airflow_dags.py:35 ``period_id=5MIN``) re-derived from raw events."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.sum("value").alias("sum_value"), F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"), "sum_value", "n_events"
        )
    )


@register(
    "ts2_sliding_10min",
    oracle="""
    -- size 10 min, slide 5 min: each event lands in exactly two windows,
    -- starting at bucket(ts) and bucket(ts) - 5 min.
    WITH exploded AS (
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, value
        FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes', value
        FROM events
    )
    SELECT window_start, CAST(SUM(value) AS DOUBLE) AS sum_value,
           COUNT(*) AS n_events
    FROM exploded GROUP BY 1
    """,
)
def ts2_sliding_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (10-minute span every 5 minutes): overlapping bar
    aggregates. Spark expands each row into size/slide buckets before the
    hash agg — row-amplification factor 2 here."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.sum("value").alias("sum_value"), F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "sum_value", "n_events")
    )


@register(
    "ts3_session_window",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, value,
               -- strict <: Spark's session interval is [t, t+gap), so an
               -- event exactly gap after the last one opens a NEW session
               CASE WHEN ts - LAG(ts) OVER w < INTERVAL '30 minutes'
                    THEN 0 ELSE 1 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
        SELECT user_id, ts, value,
               SUM(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS sess_id
        FROM marked
    )
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS last_event_ts,
           COUNT(*) AS n_events, CAST(SUM(value) AS DOUBLE) AS sum_value
    FROM numbered GROUP BY user_id, sess_id
    """,
)
def ts3_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute inactivity gap) per user —
    ``F.session_window``, the batch form of the streaming sessionizer.
    One shuffle by user_id; sessions merge within sorted runs."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("last_event_ts"),
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select("user_id", "session_start", "last_event_ts", "n_events", "sum_value")
    )


@register(
    "ts4_ohlcv_resample",
    oracle="""
    -- open/close via ROW_NUMBER over (ts, event_id): deterministic under
    -- duplicate timestamps, matching Spark's min_by/max_by struct tie-break
    WITH ranked AS (
        SELECT time_bucket(INTERVAL '1 hour', ts) AS bar_start, value,
               ROW_NUMBER() OVER (
                   PARTITION BY time_bucket(INTERVAL '1 hour', ts)
                   ORDER BY ts ASC, event_id ASC) AS rn_a,
               ROW_NUMBER() OVER (
                   PARTITION BY time_bucket(INTERVAL '1 hour', ts)
                   ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events
    )
    SELECT bar_start,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS price_open,
           MAX(value) AS price_high,
           MIN(value) AS price_low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS price_close,
           CAST(SUM(value) AS DOUBLE) AS volume,
           COUNT(*) AS trades_count
    FROM ranked GROUP BY 1
    """,
)
def ts4_ohlcv_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLCV bar derivation — the reference's entire data product
    (airflow_dags.py:94-108 schema: open/high/low/close/volume/count)
    computed from raw events in one hash aggregation: open/close via
    min_by/max_by(value, ts), high/low via max/min, volume via sum."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            # tie-break on event_id so two events sharing a ts resolve the
            # same way in Spark and the oracle (min_by alone picks an
            # arbitrary row among ts ties)
            F.min_by("value", F.struct("ts", "event_id")).alias("price_open"),
            F.max("value").alias("price_high"),
            F.min("value").alias("price_low"),
            F.max_by("value", F.struct("ts", "event_id")).alias("price_close"),
            F.sum("value").alias("volume"),
            F.count("*").alias("trades_count"),
        )
        .select(
            F.col("w.start").alias("bar_start"),
            "price_open",
            "price_high",
            "price_low",
            "price_close",
            "volume",
            "trades_count",
        )
    )


@register(
    "ts5_gap_fill_calendar",
    oracle="""
    WITH bounds AS (
        SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1 FROM events
    ), calendar AS (
        SELECT CAST(UNNEST(generate_series(d0, d1, INTERVAL '1 day')) AS TIMESTAMP)
            AS period_date
        FROM bounds
    ), daily AS (
        SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS period_date,
               CAST(SUM(value) AS DOUBLE) AS sum_value
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT c.period_date, COALESCE(d.sum_value, 0.0) AS sum_value
    FROM calendar c LEFT JOIN daily d USING (period_date)
    """,
)
def ts5_gap_fill_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill: dense daily series with zero-filled missing days
    (``F.sequence`` + explode + left join) — what a dashboard needs when a
    day has no bars. The DAILY side broadcasts (it is post-aggregation,
    day-cardinality): a left outer join can only build its non-preserved
    side, so hinting the tiny calendar (the preserved side) is a no-op —
    Spark logs "build left not supported" and falls back to SMJ."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    calendar = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("d")
    ).select(F.col("d").cast("timestamp_ntz").alias("period_date"))
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.col("ts").cast("date").cast("timestamp_ntz").alias("period_date")
        )
        .agg(F.sum("value").alias("sum_value"))
    )
    return (
        calendar.join(F.broadcast(daily), "period_date", "left")
        .select(
            "period_date", F.coalesce("sum_value", F.lit(0.0)).alias("sum_value")
        )
    )


TS6_START = "2024-01-01 00:00:00"
TS6_END = "2024-01-31 00:00:00"
TS6_STEP_H = 6  # resample grid step (hours)
_TS6_SENTINEL = 9223372036854775807  # event_id tie-break for grid rows


@register(
    "ts6_interpolated_resample",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, ts, value, event_id, 0 AS is_grid
        FROM events
    ), grid AS (
        SELECT u.user_id, g.t AS ts, CAST(NULL AS DOUBLE) AS value,
               CAST(NULL AS BIGINT) AS event_id, 1 AS is_grid
        FROM (SELECT DISTINCT user_id FROM events) u
        CROSS JOIN (
            SELECT UNNEST(generate_series(TIMESTAMP '{TS6_START}',
                                          TIMESTAMP '{TS6_END}',
                                          INTERVAL {TS6_STEP_H} HOUR)) AS t
        ) g
    ), unioned AS (
        SELECT *, COALESCE(event_id, {_TS6_SENTINEL}) AS tie
        FROM (SELECT * FROM ev UNION ALL SELECT * FROM grid)
    ), walked AS (
        SELECT user_id, ts, is_grid,
               LAST_VALUE(value IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, is_grid, tie
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS pv,
               LAST_VALUE(CASE WHEN is_grid = 0 THEN epoch_us(ts) END
                          IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, is_grid, tie
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS pt,
               FIRST_VALUE(value IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, is_grid, tie
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               ) AS nv,
               FIRST_VALUE(CASE WHEN is_grid = 0 THEN epoch_us(ts) END
                           IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, is_grid, tie
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               ) AS nt
        FROM unioned
    )
    SELECT user_id, ts AS grid_ts,
           CASE WHEN pv IS NULL THEN NULL
                -- closed right boundary: a grid point coinciding with
                -- the LAST observation is inside the observed range
                -- and emits that observation (r4 advice)
                WHEN nv IS NULL AND epoch_us(ts) = pt THEN ROUND(pv, 6)
                WHEN nv IS NULL THEN NULL
                ELSE ROUND(pv + (nv - pv)
                           * (CAST(epoch_us(ts) - pt AS DOUBLE)
                              / (nt - pt)), 6)
           END AS value_interp
    FROM walked WHERE is_grid = 1
    """,
)
def ts6_interpolated_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Irregular→regular resampling with LINEAR interpolation: every
    user's event series sampled onto a fixed {TS6_STEP_H}-hour grid,
    each grid value interpolated between the bracketing observations
    (v_prev + (v_next − v_prev)·(t − t_prev)/(t_next − t_prev); NULL
    outside the CLOSED observed range [first, last] — a grid point
    coinciding exactly with the last observation emits that
    observation, not NULL) — the resampling rule financial and
    sensor pipelines use where ts5's gap-fill (previous-value hold)
    would step. Completes the resampling family: ts4 = OHLCV
    aggregation, ts5 = hold-last, ts6 = linear.

    Shape: grid rows (users × grid points — bounded by calendar, not
    by events) union the event stream, ONE user-partitioned sort
    carries four IGNORE NULLS running-edge windows (prev/next value
    and integer-microsecond timestamp), and grid rows project the
    interpolation — no join against the event table at all, so the
    plan is a single exchange regardless of how dense the series is.
    Engine parity: the bracketing choice is a total order (ts, grid
    flag, event_id sentinel — no NULL sort keys, where the engines'
    NULLS FIRST/LAST defaults differ); the interpolation is a fixed
    chain of single IEEE ops over exact microsecond integers, ROUND(6)
    absorbing nothing but formatting. At 100 TB, partition the union
    by (user bucket, month) so each window sorts locally."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "value", "event_id", F.lit(0).alias("is_grid")
    )
    grid_ts = F.explode(
        F.sequence(
            F.lit(TS6_START).cast("timestamp"),
            F.lit(TS6_END).cast("timestamp"),
            F.expr(f"INTERVAL {TS6_STEP_H} HOURS"),
        )
    )
    grid = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            grid_ts.alias("ts"),
            F.lit(None).cast("double").alias("value"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(1).alias("is_grid"),
        )
    )
    unioned = ev.unionByName(grid).withColumn(
        "tie", F.coalesce("event_id", F.lit(_TS6_SENTINEL))
    )
    from pyspark.sql import Window

    order = Window.partitionBy("user_id").orderBy("ts", "is_grid", "tie")
    back = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    ev_us = F.when(
        F.col("is_grid") == 0,
        F.unix_micros(F.col("ts").cast("timestamp_ltz")),
    )
    walked = unioned.select(
        "user_id",
        "ts",
        "is_grid",
        F.last("value", ignorenulls=True).over(back).alias("pv"),
        F.last(ev_us, ignorenulls=True).over(back).alias("pt"),
        F.first("value", ignorenulls=True).over(fwd).alias("nv"),
        F.first(ev_us, ignorenulls=True).over(fwd).alias("nt"),
    )
    t_us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    interp = F.round(
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * ((t_us - F.col("pt")).cast("double") / (F.col("nt") - F.col("pt"))),
        6,
    )
    return (
        walked.filter(F.col("is_grid") == 1)
        .select(
            "user_id",
            F.col("ts").alias("grid_ts"),
            F.when(F.col("pv").isNull(), F.lit(None))
            # closed right boundary (oracle's CASE comment): exact hit
            # on the last observation emits it instead of NULL
            .when(
                F.col("nv").isNull() & (t_us == F.col("pt")),
                F.round(F.col("pv"), 6),
            )
            .when(F.col("nv").isNull(), F.lit(None))
            .otherwise(interp)
            .alias("value_interp"),
        )
    )


TS7_LOOKBACK = 20  # trailing window (rows) the z-score is fitted on
TS7_Z = 2.5  # anomaly threshold in standard deviations


@register(
    "ts7_rolling_zscore",
    oracle=f"""
    WITH w AS (
        SELECT user_id, event_id, ts, value,
               SUM(value) OVER win AS s,
               SUM(value * value) OVER win AS s2,
               COUNT(*) OVER win AS n
        FROM events
        WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN {TS7_LOOKBACK} PRECEDING
                       AND 1 PRECEDING)
    )
    SELECT user_id, event_id, ts, value,
           ROUND(s / n, 6) AS roll_mean,
           ROUND(sqrt(GREATEST((s2 - s * s / n) / (n - 1), 1e-12)), 6)
               AS roll_std,
           ROUND((value - s / n)
                 / sqrt(GREATEST((s2 - s * s / n) / (n - 1), 1e-12)), 6)
               AS zscore
    FROM w
    WHERE n = {TS7_LOOKBACK}
      AND abs((value - s / n)
              / sqrt(GREATEST((s2 - s * s / n) / (n - 1), 1e-12))) > {TS7_Z}
    """,
)
def ts7_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection per user — the streaming-shaped
    outlier monitor (trailing {TS7_LOOKBACK}-event mean/std per user,
    flag events beyond {TS7_Z} sigma) a metrics pipeline runs over every
    counter; the batch twin of a stateful per-key detector. The trailing
    frame EXCLUDES the current row (1 PRECEDING) so the tested value
    never contaminates its own baseline, and rows without a full
    lookback are suppressed (warm-up, n = {TS7_LOOKBACK}).

    Shape: one corpus scan, ONE shuffle on user_id (the window
    partition key — real per-key partitioning, never a global window),
    then a per-row filter; output is O(anomalies). At 100 TB the same
    plan holds for any cardinality of users; a single hot user is a
    frame of consecutive rows, not a reducer hot-spot (frames are
    row-bounded). Engine parity: mean/var derive from the SAME two
    window sums in both engines (avg = s/n, var = (s2 - s^2/n)/(n-1) —
    never each engine's own stddev kernel, whose summation algorithms
    differ); the 1e-12 clamp guards a constant frame; published floats
    round at 6dp, while the anomaly PREDICATE uses the unrounded chain
    identically on both sides. (user_id, ts) is unique in the fixture,
    but event_id stays in the ORDER BY as the deterministic tie-break
    (the j6/w-family rule)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-TS7_LOOKBACK, -1)
    )
    s = F.sum("value").over(win)
    s2 = F.sum(F.col("value") * F.col("value")).over(win)
    n = F.count(F.lit(1)).over(win)
    mean = s / n
    std = F.sqrt(
        F.greatest((s2 - s * s / n) / (n - 1), F.lit(1e-12))
    )
    z = (F.col("value") - mean) / std
    return (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            "value",
            F.round(mean, 6).alias("roll_mean"),
            F.round(std, 6).alias("roll_std"),
            F.round(z, 6).alias("zscore"),
            n.alias("_n"),
            z.alias("_z"),
        )
        .filter(
            (F.col("_n") == TS7_LOOKBACK) & (F.abs(F.col("_z")) > TS7_Z)
        )
        .drop("_n", "_z")
    )


TS8_ALPHA = 0.5  # dyadic smoothing: every (1-a)^k is a power of two,
# so all scalings are EXACT in binary floating point and the fold is
# bit-identical across engines before the final 6dp rounding


@register(
    "ts8_ewma_forecast",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_obs,
           ROUND(CAST(list_reduce(
               LIST(value ORDER BY ts, event_id),
               (acc, x) -> 0.5 * acc + 0.5 * x) AS DOUBLE), 6)
               AS ewma_level
    FROM events WHERE value IS NOT NULL
    GROUP BY user_id
    """,
)
def ts8_ewma_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-ENTITY EXPONENTIAL SMOOTHING (EWMA level / one-step
    forecast): the classic recursive filter level_t = a*x_t +
    (1-a)*level_(t-1), level_1 = x_1, folded over each user's
    time-ordered value series; the final level IS the flat one-step
    forecast. a = {TS8_ALPHA} deliberately: every decay power is a
    power of two, so the multiply-halvings are exact IEEE ops and the
    fold is bit-identical across engines (the x7/mm6 parity rule) —
    only the published level is rounded.

    Shape: a recursive fold is the one aggregate windows can't
    express (each step depends on the previous RESULT, not a frame of
    inputs), so it runs as sort_array(collect_list(struct)) + ONE
    F.aggregate lambda per user — a single groupBy shuffle, state
    bounded by per-user history, no corpus-wide window, no Python.
    The oracle replays the identical fold via DuckDB's list_reduce
    (its no-init form seeds acc with the first element — exactly
    level_1 = x_1). At 100 TB the same fold runs incrementally as the
    streaming twin's one-tuple state (rolling_zscore_stream's shape
    with O(1) state)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    t_us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    series = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        t_us.alias("t"),
                        F.col("event_id").alias("e"),
                        F.col("value").alias("v"),
                    )
                )
            ),
            lambda s: s["v"],
        ).alias("vals"),
    )
    ewma = F.aggregate(
        F.slice(F.col("vals"), 2, F.size("vals") - 1),
        F.element_at(F.col("vals"), 1),
        lambda acc, x: F.lit(TS8_ALPHA) * x
        + F.lit(1 - TS8_ALPHA) * acc,
    )
    return series.select(
        "user_id", "n_obs", F.round(ewma, 6).alias("ewma_level")
    )


@register(
    "ts9_holt_forecast",
    oracle="""
    WITH folded AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_obs,
               list_reduce(
                   list_transform(LIST(value ORDER BY ts, event_id),
                                  v -> [CAST(v AS DOUBLE), 0.0]),
                   (acc, x) -> [
                       0.5 * x[1] + 0.5 * (acc[1] + acc[2]),
                       0.5 * ((0.5 * x[1] + 0.5 * (acc[1] + acc[2]))
                              - acc[1])
                       + 0.5 * acc[2]
                   ]) AS st
        FROM events WHERE value IS NOT NULL
        GROUP BY user_id
    )
    SELECT user_id, n_obs,
           ROUND(st[1], 6) AS holt_level,
           ROUND(st[2], 6) AS holt_trend,
           ROUND(st[1] + st[2], 6) AS forecast_1
    FROM folded
    """,
)
def ts9_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOLT'S LINEAR METHOD (double exponential smoothing): ts8's
    recursive level filter extended with a trend state —
    level_t = a·x_t + (1-a)(level+trend), trend_t = b(level_t -
    level_(t-1)) + (1-b)·trend — per user over the time-ordered value
    series; the one-step forecast is level + trend (the first model
    in the ladder that can FOLLOW a drifting series instead of
    lagging it). a = b = 0.5 keeps every smoothing multiply an exact
    IEEE halving (ts8's parity rule); level' appears twice in the
    trend update and is spelled out identically in both engines, so
    the duplicated sub-expression evaluates to the same double.

    Shape: ts8's exactly — the two-component state rides ONE
    F.aggregate fold whose accumulator is a 2-element double array
    (the relational form of applyInPandasWithState's (level, trend)
    tuple); single groupBy shuffle, no window, no Python. The oracle
    replays the identical fold via DuckDB list_reduce over [v, 0.0]
    pairs — its no-init form seeds acc = [x_1, 0.0], exactly the
    level_1 = x_1, trend_1 = 0 textbook initialization."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    t_us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    series = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        t_us.alias("t"),
                        F.col("event_id").alias("e"),
                        F.col("value").alias("v"),
                    )
                )
            ),
            lambda s: s["v"],
        ).alias("vals"),
    )

    def step(acc, x):
        level = acc[0]
        trend = acc[1]
        new_level = F.lit(0.5) * x + F.lit(0.5) * (level + trend)
        return F.array(
            new_level,
            F.lit(0.5) * (new_level - level) + F.lit(0.5) * trend,
        )

    st = F.aggregate(
        F.slice(F.col("vals"), 2, F.size("vals") - 1),
        F.array(F.element_at(F.col("vals"), 1), F.lit(0.0)),
        step,
    )
    return series.select(
        "user_id",
        "n_obs",
        F.round(st[0], 6).alias("holt_level"),
        F.round(st[1], 6).alias("holt_trend"),
        F.round(st[0] + st[1], 6).alias("forecast_1"),
    )


TS10_HALF = 12  # half-width of the classical 2x24 centered MA
TS10_Q = 1_000_000  # micro-unit quantization (km1's integer-exact rule)


@register(
    "ts10_seasonal_decomposition",
    oracle=f"""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h,
               CAST(SUM(CAST(FLOOR(value * {TS10_Q} + 0.5) AS BIGINT))
                    AS BIGINT) AS sq,
               COUNT(*) AS n_events
        FROM events WHERE value IS NOT NULL GROUP BY 1
    ), hq AS (
        SELECT h, n_events,
               CAST(FLOOR(CAST(sq AS DOUBLE) / n_events + 0.5)
                    AS BIGINT) AS mq
        FROM hourly
    ), spine AS (
        -- calendar spine: ROWS frames only equal calendar-hour
        -- windows on a gap-free grid, so densify first (an absent
        -- hour would silently misalign the 25-row window)
        SELECT unnest(generate_series(
            (SELECT MIN(h) FROM hq), (SELECT MAX(h) FROM hq),
            INTERVAL '1 hour')) AS h
    ), dense AS (
        SELECT s.h, hq.n_events, hq.mq
        FROM spine s LEFT JOIN hq ON s.h = hq.h
    ), seq AS (
        SELECT h, n_events, mq,
               CAST(SUM(mq) OVER (ORDER BY h ROWS BETWEEN {TS10_HALF}
                    PRECEDING AND {TS10_HALF - 1} FOLLOWING)
                  + SUM(mq) OVER (ORDER BY h ROWS BETWEEN {TS10_HALF - 1}
                    PRECEDING AND {TS10_HALF} FOLLOWING) AS BIGINT) AS t48,
               COUNT(mq) OVER (ORDER BY h ROWS BETWEEN {TS10_HALF}
                    PRECEDING AND {TS10_HALF} FOLLOWING) AS wn
        FROM dense
    ), t AS (
        SELECT h, n_events, mq,
               CASE WHEN wn = {2 * TS10_HALF + 1} THEN t48 END AS t48
        FROM seq
        WHERE mq IS NOT NULL
    ), si AS (
        SELECT EXTRACT(hour FROM h) AS hod,
               CAST(FLOOR(CAST(SUM({4 * TS10_HALF} * mq - t48) AS DOUBLE)
                          / COUNT(*) + 0.5) AS BIGINT) AS sq48
        FROM t WHERE t48 IS NOT NULL GROUP BY 1
    ), s AS (
        -- de-mean over the hour-of-day slots actually present (a
        -- gapped series can earn fewer than 24), so the seasonal
        -- indexes sum to zero exactly by construction
        SELECT hod,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM si) * sq48
                 - (SELECT CAST(SUM(sq48) AS BIGINT) FROM si) AS seasq,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM si) AS nh
        FROM si
    )
    SELECT t.h AS bucket_hour,
           CAST(t.n_events AS BIGINT) AS n_events,
           t.mq / {float(TS10_Q)} AS value_mean,
           t.t48 / {float(4 * TS10_HALF * TS10_Q)} AS trend,
           s.seasq / (s.nh * {4 * TS10_HALF * TS10_Q}) AS seasonal,
           t.mq / {float(TS10_Q)}
               - t.t48 / {float(4 * TS10_HALF * TS10_Q)}
               - s.seasq / (s.nh * {4 * TS10_HALF * TS10_Q})
               AS residual
    FROM t JOIN s ON EXTRACT(hour FROM t.h) = s.hod
    """,
)
def ts10_seasonal_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CLASSICAL ADDITIVE SEASONAL DECOMPOSITION (the moving-average
    method behind STL's initialization): the hourly event series
    splits into trend + seasonal + residual. Trend is the textbook
    2x24 centered moving average for an even period (half-weighted
    endpoints, expressed as the sum of the two offset 24-row window
    sums) over a CALENDAR SPINE — hours densified between the span's
    bounds, since ROWS frames only equal calendar windows on a
    gap-free grid — and defined only where all 25 calendar hours are
    observed; the seasonal index is the hour-of-day mean of the
    detrended series, de-meaned over the hour-of-day slots present
    so the components are identifiable; residual is what remains. The residual is the input an anomaly gate (ts7's
    z-score) should consume instead of the raw series — otherwise
    the daily cycle itself trips the detector.

    Engine parity is the hard part and uses km1's integer-exact
    rule end-to-end: values quantize once to micro-units
    (floor(v*1e6 + 0.5), exact int64), so every sum in the plan —
    the hourly sum, the two 24-row MA window sums, the per-hour-of-
    day seasonal sums — is associative integer arithmetic that no
    engine's aggregation order can perturb (the first cut summed
    DOUBLES in the MA windows, and DuckDB's segment-tree windowed
    sum vs Spark's frame scan produced 1e-14 drift that flipped
    ROUND(6) boundaries at sf0.001). Rational means re-quantize
    through floor(sum/n + 0.5) (exact inputs -> deterministic IEEE
    division -> exact int), and only the FINAL published columns
    divide back to doubles — single divisions of identical exact
    integers, bit-identical everywhere, so no ROUND is needed at
    all.

    Shape: ONE shuffle aggregates events to calendar-hour buckets
    (map-side partials collapse the stream); everything after runs
    on the hourly relation, whose size is bounded by the CALENDAR
    (24 rows/day — ~9k rows/decade), not the corpus, so the
    unpartitioned ordered window is safe at any data volume (the
    house rule's bounded-relation clause). The 24-row seasonal
    index broadcasts back. Reference parity: extension scope
    (SURVEY §2h X5)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    vq = F.floor(F.col("value") * TS10_Q + F.lit(0.5)).cast("long")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.sum(vq).alias("sq"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    hq = hourly.select(
        "h",
        "n_events",
        F.floor(
            F.col("sq").cast("double") / F.col("n_events") + F.lit(0.5)
        )
        .cast("long")
        .alias("mq"),
    )
    # Calendar spine: the ROWS frames below only equal calendar-hour
    # windows on a gap-free grid, so densify first — an hour with zero
    # events would otherwise silently shift the 25-row window off
    # calendar alignment. The spine is calendar-bounded (24 rows/day),
    # same bounded-relation posture as the hourly aggregate itself.
    spine = hq.agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    ).select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 hour"))
        ).alias("h")
    )
    dense = spine.join(hq, "h", "left")
    half = TS10_HALF
    w_lo = Window.orderBy("h").rowsBetween(-half, half - 1)
    w_hi = Window.orderBy("h").rowsBetween(-(half - 1), half)
    w_full = Window.orderBy("h").rowsBetween(-half, half)
    t48 = F.sum("mq").over(w_lo) + F.sum("mq").over(w_hi)
    # count of OBSERVED means in the full window: 25 iff every
    # calendar hour in the frame has events (edges included)
    t = dense.select(
        "h",
        "n_events",
        "mq",
        F.when(
            F.count("mq").over(w_full) == 2 * half + 1, t48
        ).alias("t48"),
    ).filter(F.col("mq").isNotNull())
    si = (
        t.filter(F.col("t48").isNotNull())
        .groupBy(F.hour("h").alias("hod"))
        .agg(
            F.floor(
                F.sum(F.lit(4 * half) * F.col("mq") - F.col("t48"))
                .cast("double")
                / F.count(F.lit(1))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("sq48")
        )
    )
    w_all = Window.partitionBy()
    s = si.select(
        "hod",
        (
            F.count(F.lit(1)).over(w_all) * F.col("sq48")
            - F.sum("sq48").over(w_all)
        ).alias("seasq"),
        F.count(F.lit(1)).over(w_all).alias("nh"),
    )
    value_mean = F.col("mq") / F.lit(float(TS10_Q))
    trend = F.col("t48") / F.lit(float(4 * half * TS10_Q))
    seasonal = F.col("seasq") / (
        F.col("nh") * F.lit(4 * half * TS10_Q)
    )
    return (
        t.join(F.broadcast(s), F.hour(F.col("h")) == F.col("hod"))
        .select(
            F.col("h").alias("bucket_hour"),
            "n_events",
            value_mean.alias("value_mean"),
            trend.alias("trend"),
            seasonal.alias("seasonal"),
            (value_mean - trend - seasonal).alias("residual"),
        )
    )
