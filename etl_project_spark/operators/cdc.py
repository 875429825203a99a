"""Change-data-capture / incremental-maintenance operators over the
``events`` stream — the warehouse-upkeep side of the reference's ETL
loop (dags/airflow_dags.py:52-66 appends every batch blindly; these
operators are the compaction, history, and exactly-once layers a
production lakehouse puts on top of that append stream).

All five are pure DataFrame compositions (no UDFs):

- ``cdc1`` — latest-value snapshot (SCD Type 1 compaction): one hash
  aggregation, deterministic ``max_by(value, struct(ts, event_id))``
  tie-break (same rule as ts4's OHLCV open/close).
- ``cdc2`` — SCD Type 2 validity intervals: one window (lead) over the
  natural key, each version row carries [valid_from, valid_to).
- ``cdc3`` — exactly-once re-delivery dedup: an incoming batch that
  overlaps already-loaded data is anti-joined on the primary key, with
  the probe side pruned to the overlap window so the join never scans
  the historical table.
- ``cdc4`` — MERGE INTO-shaped keyed upsert: one change batch applied
  to a live snapshot in one pass (insert/update/keep + NULL-tombstone
  deletes), full-outer join on the natural key.
- ``cdc5`` — incremental SCD2 merge: the batch closes each changed
  key's open interval and appends its own version chain; closed
  history passes through untouched.

Scale notes per docstring; at 100 TB the natural key (user_id,
event_type) is the partition/bucket column for all three, so snapshot
and history maintenance are shuffle-free incremental merges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_project_spark.catalog import load_table
from etl_project_spark.registry import register

# Incremental-load boundaries for cdc3: everything before WATERMARK is
# already in the warehouse; the re-delivered batch replays from
# BATCH_START (one day of overlap — e.g. an at-least-once source resent
# a closed window).
WATERMARK = "2024-01-25 00:00:00"
BATCH_START = "2024-01-24 00:00:00"


@register(
    "cdc1_latest_snapshot",
    oracle="""
    -- arg-max via ROW_NUMBER over (ts DESC, event_id DESC): deterministic
    -- under duplicate timestamps, matching Spark's max_by struct tie-break
    WITH ranked AS (
        SELECT user_id, event_type, ts, value,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts DESC, event_id DESC) AS rn,
               COUNT(*) OVER (
                   PARTITION BY user_id, event_type) AS n_versions
        FROM events
    )
    SELECT user_id, event_type, ts AS last_ts, value AS last_value,
           n_versions
    FROM ranked WHERE rn = 1
    """,
)
def cdc1_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-value snapshot per natural key (user_id, event_type) — SCD
    Type 1 compaction of an append-only change stream, the query a
    MERGE-based upsert materializes. One hash aggregation with
    ``max_by`` keyed on ``struct(ts, event_id)`` so timestamp ties
    resolve identically in Spark and the oracle.

    Shape: single shuffle on the natural key; partial aggregation
    map-side reduces each version run before the exchange, so the
    shuffle carries one row per (key, partition) — not per version. At
    100 TB the snapshot table is bucketed by the same key and each
    incremental batch folds in with a shuffle-free merge of the batch's
    own compacted snapshot."""
    ev = load_table(spark, sf_dir, "events")
    key = F.struct("ts", "event_id")
    return ev.groupBy("user_id", "event_type").agg(
        F.max("ts").alias("last_ts"),
        F.max_by("value", key).alias("last_value"),
        F.count("*").alias("n_versions"),
    )


@register(
    "cdc2_scd2_history",
    oracle="""
    SELECT user_id, event_type, value, ts AS valid_from,
           LEAD(ts) OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts ASC, event_id ASC) AS valid_to,
           (LEAD(ts) OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts ASC, event_id ASC) IS NULL) AS is_current
    FROM events
    """,
)
def cdc2_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 history build: every change event becomes a version
    row with a [valid_from, valid_to) validity interval; the open
    (valid_to IS NULL) row is the current version. The standard
    warehouse answer to "what was the value at time T" — queryable with
    a single range predicate instead of an as-of join.

    Shape: one window (lead over the natural key, ordered by (ts,
    event_id) — event_id breaks timestamp ties so both engines emit
    identical intervals). One shuffle; within-partition sort only. At
    scale the history table partitions by key-hash and appending a new
    batch touches only the affected keys' open rows (close + insert),
    never the closed history."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    valid_to = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_type",
        "value",
        F.col("ts").alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


@register(
    "cdc3_exactly_once_ingest",
    oracle=f"""
    WITH batch AS (
        SELECT * FROM events WHERE ts >= TIMESTAMP '{BATCH_START}'
    ), loaded_overlap AS (
        SELECT event_id FROM events
        WHERE ts >= TIMESTAMP '{BATCH_START}'
          AND ts < TIMESTAMP '{WATERMARK}'
    )
    SELECT event_id, ts, user_id, event_type, value
    FROM batch b
    WHERE NOT EXISTS (
        SELECT 1 FROM loaded_overlap lo WHERE lo.event_id = b.event_id
    )
    """,
)
def cdc3_exactly_once_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once ingest of an at-least-once re-delivered batch: the
    incoming batch replays everything since BATCH_START, but rows before
    WATERMARK are already in the warehouse — an anti-join on the primary
    key keeps only the genuinely-new rows. This is the dedup the
    reference's blind JDBC append lacks (its 5-min DAG re-run double
    loads; SURVEY §1) expressed as a set operation.

    The scale move is pruning the probe side to the overlap window
    [BATCH_START, WATERMARK): a late row can only collide with loaded
    rows in the window the batch replays, so the anti-join build is one
    day of keys — not the historical table. With the warehouse
    partitioned by day (as ingest/ohlcv.py lands it), that filter is
    partition pruning, and the join build side is small enough to
    broadcast."""
    ev = load_table(spark, sf_dir, "events")
    batch = ev.filter(F.col("ts") >= F.lit(BATCH_START).cast("timestamp"))
    loaded_overlap = ev.filter(
        (F.col("ts") >= F.lit(BATCH_START).cast("timestamp"))
        & (F.col("ts") < F.lit(WATERMARK).cast("timestamp"))
    ).select("event_id")
    return (
        batch.join(F.broadcast(loaded_overlap), "event_id", "left_anti")
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


def _latest_per_key(df: DataFrame) -> DataFrame:
    """(user_id, event_type, ts, value): each natural key's latest row
    under the engine-standard (ts, event_id) tie-break — cdc1's
    compaction rule, reused by the merge sides."""
    key = F.struct("ts", "event_id")
    return df.groupBy("user_id", "event_type").agg(
        F.max("ts").alias("ts"),
        F.max_by("value", key).alias("value"),
    )


def merge_snapshot(target: DataFrame, changes: DataFrame) -> DataFrame:
    """Batch re-expression of ``MERGE INTO`` over a keyed snapshot:
    ``target`` is a live snapshot (user_id, event_type, ts, value —
    no NULL values: deleted keys are absent), ``changes`` is a raw
    change batch whose per-key LATEST row decides the action — a NULL
    ``value`` is the delete tombstone (the events stream's existing
    null convention). One full outer join on the natural key emits
    insert/update/keep rows and drops deletes; the published
    ``action`` column is the merge audit.

    Shape: the batch compacts first (one hash aggregate — map-side
    partials collapse each key's version run), then ONE join against
    the snapshot. At 100 TB both sides are bucketed by the natural
    key, so the join is shuffle-free, and with the snapshot
    partitioned by key-hash the rewrite touches only partitions the
    compacted batch hits (dynamic partition overwrite — the same
    idempotent-replay posture as ingest/ohlcv.py). Replaying the same
    batch is a fixed point: inserts become same-value updates,
    tombstones find nothing to delete (pinned by
    tests/test_cdc.py::test_merge_upsert_replay_is_idempotent)."""
    src = _latest_per_key(changes).select(
        "user_id",
        "event_type",
        F.col("ts").alias("s_ts"),
        F.col("value").alias("s_value"),
    )
    tgt = target.select(
        "user_id",
        "event_type",
        F.col("ts").alias("t_ts"),
        F.col("value").alias("t_value"),
    )
    action = (
        F.when(F.col("s_ts").isNull(), F.lit("keep"))
        .when(F.col("s_value").isNull(), F.lit("delete"))
        .when(F.col("t_ts").isNull(), F.lit("insert"))
        .otherwise(F.lit("update"))
    )
    return (
        tgt.join(src, ["user_id", "event_type"], "full_outer")
        .withColumn("action", action)
        .filter(F.col("action") != "delete")
        .select(
            "user_id",
            "event_type",
            F.coalesce("s_ts", "t_ts").alias("last_ts"),
            F.when(F.col("action") == "keep", F.col("t_value"))
            .otherwise(F.col("s_value"))
            .alias("value"),
            "action",
        )
    )


@register(
    "cdc4_merge_upsert",
    oracle=f"""
    -- MERGE INTO as a full-outer-join CASE: target = the live
    -- pre-watermark snapshot (latest value per key, deleted keys
    -- absent), source = the post-watermark batch compacted to its
    -- per-key latest row (NULL value = delete tombstone)
    WITH tgt AS (
        SELECT user_id, event_type, ts, value FROM (
            SELECT user_id, event_type, ts, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE ts < TIMESTAMP '{WATERMARK}'
        ) WHERE rn = 1 AND value IS NOT NULL
    ), src AS (
        SELECT user_id, event_type, ts, value FROM (
            SELECT user_id, event_type, ts, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE ts >= TIMESTAMP '{WATERMARK}'
        ) WHERE rn = 1
    )
    SELECT user_id, event_type, last_ts, value, action FROM (
        SELECT user_id, event_type,
               COALESCE(s.ts, t.ts) AS last_ts,
               CASE WHEN s.ts IS NULL THEN t.value ELSE s.value END
                   AS value,
               CASE WHEN s.ts IS NULL THEN 'keep'
                    WHEN s.value IS NULL THEN 'delete'
                    WHEN t.ts IS NULL THEN 'insert'
                    ELSE 'update' END AS action
        FROM tgt t FULL OUTER JOIN src s USING (user_id, event_type)
    ) WHERE action <> 'delete'
    """,
)
def cdc4_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYED MERGE UPSERT — the single ``MERGE INTO``-shaped operator
    the cdc family lacked (VERDICT r9 #5): the pre-WATERMARK live
    snapshot merges one change batch (everything since WATERMARK) in
    one pass, emitting insert/update/keep rows with their merge
    action and applying NULL-tombstone deletes by omission. This is
    the lakehouse upsert the reference's append-only loop
    (dags/airflow_dags.py:52-66) never had: cdc1 answers "what is the
    latest state", cdc4 answers "apply this batch to the state I
    already have" — the incremental form that doesn't rescan
    history.

    Shape: two key-compacting hash aggregates (each one shuffle,
    map-side partials) + one full outer join on the same key — the
    aggregate exchanges already hash-partition both sides on the join
    key, so the join adds no third shuffle. See
    :func:`merge_snapshot` for the 100 TB bucketed/partition-
    overwrite posture."""
    ev = load_table(spark, sf_dir, "events")
    wm = F.lit(WATERMARK).cast("timestamp")
    target = _latest_per_key(ev.filter(F.col("ts") < wm)).filter(
        F.col("value").isNotNull()
    )
    return merge_snapshot(target, ev.filter(F.col("ts") >= wm))


@register(
    "cdc5_scd2_merge",
    oracle=f"""
    -- the oracle recomputes the FULL SCD2 history and tags each row's
    -- origin relative to the watermark; the operator must reproduce it
    -- while only ever touching open rows + the batch (the incremental
    -- contract)
    WITH v AS (
        SELECT user_id, event_type, value, ts AS valid_from,
               LEAD(ts) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts ASC, event_id ASC) AS valid_to
        FROM events
    )
    SELECT user_id, event_type, value, valid_from, valid_to,
           (valid_to IS NULL) AS is_current,
           CASE WHEN valid_from >= TIMESTAMP '{WATERMARK}'
                    THEN 'appended'
                WHEN valid_to IS NOT NULL
                     AND valid_to >= TIMESTAMP '{WATERMARK}'
                    THEN 'closed'
                ELSE 'history' END AS origin
    FROM v
    """,
)
def cdc5_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL SCD2 MERGE — cdc4's sibling for the history table:
    apply one change batch (everything since WATERMARK) to an existing
    cdc2-style validity-interval history WITHOUT recomputing it. Three
    row classes come back with an ``origin`` audit column: 'history'
    (pre-watermark rows the batch never touched — closed intervals and
    still-open rows of unchanged keys, passed through byte-identical),
    'closed' (each changed key's formerly-open row, its valid_to set
    to the key's FIRST batch timestamp), and 'appended' (the batch's
    own version rows, intervals chained by the same (ts, event_id)
    lead; last one open). The result is row-for-row the history a
    full cdc2 rebuild over all data would produce — the oracle IS
    that rebuild, tagged by watermark — but the incremental plan
    touches only O(open rows + batch), never the closed history:
    exactly how a warehouse maintains SCD2 under MERGE.

    Shape: one window per side (each one shuffle on the natural key),
    plus a per-key MIN(first batch ts) aggregate joined to the open
    rows — the aggregate's exchange matches the window partitioning,
    and at 100 TB the open-row relation is the bucketed 'current'
    partition of the history table (O(keys)), so the rebuild-sized
    scan never happens. Boundary exactness: pre-watermark ts <
    watermark <= batch ts, so the handoff interval's endpoints can
    never tie across the cut and the lead-order is the full-history
    order by construction."""
    ev = load_table(spark, sf_dir, "events")
    return scd2_merge(ev, WATERMARK)


def scd2_merge(ev: DataFrame, watermark: str) -> DataFrame:
    """The cdc5 core over any (event_id, ts, user_id, event_type,
    value) relation and watermark — parameterized so the differential
    fuzz (grammar 32) can draw watermark positions; see
    :func:`cdc5_scd2_merge` for semantics and scale posture."""
    wm = F.lit(watermark).cast("timestamp")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )

    def versions(df: DataFrame) -> DataFrame:
        valid_to = F.lead("ts").over(w)
        return df.select(
            "user_id",
            "event_type",
            "value",
            F.col("ts").alias("valid_from"),
            valid_to.alias("valid_to"),
        )

    hist = versions(ev.filter(F.col("ts") < wm))
    batch = ev.filter(F.col("ts") >= wm)
    appended = versions(batch).withColumn("origin", F.lit("appended"))
    # each changed key's first batch timestamp closes the open row
    first_change = batch.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("close_ts")
    )
    merged_hist = (
        hist.join(first_change, ["user_id", "event_type"], "left")
        .select(
            "user_id",
            "event_type",
            "value",
            "valid_from",
            F.when(
                F.col("valid_to").isNull(), F.col("close_ts")
            )
            .otherwise(F.col("valid_to"))
            .alias("valid_to"),
            F.when(
                F.col("valid_to").isNull()
                & F.col("close_ts").isNotNull(),
                F.lit("closed"),
            )
            .otherwise(F.lit("history"))
            .alias("origin"),
        )
    )
    return merged_hist.unionByName(appended).select(
        "user_id",
        "event_type",
        "value",
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
        "origin",
    )
