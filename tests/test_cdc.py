"""CDC / incremental-maintenance operators (cdc1-cdc3), the bigram LM
(lm1), and the constraint audit (dq1): differential checks at sf0.001
plus the semantic invariants the oracles can't express."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

import __spark_entry__ as entrymod

from etl_project_spark.operators import cdc
from tests.util import assert_matches_oracle

NEW = [
    "cdc1_latest_snapshot",
    "cdc2_scd2_history",
    "cdc3_exactly_once_ingest",
    "cdc4_merge_upsert",
    "cdc5_scd2_merge",
    "lm1_bigram_model",
    "dq1_constraint_audit",
]


@pytest.mark.parametrize("name", NEW)
def test_matches_oracle(spark, sf_dir, name):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert_matches_oracle(qs[name](spark, sf_dir), oracles[name], sf_dir)


def test_cdc1_one_row_per_key(spark, sf_dir):
    snap = cdc.cdc1_latest_snapshot(spark, sf_dir)
    assert snap.count() == snap.select("user_id", "event_type").distinct().count()


def test_cdc2_intervals_partition_time(spark, sf_dir):
    """Within a key: exactly one open row, and version intervals chain —
    each valid_to equals some row's valid_from (no gaps, no overlap)."""
    hist = cdc.cdc2_scd2_history(spark, sf_dir)
    open_per_key = (
        hist.groupBy("user_id", "event_type")
        .agg(F.sum(F.col("is_current").cast("long")).alias("n_open"))
        .filter(F.col("n_open") != 1)
    )
    assert open_per_key.count() == 0
    closed = hist.filter(~F.col("is_current")).select(
        "user_id", "event_type", F.col("valid_to").alias("t")
    )
    starts = hist.select("user_id", "event_type", F.col("valid_from").alias("t"))
    dangling = closed.join(starts, ["user_id", "event_type", "t"], "left_anti")
    assert dangling.count() == 0


def test_cdc3_is_exactly_once(spark, sf_dir):
    """Re-delivered batch minus loaded == rows at/after the watermark;
    re-running the dedup on its own output is a no-op (idempotent)."""
    out = cdc.cdc3_exactly_once_ingest(spark, sf_dir)
    assert out.filter(F.col("ts") < F.lit(cdc.WATERMARK)).count() == 0
    from etl_project_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    expected = ev.filter(
        F.col("ts") >= F.lit(cdc.WATERMARK).cast("timestamp")
    ).count()
    assert out.count() == expected


def test_merge_upsert_all_actions_and_idempotent_replay(spark):
    """merge_snapshot on a planted batch exercising every MERGE arm —
    insert (new key), update (existing key, newer value), delete
    (tombstone on existing key), keep (untouched key), no-op
    (tombstone on absent key) — must emit exactly the hand-computed
    relation; and REPLAYING the same batch against the merged result
    must be a fixed point on the data columns (at-least-once delivery
    of a batch cannot corrupt the snapshot — cdc3's guarantee, in
    merge form)."""
    import datetime

    from etl_project_spark.operators.cdc import merge_snapshot

    t0 = datetime.datetime(2024, 1, 1)
    t1 = datetime.datetime(2024, 2, 1)
    t2 = datetime.datetime(2024, 2, 2)
    target = spark.createDataFrame(
        [
            (1, "click", t0, 10.0),  # will update
            (2, "click", t0, 20.0),  # will delete
            (3, "view", t0, 30.0),  # untouched -> keep
        ],
        "user_id long, event_type string, ts timestamp, value double",
    )
    batch = spark.createDataFrame(
        [
            # two versions for key 1: the later one must win
            (100, t1, 1, "click", 11.0),
            (101, t2, 1, "click", 12.0),
            # tombstone for key 2
            (102, t1, 2, "click", None),
            # brand-new key 4
            (103, t1, 4, "buy", 40.0),
            # tombstone for a key that was never live: no-op
            (104, t1, 5, "view", None),
        ],
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double",
    )
    merged = merge_snapshot(target, batch)
    got = {
        (r.user_id, r.event_type): (r.last_ts, r.value, r.action)
        for r in merged.collect()
    }
    assert got == {
        (1, "click"): (t2, 12.0, "update"),
        (3, "view"): (t0, 30.0, "keep"),
        (4, "buy"): (t1, 40.0, "insert"),
    }
    # replay: feed the merged rows back as the target and apply the
    # identical batch again — data columns must not move (inserts
    # become same-value updates, tombstones find nothing)
    target2 = merged.select(
        "user_id", "event_type", F.col("last_ts").alias("ts"), "value"
    )
    replay = {
        (r.user_id, r.event_type): (r.last_ts, r.value)
        for r in merge_snapshot(target2, batch).collect()
    }
    assert replay == {k: v[:2] for k, v in got.items()}


def test_scd2_merge_incremental_contract(spark, sf_dir):
    """cdc5's three origin classes must honor the incremental story:
    'history' rows are byte-identical pass-throughs of the
    pre-watermark cdc2 build, every 'closed' row's valid_to is its
    key's FIRST batch timestamp, 'appended' rows all start at or
    after the watermark, each key has exactly one open row, and the
    whole relation equals a full cdc2 rebuild on the data columns."""
    qs = entrymod.queries()
    rows = qs["cdc5_scd2_merge"](spark, sf_dir).collect()
    wm = None
    import datetime

    wm = datetime.datetime.fromisoformat(cdc.WATERMARK)
    by_origin = {}
    for r in rows:
        by_origin.setdefault(r.origin, []).append(r)
    assert set(by_origin) == {"history", "closed", "appended"}
    # appended rows start at/after the watermark; others before
    assert all(r.valid_from >= wm for r in by_origin["appended"])
    assert all(r.valid_from < wm for r in by_origin["history"])
    assert all(r.valid_from < wm for r in by_origin["closed"])
    # closed rows: valid_to == min batch ts of the key
    first_batch = {}
    for r in by_origin["appended"]:
        k = (r.user_id, r.event_type)
        if k not in first_batch or r.valid_from < first_batch[k]:
            first_batch[k] = r.valid_from
    for r in by_origin["closed"]:
        assert r.valid_to == first_batch[(r.user_id, r.event_type)], r
    # exactly one current row per key
    open_rows = [r for r in rows if r.is_current]
    assert len(open_rows) == len({(r.user_id, r.event_type) for r in rows})
    assert all(r.valid_to is None for r in open_rows)
    # the merged history equals a full rebuild on the data columns
    full = {
        (r.user_id, r.event_type, r.value, r.valid_from, r.valid_to)
        for r in qs["cdc2_scd2_history"](spark, sf_dir).collect()
    }
    got = {
        (r.user_id, r.event_type, r.value, r.valid_from, r.valid_to)
        for r in rows
    }
    assert got == full


def test_lm1_probabilities_normalize(spark, sf_dir):
    """Sum of P(w2|w1) over w2 is ~1 for every w1 (rounding-bounded)."""
    qs = entrymod.queries()
    lm = qs["lm1_bigram_model"](spark, sf_dir)
    bad = (
        lm.groupBy("w1")
        .agg(
            F.sum(F.col("bigram_count") / F.col("w1_count")).alias("total"),
        )
        .filter(F.abs(F.col("total") - 1.0) > 1e-9)
    )
    assert bad.count() == 0


def test_dq1_clean_corpus_has_zero_violations(spark, sf_dir):
    row = entrymod.queries()["dq1_constraint_audit"](spark, sf_dir).first()
    assert row.dup_key_violations == 0
    assert row.null_custkey_violations == 0
    assert row.nonpositive_price_violations == 0
    assert row.bad_status_violations == 0
    assert row.row_count == row.distinct_keys
