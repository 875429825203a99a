"""Product-analytics operators (an1-an3, j10, a8): differential checks
at sf0.001 plus the invariants the oracles can't express."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

import __spark_entry__ as entrymod

from etl_project_spark.operators import analytics
from tests.util import assert_matches_oracle

ORACLED = [
    "an1_event_funnel",
    "an2_cohort_retention",
    "an3_session_paths",
    "j10_fuzzy_blocked_join",
]


@pytest.mark.parametrize("name", ORACLED)
def test_matches_oracle(spark, sf_dir, name):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert_matches_oracle(qs[name](spark, sf_dir), oracles[name], sf_dir)


def test_funnel_is_monotone(spark, sf_dir):
    rows = (
        analytics.an1_event_funnel(spark, sf_dir)
        .orderBy("step_order")
        .collect()
    )
    counts = [r.n_users for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert [r.step for r in rows] == list(analytics.FUNNEL_STEPS)


def test_cohort_day_zero_is_cohort_size(spark, sf_dir):
    """offset-0 user count per cohort equals the cohort's size (every
    user is active on their own first-seen day)."""
    ret = analytics.an2_cohort_retention(spark, sf_dir)
    from etl_project_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    sizes = (
        ev.groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("cohort_day"))
        .groupBy("cohort_day")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("cohort_day", F.col("cohort_day").cast("timestamp"))
    )
    joined = ret.filter(F.col("day_offset") == 0).join(sizes, "cohort_day")
    assert joined.filter(F.col("n_users") != F.col("n")).count() == 0


def test_fuzzy_join_bounds(spark, sf_dir):
    out = analytics.j10_fuzzy_blocked_join(spark, sf_dir)
    bad = out.filter(
        (F.col("dist") > analytics.FUZZY_MAX_DIST)
        | (F.col("key1") >= F.col("key2"))
    )
    assert bad.count() == 0


def test_hll_merge_matches_exact_within_tolerance(spark, sf_dir):
    est = analytics.a8_hll_daily_merge(spark, sf_dir).first().n_users_est
    from etl_project_spark.catalog import load_table

    exact = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert abs(est - exact) <= 0.025 * exact


NEW2 = ["dq2_iqr_outliers", "smp3_train_val_test", "an4_twap"]


@pytest.mark.parametrize("name", NEW2)
def test_matches_oracle_round2(spark, sf_dir, name):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert_matches_oracle(qs[name](spark, sf_dir), oracles[name], sf_dir)


def test_split_fractions_and_stability(spark, sf_dir):
    """90/5/5 within binomial slack; every doc assigned exactly once;
    re-evaluation yields the identical assignment (no RNG)."""
    qs = entrymod.queries()
    a = qs["smp3_train_val_test"](spark, sf_dir)
    total = a.count()
    frac = {
        r["split"]: r["n"] / total
        for r in a.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert abs(frac.get("train", 0) - 0.90) < 0.06
    assert abs(frac.get("val", 0) - 0.05) < 0.04
    assert abs(frac.get("test", 0) - 0.05) < 0.04
    b = qs["smp3_train_val_test"](spark, sf_dir)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_twap_within_day_value_range(spark, sf_dir):
    from etl_project_spark.catalog import load_table

    tw = analytics.an4_twap(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    rng = ev.groupBy(F.to_date("ts").cast("timestamp").alias("day")).agg(
        F.min("value").alias("vmin"), F.max("value").alias("vmax")
    )
    bad = tw.join(rng, "day").filter(
        (F.col("twap") < F.col("vmin")) | (F.col("twap") > F.col("vmax"))
    )
    assert bad.count() == 0


def test_pagerank_matches_numpy_power_iteration(spark, sf_dir):
    """an5 == dense numpy power iteration on the same transition matrix
    (independent reimplementation, not the SQL oracle)."""
    import numpy as np

    out = {
        r["nation"]: r["rank"]
        for r in analytics.an5_nation_pagerank(spark, sf_dir).collect()
    }
    # no dangling-mass redistribution (documented): sum <= 1, equality
    # only when every node has an out-edge
    assert out and 0 < sum(out.values()) <= 1.0 + 1e-9
    from etl_project_spark.catalog import load_table

    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    import pyspark.sql.functions as FF

    edges = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, FF.col("o_custkey") == c.c_custkey)
        .join(s, FF.col("l_suppkey") == s.s_suppkey)
        .join(
            n.withColumnRenamed("n_name", "dst"),
            FF.col("c_nationkey") == FF.col("n_nationkey"),
        )
        .drop("n_nationkey")
        .join(
            n.withColumnRenamed("n_name", "src"),
            FF.col("s_nationkey") == FF.col("n_nationkey"),
        )
        .filter(FF.col("src") != FF.col("dst"))
        .groupBy("src", "dst")
        .count()
        .collect()
    )
    names = sorted({r["src"] for r in edges} | {r["dst"] for r in edges})
    idx = {nm: i for i, nm in enumerate(names)}
    N = len(names)
    W = np.zeros((N, N))
    for r in edges:
        W[idx[r["src"]], idx[r["dst"]]] = r["count"]
    rowsum = W.sum(axis=1, keepdims=True)
    P = np.divide(W, rowsum, out=np.zeros_like(W), where=rowsum > 0)
    rank = np.full(N, 1.0 / N)
    for _ in range(analytics.PAGERANK_ITERS):
        rank = (1 - analytics.PAGERANK_DAMPING) / N + (
            analytics.PAGERANK_DAMPING * (rank @ P)
        )
    for nm in names:
        assert abs(out[nm] - rank[idx[nm]]) < 1e-5, nm


NEW3 = ["rk3_doc_chunking", "a9_value_histogram", "a10_bivariate_stats"]


@pytest.mark.parametrize("name", NEW3)
def test_matches_oracle_round3(spark, sf_dir, name):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert_matches_oracle(qs[name](spark, sf_dir), oracles[name], sf_dir)


def test_chunking_covers_documents(spark, sf_dir):
    """Chunk count = ceil(len/stride); chunk 0 is the document prefix."""
    from etl_project_spark.catalog import load_table
    from etl_project_spark.operators.ranking import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        rk3_doc_chunking,
    )

    ch = rk3_doc_chunking(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    counts = ch.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    expected = docs.select(
        "doc_id",
        F.ceil(
            F.greatest(F.length("text"), F.lit(1)) / F.lit(CHUNK_STRIDE)
        ).alias("n_expected"),
    )
    assert (
        counts.join(expected, "doc_id")
        .filter(F.col("n_chunks") != F.col("n_expected"))
        .count()
        == 0
    )
    first = ch.filter(F.col("chunk_id") == 0).join(docs, "doc_id")
    bad = first.filter(
        F.col("chunk_text") != F.substring("text", 1, CHUNK_SIZE)
    )
    assert bad.count() == 0


def test_histogram_partitions_all_rows(spark, sf_dir):
    from etl_project_spark.catalog import load_table

    qs = entrymod.queries()
    h = qs["a9_value_histogram"](spark, sf_dir)
    total = load_table(spark, sf_dir, "events").count()
    assert h.agg(F.sum("n")).first()[0] == total
    assert h.filter((F.col("bucket") < 0) | (F.col("bucket") > 19)).count() == 0


def test_bivariate_stats_in_range(spark, sf_dir):
    r = entrymod.queries()["a10_bivariate_stats"](spark, sf_dir).first()
    assert -1.0 <= r.corr_qty_price <= 1.0
    assert r.std_qty > 0


ORACLED_R6 = ["an7_rfm_segmentation", "an8_copurchase_pairs"]


@pytest.mark.parametrize("name", ORACLED_R6)
def test_matches_oracle_round6(spark, sf_dir, name):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert_matches_oracle(qs[name](spark, sf_dir), oracles[name], sf_dir)


def test_rfm_scores_cover_all_customers_in_range(spark, sf_dir):
    """every customer with an order gets exactly one row; all three
    scores sit in 1..5; quintile counts are near-balanced (each score
    bucket holds <= ceil(n/5) + ties, so no bucket may exceed 2n/5 on
    these near-unique monetary values)."""
    from etl_project_spark.catalog import load_table

    rfm = analytics.an7_rfm_segmentation(spark, sf_dir)
    rows = rfm.collect()
    n_cust = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert len(rows) == n_cust
    assert len({r.custkey for r in rows}) == n_cust
    for c in ("r_score", "f_score", "m_score"):
        vals = [r[c] for r in rows]
        assert min(vals) >= 1 and max(vals) <= 5
    # monetary is a near-unique 2dp sum: its quintiles must balance
    from collections import Counter

    m_counts = Counter(r.m_score for r in rows)
    assert set(m_counts) == {1, 2, 3, 4, 5}
    assert max(m_counts.values()) <= 2 * n_cust / 5


def test_copurchase_pair_metrics_consistent(spark, sf_dir):
    """pair counts bound item counts; confidence/support/lift agree
    with their integer numerators; part_a < part_b everywhere; every
    reported pair meets the support floor."""
    rows = analytics.an8_copurchase_pairs(spark, sf_dir).collect()
    assert rows, "support floor should keep some pairs at every sf"
    for r in rows:
        assert r.part_a < r.part_b
        assert r.n_pair >= analytics.AN8_MIN_SUP
        assert r.n_pair <= min(r.n_a, r.n_b)
        assert 0 < r.conf_a_b <= 1 and 0 < r.conf_b_a <= 1
        assert 0 < r.support <= 1
        assert r.lift > 0


def test_column_profile_diff_surfaces_planted_drift(spark, sf_dir):
    """dq13's deterministic cur build plants three drift signals the
    audit must surface with the right SIGN: text mean_len rises (the
    ' v2' re-crawl suffix), text n_distinct moves while lang's stays
    put, and n_chars' stored profile barely moves (its staleness vs
    the re-crawled text is the point). Null fractions stay 0 on this
    corpus."""
    from etl_project_spark.registry import get

    rows = {
        (r.column_name, r.metric): r
        for r in get("dq13_column_profile_diff").fn(spark, sf_dir).collect()
    }
    assert len(rows) == 12
    for (c, m), r in rows.items():
        if m == "null_frac":
            assert r.ref_value == 0.0 and r.cur_value == 0.0
        assert r.delta == round(r.cur_value - r.ref_value, 6)
    # ' v2' suffix + removals/re-ingests: text gets longer on average
    assert rows[("text", "mean_len")].delta > 0
    # lang is a closed small vocabulary: cardinality must not move
    assert rows[("lang", "n_distinct")].delta == 0.0
    # the re-ingested 17th docs duplicate content: text distinct count
    # moves by (removals of 19th docs), not by the duplicated adds
    assert rows[("text", "n_distinct")].ref_value > 0
    # stored n_chars is copied verbatim into cur rows, so its mean
    # only drifts through the 19th-doc removals / 17th-doc re-adds —
    # well under a 2% relative move on this corpus
    nc = rows[("n_chars", "mean_len")]
    assert abs(nc.delta) / nc.ref_value < 0.02
