"""Pipeline-family (pp*) semantics: shard-packing invariants, funnel
monotonicity, mixture weights, and plan-shape pins for the composite
training-corpus operators."""

from __future__ import annotations


from etl_project_spark.plans import assert_scalable, plan_stats
from etl_project_spark.registry import all_queries


def test_shard_packing_invariants(spark, sf_dir):
    """pp1: shards are contiguous doc_id runs; every shard's token sum
    stays within one document of the budget (greedy boundary doc may
    straddle); the two-phase cumsum equals a direct global cumsum."""
    from etl_project_spark.operators.pipeline import SHARD_TOKENS

    rows = (
        all_queries()["pp1_token_shard_packing"](spark, sf_dir)
        .orderBy("doc_id")
        .collect()
    )
    # two-phase == direct global cumsum
    cum = 0
    for r in rows:
        assert r["shard_id"] == cum // SHARD_TOKENS, r
        cum += r["n_tokens"]
    # contiguity + budget: shard ids are non-decreasing along doc_id and
    # a shard's tokens (minus its straddling last doc) fit the budget
    by_shard: dict[int, int] = {}
    last_shard = 0
    for r in rows:
        assert r["shard_id"] >= last_shard
        last_shard = r["shard_id"]
        by_shard[r["shard_id"]] = by_shard.get(r["shard_id"], 0) + r["n_tokens"]
    for shard, total in by_shard.items():
        if shard != max(by_shard):  # last shard may be underfull
            assert total >= SHARD_TOKENS * 0.5
        assert total <= SHARD_TOKENS + max(r["n_tokens"] for r in rows)


def test_funnel_is_monotone(spark, sf_dir):
    """pp3: each funnel stage can only lose docs, never gain."""
    for r in all_queries()["pp3_quality_funnel"](spark, sf_dir).collect():
        assert (
            r["n_total"] >= r["n_len"] >= r["n_len_lang"] >= r["n_survive"] >= 0
        ), r


def test_mixture_shares_and_weights(spark, sf_dir):
    """pp4: shares sum to 1; weighted token mass is uniform per source
    (weight * share == 1/n_sources exactly, up to fp association)."""
    rows = all_queries()["pp4_source_mixture"](spark, sf_dir).collect()
    n = len(rows)
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert abs(r["uniform_weight"] * r["token_share"] - 1.0 / n) < 1e-9


def test_contamination_plan_avoids_regenerate_trap(spark, sf_dir):
    """pp2: the shingle array must be evaluated once per doc (inside the
    Generate), never re-evaluated per exploded row by a size()/transform
    projection above it — the tx10 O(n^2) trap."""
    import re

    df = all_queries()["pp2_contamination_check"](spark, sf_dir)
    stats = assert_scalable(df)
    assert not re.findall(
        r"Project \[[^\]]*transform\([^\]]*\]", stats.plan
    ), stats.plan


def test_mixture_is_single_pass(spark, sf_dir):
    """pp4: exactly one documents scan — the global totals come from a
    window over the tiny per-source relation, never a second corpus
    pass (a naive crossJoin(agg) recomputes the aggregate branch)."""
    df = all_queries()["pp4_source_mixture"](spark, sf_dir)
    stats = plan_stats(df)
    assert stats.scans == 1, stats.plan


def test_packing_reuses_exchange_single_scan(spark, sf_dir):
    """pp1: at execution the bucket-totals branch must reuse the
    window's Exchange (one corpus scan), not recompute the scan subtree
    — pinned on the adaptive executed plan, where reuse is decided."""
    df = all_queries()["pp1_token_shard_packing"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, plan
