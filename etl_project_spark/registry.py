"""Query registry: the single source of truth wiring operators to the
driver contract (``__spark_entry__.queries()`` / ``oracle_sql()``).

Each operator module registers its queries with :func:`register`; the
entry-point module just re-exports the collected dicts. A query is a
callable ``(spark, sf_dir) -> DataFrame``; ``oracle`` is the equivalent
ANSI SQL DuckDB runs on the same Parquet (None for non-SQL-expressible
operators → the driver records a weaker rows-only check).
"""

from __future__ import annotations

import dataclasses
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclasses.dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str
    # For approximate operators (HLL counts, sampled aggregates): an exact
    # SQL oracle plus a relative tolerance. Not exposed to the driver's
    # hash-equality gate (it would always mismatch); the local checker
    # (tools/check_correctness.py) compares numerics within rtol instead
    # of recording a bare rows-only result.
    approx_oracle: str | None = None
    rtol: float | None = None


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    approx_oracle: str | None = None,
    rtol: float | None = None,
):
    """Decorator: add a query to the registry.

    The wrapped function keeps engine-standard session prep (UTC tz,
    nanos-reader conf) so it works under the driver's vanilla session.
    """

    def deco(fn: QueryFn) -> QueryFn:
        from etl_project_spark.session import prepare

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            prepare(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name, wrapped, oracle, fn.__doc__ or "", approx_oracle, rtol
        )
        _SOURCE_MODULE[name] = fn.__module__
        return wrapped

    return deco


# The correctness driver evaluates queries in dict order and caps how
# many it checks per round (~50), so export order — not Python import
# order, which pytest collection or any direct operator import can
# scramble — decides who gets driver rows.
#
# As of round 8 this list is GENERATED, not hand-curated: it is the
# greedy oldest-first rotation computed by tools/rotation.py from the
# committed CORRECTNESS_r*.json artifacts (never-attested oracle-able
# queries first, then ascending last-driver-green round). Regenerate
# with `python tools/rotation.py --write` (also refreshes ROTATION.md,
# the published query → last-green-round staleness table);
# tests/test_entry_contract.py::test_front_load_is_the_generated_rotation
# pins this literal equal to the computed schedule, so a new query or a
# new CORRECTNESS artifact forces a regeneration. The list stays a
# static literal so importing the package never reads artifact files.
#
# Oracle-less queries are EXCLUDED from driver windows permanently
# (tools/rotation.py:excluded_from_window — currently a5, a7, a8, dd5,
# dd5b, smp1, x3, x4, x9): approximate/RNG/hash-bit by nature, a driver
# row for them can only ever read `err: no_oracle` (r3 and r7 each
# burned a slot proving it). Their evidence is the rtol compare every
# local sweep runs (approx_oracle/rtol in this registry), the recall
# measurements in RECALL.json, and deterministic hash-green twins
# (x6/dd5c/x14/x15, a12/a13/a14) that the rotation DOES schedule.
#
# Rotation math: the oracle-able count over a 50-row cap gives the
# provable steady-state staleness bound ceil(oracle_able / 50) — see
# ROTATION.md for the current generated figures; pinned by
# test_staleness_bound_holds_after_planned_window.
#
# r13 window (generated from artifacts through round 12, REATTEST
# cleared — x20's r12 driver row attests the current implementation):
# pure staleness rotation over the oldest r8 block — the sketch/eval
# families (x2/x5/x8/x16, dq10, tx12/tx16-tx18, lm6/lm7), the window
# family (w1-w4/w6/w8), ts9, fn5, the media/pipeline r8 rows (mm2-mm5/
# mm13, pp2/pp5/pp14, smp8, rk8), the analytics scorecards (an10-an12,
# a12-a14, dq11), ly1, and the oldest core/TPC-H rows (a4/a6, dq3,
# dq13, q1/q3/q4/q5/q6/q10/q13/q18, sq1). Every oracle-able query
# stays inside the provable staleness bound (ROTATION.md), per
# VERDICT r11 #1.
_FRONT_QUERIES = [
    "x2_vector_norms",
    "x5_centroid_per_label",
    "x8_hard_negative_mining",
    "dq10_embedding_drift",
    "x16_range_search",
    "tx12_heavy_hitters",
    "tx16_code_detection",
    "lm6_tokenizer_fertility",
    "tx17_repetition_ratios",
    "tx18_lexical_diversity",
    "lm7_zipf_slope",
    "w1_topn_per_key",
    "w2_lag_delta",
    "w3_running_sum",
    "w4_rank_in_group",
    "w6_distribution",
    "w8_range_frame_trailing_hour",
    "ts9_holt_forecast",
    "fn5_map_funcs",
    "mm2_media_features",
    "mm3_frame_sample",
    "mm5_perceptual_hash_dedup",
    "mm4_media_resize",
    "mm13_container_sniff",
    "pp2_contamination_check",
    "pp5_repeated_ngrams",
    "smp8_systematic_pps_sample",
    "pp14_context_window_audit",
    "rk8_query_likelihood",
    "an10_new_vs_returning",
    "an11_engagement_gini",
    "dq11_weekly_scorecard",
    "an12_time_to_convert",
    "a12_hll_md5_reference",
    "a13_countmin_heavy_hitters",
    "a14_histogram_quantile_sketch",
    "ly1_zorder_key",
    "a4_distinct_agg",
    "a6_stat_moments",
    "dq3_psi_drift",
    "dq13_column_profile_diff",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "q4_order_priority",
    "q13_custdist",
    "q18_large_orders",
    "sq1_scalar_subquery",
    "q5_region_revenue",
    "q10_returned_items",
]




# Module order for everything NOT in _FRONT_QUERIES. The front list is
# held at exactly the driver's ~50-row cap, so this is never reached
# by the driver; it only decides ordering inside __spark_entry__
# exports.
_MODULE_ORDER = [
    "etl_project_spark.operators.core",
    "etl_project_spark.operators.tpch",
    "etl_project_spark.operators.joins",
    "etl_project_spark.operators.dedup",
    "etl_project_spark.operators.similarity",
    "etl_project_spark.operators.text",
    "etl_project_spark.operators.windows",
    "etl_project_spark.operators.timeseries",
    "etl_project_spark.operators.setops",
    "etl_project_spark.operators.skew",
    "etl_project_spark.operators.scalarfns",
    "etl_project_spark.operators.multimodal",
    "etl_project_spark.operators.pipeline",
    "etl_project_spark.operators.ranking",
    "etl_project_spark.operators.cdc",
    "etl_project_spark.operators.analytics",
    "etl_project_spark.operators.sketches",
    "etl_project_spark.operators.clustering",
    "etl_project_spark.operators.graph",
    "etl_project_spark.operators.stats",
    "etl_project_spark.sources.tables",  # ly1 z-order layout key
]

_SOURCE_MODULE: dict[str, str] = {}


def _canonical_names() -> list[str]:
    """Registry names: the explicit front-load list first (in list
    order), then everything else by (canonical module rank,
    within-module registration order). Within one module, registration
    order equals source order no matter when the module was imported,
    so the result is import-order-independent."""
    front = {name: i for i, name in enumerate(_FRONT_QUERIES)}
    rank = {m: i for i, m in enumerate(_MODULE_ORDER)}
    seq = {name: i for i, name in enumerate(_REGISTRY)}
    return sorted(
        _REGISTRY,
        key=lambda n: (
            front.get(n, len(front)),
            rank.get(_SOURCE_MODULE[n], len(rank)),
            seq[n],
        ),
    )


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: _REGISTRY[name].fn for name in _canonical_names()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {
        n: _REGISTRY[n].oracle
        for n in _canonical_names()
        if _REGISTRY[n].oracle is not None
    }


def get(name: str) -> QuerySpec:
    _ensure_loaded()
    return _REGISTRY[name]


_loaded = False


def _ensure_loaded() -> None:
    """Import every operator module so its @register calls run. Export
    order is decided by _canonical_names(), not by these imports.
    After adding a query (or when a new CORRECTNESS artifact lands),
    regenerate the window: `python tools/rotation.py --write` and paste
    the printed list over _FRONT_QUERIES — the contract tests fail
    until the literal matches the computed schedule."""
    global _loaded
    if _loaded:
        return
    import importlib

    for mod in _MODULE_ORDER:
        importlib.import_module(mod)
    _loaded = True
