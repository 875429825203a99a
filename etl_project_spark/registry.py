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
# scramble — decides who gets driver rows. Attestation history:
# r01 core/tpch/joins, r02 dedup/similarity/text/windows/timeseries/
# setops/skew/scalarfns/mm1, r03 pipeline/ranking/cdc/analytics/
# multimodal/clustering + the new core entries. Round 4 front-loads
# (a) the six formerly hash-red rows (DuckDB HUGEINT oracle artifact,
# CAST-to-BIGINT fixed this round), (b) operators whose plans changed
# this round (dd8 exchange fusion, sd1/x3/x4 recall upgrades), then
# (c) the oldest-attested §2 anchors (r1/r2 families) to refresh their
# evidence. Slack slots past the list fall to core/tpch r01 entries
# via _MODULE_ORDER — cheap, harmless to re-earn.
_FRONT_QUERIES = [
    # round-4 additions — never driver-checked
    "bpe2_tokenize_apply", "pp6_epoch_shuffle", "pp7_dsir_weights",
    "tx12_heavy_hitters", "mm6_audio_features", "mm7_video_frame_stats",
    "rk4_reciprocal_rank_fusion", "dq3_psi_drift",
    "x8_hard_negative_mining", "ts6_interpolated_resample",
    "an6_markov_transitions", "smp4_weighted_sample",
    # (a) the six HUGEINT-oracle fixes — re-check first
    "bpe1_merge_table", "pp1_token_shard_packing", "pp3_quality_funnel",
    "pp4_source_mixture", "lm1_bigram_model", "dq1_constraint_audit",
    # (b) plan/recall changes this round
    "dd8_jaccard_prefix_join", "sd1_semantic_dedup",
    "x3_lsh_bucketed_topk", "x4_ivf_topk",
    # (c) §2 anchors last attested r1 (reference dashboard surface)
    "a2_global_minmax", "a3_daily_stats", "a3g_keyed_daily_stats",
    "t1_top1_by_value", "t2_topk_by_value", "t3_ordered_series",
    # r2-attested families due refresh
    "fn1_string_funcs", "fn2_datetime_funcs", "fn4_math_conditional",
    "w1_topn_per_key", "w2_lag_delta", "w3_running_sum",
    "w4_rank_in_group", "w5_moving_avg", "w6_distribution",
    "ts2_sliding_10min", "ts3_session_window", "ts5_gap_fill_calendar",
    "s4_rollup", "s5_cube", "s6_grouping_sets", "s7_pivot",
    "sk1_salted_agg", "sk2_salted_join",
    "dd6_embedding_neardup", "x2_vector_norms", "x5_centroid_per_label",
]

# Module order for everything NOT in _FRONT_QUERIES: proven families in
# the order they were attested (r01 first — their rows are the cheapest
# to re-earn if the driver window runs past the front list).
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
    "etl_project_spark.operators.clustering",
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
    order is decided by _canonical_names(), not by these imports —
    slot math (cap ~50): the len(_FRONT_QUERIES) front entries occupy
    the first slots, the remaining slack falls to core's r01-proven
    entries (cheap, harmless to re-attest). Pinned in
    tests/test_entry_contract.py. New queries in round 5+: put them at
    the TOP of _FRONT_QUERIES and retire proven names from it."""
    global _loaded
    if _loaded:
        return
    import importlib

    for mod in _MODULE_ORDER:
        importlib.import_module(mod)
    _loaded = True
