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
# multimodal/clustering + the new core entries, r04 the remaining 50
# (every registry row now has >= 1 attestation). Round 5 front-loads
# (a) the rows whose RESULTS or plans changed this round — their r04
# attestations no longer describe the shipped code, so re-earning them
# outranks pure rotation (the one deliberate exception to "no row
# already attested in r04"); then (b) tx4/tx6/tx9 (displaced in r4)
# and (c) every r01-attested row — the oldest evidence in the tree,
# and the tpch/joins family has had plan-affecting conf changes since
# r01 — plus the oldest r02 rows as slack. Slack past the list falls
# to core r03 entries via _MODULE_ORDER.
_FRONT_QUERIES = [
    # (a) changed this round: bpe1/bpe2 retrained at 64 merges (new
    # rows/values + Arrow-kernel apply), sd1 nprobe 3 (new rows), ts6
    # closed right boundary (new semantics), dq3 width clamp, dd8/lm2/
    # pp7 single-scan materialization (plan change)
    "bpe1_merge_table", "bpe2_tokenize_apply", "sd1_semantic_dedup",
    "ts6_interpolated_resample", "dq3_psi_drift",
    "dd8_jaccard_prefix_join", "lm2_perplexity_score", "pp7_dsir_weights",
    # (b) displaced in r4, last attested r02
    "tx4_quality_filter", "tx6_langid", "tx9_pii_redact",
    # (c) every row last attested r01 — core aggregates/sorts, the full
    # TPC-H suite, the join family
    "a4_distinct_agg", "a5_approx_distinct", "a6_stat_moments",
    "smp1_stratified_sample", "sq1_scalar_subquery",
    "q1_pricing_summary", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_order_priority", "q5_region_revenue", "q6_forecast_revenue",
    "q8_market_share", "q9_product_profit", "q10_returned_items",
    "q11_important_parts", "q12_late_shipments", "q13_custdist",
    "q14_promo_revenue", "q15_top_supplier", "q16_supplier_cnt",
    "q17_small_qty_revenue", "q18_large_orders", "q19_disjunctive_revenue",
    "q20_promo_suppliers", "q21_waiting_suppliers", "q22_idle_customers",
    "j1_broadcast_dim_join", "j2_fact_fact_join", "j3_semi_join",
    "j4_anti_join", "j5_outer_join", "j6_asof_join", "j7_nation_flows",
    "j8_part_revenue", "j9_range_join",
    # slack: the oldest r02-attested dedup rows
    "dd1_exact_dedup", "dd2_fingerprint_dedup", "dd3_jaccard_pairs",
    "dd4_minhash_lsh_pairs",
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
