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
# scramble — decides who gets driver rows. Rounds 1+2 proved
# core/tpch/joins (r01) and dedup/similarity/text/windows/timeseries/
# setops/skew/scalarfns/mm1 (r02); round 3 front-loads the 30 queries
# that have never had a driver row (the round-2 additions) plus the
# three formerly array-erroring rows (dd5/dd5c/fn3, now stringified)
# and x7 (same array hazard, fixed preemptively). Explicit per-query
# list because module granularity can't express it: core holds 26
# queries of which only 7 are unattested.
_FRONT_QUERIES = [
    # round-3 additions
    "tx11_rabin_winnowing",
    "dd8_jaccard_prefix_join",
    "km1_kmeans_lloyd",
    "sd1_semantic_dedup",
    "mm5_perceptual_hash_dedup",
    "bpe1_merge_table",
    "lm2_perplexity_score",
    "ly1_zorder_key",
    # pipeline (6)
    "pp1_token_shard_packing", "pp2_contamination_check",
    "pp3_quality_funnel", "pp4_source_mixture", "pp5_repeated_ngrams",
    "x7_int8_quantize",
    # ranking / LM (4)
    "rk1_bm25_score", "rk2_tfidf_postings", "lm1_bigram_model",
    "rk3_doc_chunking",
    # cdc (3)
    "cdc1_latest_snapshot", "cdc2_scd2_history", "cdc3_exactly_once_ingest",
    # analytics (7)
    "an1_event_funnel", "an2_cohort_retention", "an3_session_paths",
    "j10_fuzzy_blocked_join", "a8_hll_daily_merge", "an4_twap",
    "an5_nation_pagerank",
    # multimodal beyond mm1 (3)
    "mm2_media_features", "mm3_frame_sample", "mm4_media_resize",
    # new core entries (7)
    "a7_approx_percentile", "smp2_hash_stratified_sample",
    "dq1_constraint_audit", "dq2_iqr_outliers", "smp3_train_val_test",
    "a9_value_histogram", "a10_bivariate_stats",
    # formerly driver-err rows, now scalar-projected (3)
    "dd5_simhash_buckets", "dd5c_simhash_md5_reference", "fn3_array_funcs",
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
    slot math (cap ~50): the 33 _FRONT_QUERIES occupy slots 1-33, the
    ~17 slack slots fall to core's r01-proven entries (cheap,
    harmless to re-attest). Pinned in tests/test_entry_contract.py.
    New queries in round 4+: put them at the TOP of _FRONT_QUERIES and
    retire proven names from it."""
    global _loaded
    if _loaded:
        return
    import importlib

    for mod in _MODULE_ORDER:
        importlib.import_module(mod)
    _loaded = True
