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
# r11 window (generated from artifacts through round 10): x19 + x20
# (the new IVF+PQ serving pipelines — never-attested, scheduled first
# by policy), then the ENTIRE remaining r6-attested block (tx14, ts1/ts4/ts7, s1–s3, sk3,
# mm1/8/9/11, bpe3, pp9/10/12, rk5/rk6, lm3/lm4, cdc1, j10, an5/an9,
# km1, x11, ly2 — landing these puts every oracle-able query inside
# the 5-round staleness bound permanently, VERDICT r10 #1),
# back-filled with the oldest r7 rows (p2–p5, f1–f3, a1, smp2/3/7,
# dq2/4/7/8, a9/a10/a11, dd5c, x12–x15).
_FRONT_QUERIES = [
    "x19_ivfpq_serving_topk",
    "x20_ivfpq_trained_serving",
    "tx14_quality_logit",
    "ts1_tumbling_5min",
    "ts4_ohlcv_resample",
    "ts7_rolling_zscore",
    "s1_union_all",
    "s2_intersect",
    "s3_except",
    "sk3_skew_profile",
    "mm1_media_metadata",
    "mm8_scene_cuts",
    "mm9_silence_spans",
    "mm11_video_neardup",
    "bpe3_cached_shard_packing",
    "pp9_dup_span_mask",
    "pp10_trim_dup_spans",
    "pp12_seq_composition",
    "rk5_retrieval_eval",
    "lm3_perplexity_buckets",
    "rk6_ndcg",
    "lm4_kneser_ney",
    "cdc1_latest_snapshot",
    "j10_fuzzy_blocked_join",
    "an5_nation_pagerank",
    "an9_attribution",
    "km1_kmeans_lloyd",
    "x11_cluster_eval",
    "ly2_pruning_stats",
    "p2_projection",
    "p4_derived_date",
    "p3_timestamp_parse",
    "p5_json_extract",
    "f1_eq_date_filter",
    "f2_date_arith_filter",
    "f3_categorical_filter",
    "a1_count_yesterday",
    "smp2_hash_stratified_sample",
    "dq2_iqr_outliers",
    "smp3_train_val_test",
    "a9_value_histogram",
    "a10_bivariate_stats",
    "dq4_corpus_report",
    "dq7_categorical_drift",
    "a11_rolling_active_users",
    "dd5c_simhash_md5_reference",
    "smp7_leakage_safe_split",
    "dq8_split_leakage_audit",
    "x12_ann_recall_eval",
    "x13_dim_truncation_eval",
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
