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
# scramble — decides who gets driver rows. Attestation history (union
# of CORRECTNESS_r01–r06): every oracle-bearing registry row has >= 1
# green driver row EXCEPT the 22 ops added across round 6's three
# sessions that never fit the r6 cap — VERDICT r6 #1 names them the
# single highest-leverage rotation target, so they take the first
# slots this round. Then, per VERDICT r6 #2, the two NEW deterministic
# ANN twins (x14/x15) earn first attestation — they exist precisely so
# the window stops carrying x3/x4-style `no_oracle` burn rows (x3, x4,
# dd5b stay OUT of the window; their recall evidence lives in
# RECALL.json and their deterministic twins x6/dd5c/x14/x15 carry the
# hash signal). Then the 13 rows displaced by r6's session-3 additions
# minus a7/a8/dd5 (see below), then the 11 trivial r03 rows deferred
# since r6, then 5 of the 12 r03-retired rows. Exactly 50 names.
#
# Rotation schedule (published per VERDICT r6 #3; also SURVEY §16):
# the registry (201 queries) is ~4× the driver cap, so the steady-state
# rotation period is 4 rounds. Queued for r08's window: the remaining
# r03-retired rows ly1_zorder_key, mm2-mm5, pp2_contamination_check,
# pp5_repeated_ngrams (last attested r03), any ops new in r7, then the
# oldest r04 block. a7_approx_percentile, a8_hll_daily_merge and
# dd5_simhash_buckets are EXCLUDED from driver windows permanently:
# they are approximate/hash-bit by nature, so a driver row can only
# ever read `err: no_oracle` (r03 showed exactly that) — their
# evidence is the rtol compare every local sweep runs
# (approx_oracle/rtol in this registry) plus the dd5b/dd5c pytest pin,
# and as of r7 the sketch family ALSO has driver-green deterministic
# twins on the x14/x15 pattern: a12_hll_md5_reference (HLL replayed
# from first principles — a5/a8's algorithm), a13_countmin_heavy_hitters
# and a14_histogram_quantile_sketch (a7's quantile job, histogram
# form). Burning a window slot on the rtol originals re-records
# nothing.
_FRONT_QUERIES = [
    # (a) first driver attestation: the 22 r6 ops that never fit r6's
    # cap (VERDICT r6 #1 list, verbatim). x9 is rows-only by nature
    # (trained PQ codebooks); its recall@5 is 1.0/1.0/1.0 at
    # sf0.01/sf0.1/planted in RECALL.json and its deterministic twin
    # x15 (below) carries the hash-checkable pipeline.
    "a11_rolling_active_users", "an7_rfm_segmentation",
    "an8_copurchase_pairs", "dq4_corpus_report", "dq7_categorical_drift",
    "dq8_split_leakage_audit", "lm5_bigram_eval", "mm10_shot_keyframes",
    "mm12_audio_neardup", "pp8_sequence_packing", "pp13_curriculum_phases",
    "rk7_prf_expansion", "smp5_dsir_resample", "smp6_temperature_mixture",
    "smp7_leakage_safe_split", "ts8_ewma_forecast", "tx13_shared_span_index",
    "tx15_tfidf_keywords", "w7_running_drawdown", "x12_ann_recall_eval",
    "x13_dim_truncation_eval", "x9_pq_topk",
    # (b) NEW in r7: hash-checkable IVF/PQ reference twins (the
    # x6/dd5c pattern extended to the remaining two ANN families).
    "x14_ivf_reference_topk", "x15_pq_reference_topk",
    # (c) the oracle-bearing rows displaced by r6's session-3
    # additions (VERDICT r6 #3 backfill list minus a7/a8/dd5 — see
    # schedule note above).
    "p5_json_extract", "a10_bivariate_stats", "an4_twap",
    "dq2_iqr_outliers", "dd5c_simhash_md5_reference", "an1_event_funnel",
    "an2_cohort_retention", "an3_session_paths", "cdc2_scd2_history",
    "cdc3_exactly_once_ingest",
    # (d) the 11 trivial r03 rows deferred since the r6 rotation.
    "p2_projection", "p3_timestamp_parse", "p4_derived_date",
    "f1_eq_date_filter", "f2_date_arith_filter", "f3_categorical_filter",
    "a1_count_yesterday", "a9_value_histogram", "fn3_array_funcs",
    "x7_int8_quantize", "smp2_hash_stratified_sample",
    # (e) 5 of the 12 r03-retired rows (the rest queue for r08 — see
    # schedule note above).
    "smp3_train_val_test", "tx11_rabin_winnowing", "rk1_bm25_score",
    "rk2_tfidf_postings", "rk3_doc_chunking",
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
