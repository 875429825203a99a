"""Benchmark runner (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Headline set: the scan/join/agg/window/timeseries core (the shapes that
dominate a 100 TB warehouse) plus one representative from each extension
family (dedup, similarity, text). Per query: one untimed warmup then N
timed back-to-back runs; "value" is the SUM OF PER-QUERY MEDIANS (the
single headline since r9 — self-described by "headline":
"sum_of_per_query_medians"; min-of-N floors stay in queries_min/
extended_min inside BENCH_DETAIL.json for r1–r8 continuity).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_project_spark.registry import all_queries  # noqa: E402
from etl_project_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q8_market_share",
    "q21_waiting_suppliers",
    "a3_daily_stats",
    # the reference's own dashboard surface (sql/Redshift_queries.sql):
    # keyed daily stats + top-1-by-measure, perf-tracked at bench scale
    "a3g_keyed_daily_stats",
    "t1_top1_by_value",
    "a4_distinct_agg",
    "t2_topk_by_value",
    "j2_fact_fact_join",
    "j6_asof_join",
    "w1_topn_per_key",
    "ts1_tumbling_5min",
    "ts4_ohlcv_resample",
    "dd2_fingerprint_dedup",
    "tx3_token_topk",
    "x1_topk_cosine_exact",
]

# LLM-pipeline scale representatives, timed once each and reported under
# "extended" — kept OUT of the headline total so value/queries stay
# comparable against BENCH_BASELINE.json round over round.
EXTENDED_QUERIES = [
    "dd4_minhash_lsh_pairs",
    "dd8_jaccard_prefix_join",
    "dd7_dup_clusters",
    "dd5b_simhash_multiprobe",
    "x3_lsh_bucketed_topk",
    "tx8_gopher_quality",
    "mm2_media_features",
    "smp2_hash_stratified_sample",
    "pp1_token_shard_packing",
    "pp2_contamination_check",
    "tx10_winnowing_fingerprint",
    "tx11_rabin_winnowing",
    "pp5_repeated_ngrams",
    "lm1_bigram_model",
    "cdc1_latest_snapshot",
    "an2_cohort_retention",
    "an3_session_paths",
    "j10_fuzzy_blocked_join",
    "km1_kmeans_lloyd",
    "sd1_semantic_dedup",
    "mm5_perceptual_hash_dedup",
    "bpe1_merge_table",
    "lm2_perplexity_score",
    "bpe2_tokenize_apply",
    "pp6_epoch_shuffle",
    "pp7_dsir_weights",
    "tx12_heavy_hitters",
    "mm6_audio_features",
    "mm7_video_frame_stats",
    "rk4_reciprocal_rank_fusion",
    "dq3_psi_drift",
    "x8_hard_negative_mining",
    "ts6_interpolated_resample",
    "an6_markov_transitions",
    "smp4_weighted_sample",
    "bpe3_cached_shard_packing",  # r6: packer on real BPE counts
    "x9_pq_topk",  # r6: PQ/ADC compressed ANN
    # late r6 additions
    "q7_volume_shipping",
    "lm3_perplexity_buckets",
    "dd9_canonical_keep",
    "dd10_dup_graph_stats",
    "dq5_neardup_rate_by_source",
    "rk6_ndcg",
    "pp9_dup_span_mask",
    "tx14_quality_logit",
    "lm4_kneser_ney",
    "x10_mmr_topk",
    "mm8_scene_cuts",
    "pp10_trim_dup_spans",
    # session-3 r6 additions
    "pp11_dup_weighted_keep",
    "mm11_video_neardup",
    "pp12_seq_composition",
    "an9_attribution",
    "dq9_source_overlap_matrix",
    "mm12_audio_neardup",
    "x13_dim_truncation_eval",
    "ts8_ewma_forecast",
    "lm5_bigram_eval",
    "pp13_curriculum_phases",
    "rk7_prf_expansion",
    "a11_rolling_active_users",
    # r7 additions
    "x14_ivf_reference_topk",
    "x15_pq_reference_topk",
    "a12_hll_md5_reference",
    "a13_countmin_heavy_hitters",
    "a14_histogram_quantile_sketch",
    "dq10_embedding_drift",
    "ts9_holt_forecast",
    "tx16_code_detection",
    "lm6_tokenizer_fertility",
    "an10_new_vs_returning",
    "an11_engagement_gini",
    "dq11_weekly_scorecard",
    "rk8_query_likelihood",
    "j12_asof_tolerance_join",
    "fn5_map_funcs",
    "tx17_repetition_ratios",
    "mm13_container_sniff",
    "x16_range_search",
    "an12_time_to_convert",
    # r8 additions
    "tx18_lexical_diversity",
    "smp8_systematic_pps_sample",
    "pp14_context_window_audit",
    "lm7_zipf_slope",
    "dd12_containment_pairs",
    "dq12_corpus_diff",
    "w8_range_frame_trailing_hour",
    # r9 additions
    "x17_hamming_topk",
    "pp15_dedup_weighted_mixture",
    "lm8_cross_source_entropy",
    "ts10_seasonal_decomposition",
    "km2_simplified_silhouette",
    "a15_mrl_quantile_sketch",
    "dq13_column_profile_diff",
    # r10 additions
    "cdc4_merge_upsert",
    "cdc5_scd2_merge",
    "x18_binary_shortlist_rerank",
    # r11 additions
    "x19_ivfpq_serving_topk",
    "x20_ivfpq_trained_serving",
    # r12 additions
    "gr1_node_triangles",
    "gr2_kcore_layers",
    "gr3_graph_profile",
    "dq14_ks_drift",
    "an13_kaplan_meier",
    "a16_grouped_ols",
    "gr4_edge_embeddedness",
    "dq15_mannwhitney_u",
]


# Queries whose expensive branch hangs off a LEFT JOIN on an
# aggregate's unique keys: the bench's count() action lets the planner
# ELIMINATE that branch entirely (measured r12: gr1 count 0.64 s vs
# noop 3.8 s, gr4 1.0 vs 6.2 s), so count-based numbers measure plan
# pruning, not the declared computation. For these, BENCH_DETAIL.json
# additionally records a FULL-COMPUTE metric (guide §1.4 noop sink —
# computes every column of every row) under "full_compute"; the
# count() figures stay untouched in queries/extended for
# round-over-round continuity (VERDICT r12 #1).
FULL_COMPUTE_QUERIES = [
    "gr1_node_triangles",
    "gr3_graph_profile",
    "gr4_edge_embeddedness",
]


def resolve_detail_path(
    env_path: str | None, subset: bool, unreliable: bool
) -> str:
    """Where the full bench record lands. An explicit
    $SPARK_GRAFT_DETAIL_PATH always wins; otherwise the committed
    BENCH_DETAIL.json is protected from two clobber modes:
    - unreliable runs (>=3 noisy headline queries — ambient load) go to
      BENCH_DETAIL_UNRELIABLE.json (r8-era guard), and
    - SUBSET runs (SPARK_GRAFT_BENCH_QUERIES set) go to
      BENCH_DETAIL_SUBSET.json (VERDICT r12 #6/#8: r12 inherited a
      one-query re-time that had replaced the 126-query artifact).
    """
    if env_path:
        return env_path
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    if subset:
        return path.replace("BENCH_DETAIL.json", "BENCH_DETAIL_SUBSET.json")
    if unreliable:
        return path.replace(
            "BENCH_DETAIL.json", "BENCH_DETAIL_UNRELIABLE.json"
        )
    return path


def run_query(qs, name, spark, sf_dir) -> float:
    t0 = time.time()
    df = qs[name](spark, sf_dir)
    n = df.count()  # force full execution
    assert n >= 0
    return time.time() - t0


def run_query_noop(qs, name, spark, sf_dir) -> float:
    """Time one query with the noop sink (guide §1.4): eagerly computes
    EVERY column of EVERY row — no count-path pruning."""
    t0 = time.time()
    df = qs[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    # the driver captures a bounded tail of stdout and parses the LAST
    # line as JSON (round 3's record was clipped mid-line -> parsed:null):
    # keep stdout pristine — no Spark console progress, and the result
    # line is kept compact (full detail goes to BENCH_DETAIL.json).
    spark = get_spark(
        "bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    # Silence CacheManager's re-persist warnings (VERDICT r8 #4): each
    # timed pass rebuilds an identical logical plan, and its persist()
    # matches the previous pass's still-cached entry — a benign no-op
    # that logs "Asked to cache already cached data" into the stdout
    # tail the driver parses. No Python-side guard can prevent it
    # (DataFrame.is_cached is object-local, it can't see a prior
    # pass's entry for a freshly-built plan), so drop that one logger
    # to ERROR for the bench process only.
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.CacheManager",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass
    qs = all_queries()
    # Per-query protocol: one untimed warmup then min of N timed runs,
    # all CONSECUTIVE. Warmup eats Janino/C2 compilation of the
    # AQE-chosen plan (first-run vs warm is 2-10x, compile-dominated:
    # measured dd8 12.6 -> 7.5 -> 3.7 -> 2.9 s); min-of-N reads through
    # ambient driver-machine load (round-2 showed >1.3x inflation on a
    # single pass). Runs are back-to-back per query — the earlier
    # interleaved-pass design let the ~40 other queries' generated
    # classes flush each query's JIT'd code between its passes
    # (-XX:+UseCodeCacheFlushing), so every "warm" pass recompiled and
    # heavyweights read 2.5x over steady state. Steady state is the
    # number that scales: at real data volume compile amortizes to 0.
    # BENCH_BASELINE.json is recorded under this same protocol (r4).
    # §14.3 median-vs-median spread protocol (VERDICT r6 #5): ambient
    # noise is the dominant bench signal on this shared host (cdc1 read
    # 1.36-2.6x across sessions with zero code change), and min-of-N is
    # a weak estimator under it — a lucky floor hides drift, an unlucky
    # one flags phantoms. Each query therefore records min (the
    # contract figure, comparable with every prior round), median-of-N
    # and spread (max-min of the timed runs); regression flags key on
    # median-vs-baseline-median when the baseline carries one
    # ("medians"/"extended_medians" maps), falling back to min-vs-min
    # for queries not yet re-baselined under this protocol.
    stats: dict[str, dict] = {}

    def merge_stats(name: str, s: dict) -> None:
        """Fold one pass's stats in. median/spread describe the BEST
        (lowest-median) pass — the number that scales — but max_spread
        aggregates across ALL passes so the committed noise figure
        isn't survivorship-biased toward the luckiest pass (ADVICE r7:
        the old keep-lowest-median-entry dropped the noisy passes'
        spread entirely); n counts every timed run."""
        prev = stats.get(name)
        if prev is None:
            s["max_spread"] = s["spread"]
            stats[name] = s
            return
        best = s if s["median"] < prev["median"] else prev
        stats[name] = {
            "median": best["median"],
            "spread": best["spread"],
            "max_spread": max(prev.get("max_spread", prev["spread"]),
                              s["spread"]),
            "n": prev["n"] + s["n"],
        }

    def bench_query(name: str, n_timed: int) -> float:
        run_query(qs, name, spark, sf_dir)  # warmup (compile)
        runs = sorted(
            run_query(qs, name, spark, sf_dir) for _ in range(n_timed)
        )
        med = runs[len(runs) // 2] if len(runs) % 2 else (
            runs[len(runs) // 2 - 1] + runs[len(runs) // 2]
        ) / 2
        merge_stats(name, {
            "median": round(med, 3),
            "spread": round(runs[-1] - runs[0], 3),
            "n": n_timed,
        })
        return round(runs[0], 3)

    def retime_in_subprocess(n: str) -> tuple[float, dict | None] | None:
        """Re-time one query in a FRESH subprocess (the isolation
        protocol): a ~55-query process accumulates JVM state that can
        keep one query 40% over its fresh-process floor; the fresh
        floor is the number that scales. Returns (min_time, stats) or
        None if the subprocess run failed."""
        import subprocess
        import tempfile

        fd, tfp = tempfile.mkstemp(suffix=".json")
        os.close(fd)
        env = dict(
            os.environ,
            SPARK_GRAFT_BENCH_QUERIES=n,
            SPARK_GRAFT_DETAIL_PATH=tfp,
            SPARK_GRAFT_NO_RECHECK="1",
        )
        try:
            subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                timeout=600,
                check=False,
            )
            det = json.load(open(tfp))
            t2 = det.get("queries_min", {}).get(n) or det.get(
                "extended_min", {}
            ).get(n)
            if t2 is not None:
                return t2, det.get("stats", {}).get(n)
            return None
        except Exception:
            return None  # keep the in-process figure
        finally:
            os.unlink(tfp)

    # bench-environment guard (VERDICT r7 #8): ambient load on this
    # shared host is the dominant noise source — record it with the run
    env_guard = {
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
        "n_procs_start": len(
            [p for p in os.listdir("/proc") if p.isdigit()]
        ),
    }

    # optional subset (comma-separated names) — used by the contract
    # smoke test and for quick per-query iteration
    only = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    only_set = set(only.split(",")) if only else None
    headline = [n for n in BENCH_QUERIES if only_set is None or n in only_set]
    ext_names = [
        n for n in EXTENDED_QUERIES if only_set is None or n in only_set
    ]
    timings = {name: bench_query(name, 3) for name in headline}
    extended = {name: bench_query(name, 3) for name in ext_names}

    # full-compute metric (noop sink) for the count-prunable queries —
    # warmup + median of 3, same per-query protocol as the main loop
    full_compute: dict[str, float] = {}
    for name in FULL_COMPUTE_QUERIES:
        if only_set is not None and name not in only_set:
            continue
        run_query_noop(qs, name, spark, sf_dir)  # warmup
        runs = sorted(
            run_query_noop(qs, name, spark, sf_dir) for _ in range(3)
        )
        full_compute[name] = round(runs[1], 3)

    def med_map(names) -> dict[str, float]:
        return {n: stats[n]["median"] for n in names if n in stats}

    out = {
        "metric": "headline_queries_total_wall",
        # ONE headline number (VERDICT r8 #3): the sum of per-query
        # medians-of-N — the robust estimator under the ambient noise
        # that dominated r7/r8's min-based readings (6.068 vs 6.842 vs
        # 6.075 from one tree). "queries" carries the per-query medians
        # so sum(queries) == value; the min-of-N floors (the r1–r8
        # contract figure) stay in queries_min/extended_min for
        # history. value/queries/regressions are all finalized AFTER
        # every retiming pass below (ADVICE r8: the old flow froze
        # regressions before the noisy-guard retiming).
        "headline": "sum_of_per_query_medians",
        "value": 0.0,
        "unit": "sec",
        "queries": {},
        "sf": sf,
    }
    # round-over-round tracking: compare per-query medians against the
    # committed baseline medians (BENCH_BASELINE.json) and surface
    # >=1.3x slowdowns so a plan regression is visible per query, not
    # hidden inside the total.
    base_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json"
    )
    base = None
    base_med: dict = {}
    base_ext_med: dict = {}
    if os.path.exists(base_path):
        b = json.load(open(base_path))
        if b.get("sf") == sf:
            base = b
            base_med = b.get("medians", {})
            base_ext_med = b.get("extended_medians", {})

    # Flag only when BOTH the ratio (>1.3x) and the absolute
    # delta (>0.15 s) exceed their floors: sub-second queries
    # are job-overhead-dominated at sf0.1, and measured
    # run-to-run spread on this host is ~±0.08 s even for a
    # byte-identical plan (cdc1 read 0.123–0.32 s across
    # sessions in round 5 with zero code change) — a pure-ratio
    # bar turns that timer noise into phantom regressions for
    # every query under ~0.5 s while real plan regressions on
    # them still clear 0.15 s.
    def regressed(now: float, b: float) -> bool:
        return now > 1.3 * b and now - b > 0.15

    def check(n: str, bmed: dict) -> dict | None:
        """Median-vs-baseline-median ONLY (r9: the min-vs-min fallback
        is dropped — every baselined query carries a median, and a
        query with no baseline entry is new: it gets a baseline
        recorded, not a flag)."""
        bm = bmed.get(n)
        cm = stats.get(n, {}).get("median")
        if bm is None or cm is None:
            return None
        if regressed(cm, bm):
            return {
                "median": cm,
                "baseline_median": bm,
                "min": timings.get(n, extended.get(n)),
            }
        return None

    def find_regressions() -> dict:
        found = {}
        for n in timings:
            r = check(n, base_med)
            if r:
                found[n] = r
        # the LLM-pipeline representatives regress too: track them
        # against the baseline's extended_medians map so a scale
        # hazard (e.g. round 2's j10) is visible round-over-round
        for n in extended:
            r = check(n, base_ext_med)
            if r:
                found[n] = r
        return found

    if base is not None:
        # RE-CHECK every flagged query, twice if needed, at the end
        # of the run: transient JVM phases (GC, code-cache churn
        # kicked off by a neighboring heavyweight) can inflate one
        # query's entire warmup+timed turn 2x — measured: two
        # consecutive full runs flagged two DISJOINT sets of sub-2s
        # queries, every one clean in isolation. Pass 1 re-times
        # in-process (clears phase spikes). Pass 2, for queries
        # still flagged, re-times in a FRESH subprocess — measured:
        # a ~55-query process accumulates state (full code cache,
        # reused Python workers) that can keep one query 40% over
        # its fresh-process floor for the rest of the process
        # lifetime, and the fresh floor is the number that scales.
        # A genuine plan regression stays slow through both passes.
        # Both passes keep the per-query protocol (warmup + min of
        # consecutive timed runs) so floors stay comparable.
        def fold_in(n: str, t2: float, s2: dict | None = None) -> None:
            if n in timings:
                timings[n] = min(timings[n], t2)
            else:
                extended[n] = min(extended[n], t2)
            if s2:
                merge_stats(n, s2)

        for n in list(find_regressions()):
            fold_in(n, bench_query(n, 3))
        still = find_regressions()
        if still and not os.environ.get("SPARK_GRAFT_NO_RECHECK"):
            for n in list(still):
                r = retime_in_subprocess(n)
                if r is not None:
                    fold_in(n, r[0], r[1])
    # --- bench-environment guard (VERDICT r7 #8) -------------------------
    # A headline query whose BEST pass still has spread/median > 0.3
    # (and > 0.1 s absolute — sub-0.1 s spreads are bare timer jitter)
    # never produced a stable reading. If >= 3 headline queries are in
    # that state the run was taken under ambient load (r7's q1 0.421 s
    # and q3 0.51 s spreads would have tripped this): re-time each in a
    # fresh subprocess; if still noisy, mark the artifact unreliable
    # and leave the last good BENCH_DETAIL.json in place.
    def noisy_headline() -> list[str]:
        bad = []
        for n in timings:
            s = stats.get(n)
            if (
                s
                and s["median"] > 0
                and s["spread"] > 0.1
                and s["spread"] / s["median"] > 0.3
            ):
                bad.append(n)
        return bad

    noisy = noisy_headline()
    if len(noisy) >= 3 and not os.environ.get("SPARK_GRAFT_NO_RECHECK"):
        for n in noisy:
            r = retime_in_subprocess(n)
            if r is not None:
                timings[n] = min(timings[n], r[0])
                if r[1]:
                    # a clean isolated pass REPLACES the noisy spread for
                    # the guard (merge_stats would keep max_spread, which
                    # a re-run could then never clear); max_spread still
                    # records the noise seen in-process
                    prev = stats.get(n, {})
                    r[1]["max_spread"] = max(
                        prev.get("max_spread", prev.get("spread", 0)),
                        r[1]["spread"],
                    )
                    r[1]["n"] = prev.get("n", 0) + r[1]["n"]
                    if r[1]["median"] <= prev.get("median", float("inf")):
                        stats[n] = r[1]
                    else:
                        stats[n]["max_spread"] = r[1]["max_spread"]
                        stats[n]["n"] = r[1]["n"]
        noisy = noisy_headline()
    env_guard["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    env_guard["n_procs_end"] = len(
        [p for p in os.listdir("/proc") if p.isdigit()]
    )
    # finalize — AFTER every retiming pass (regression re-check, noisy
    # guard), so the committed value/queries/regressions are consistent
    # with the final timings (ADVICE r8 #3)
    out["queries"] = med_map(timings)
    out["value"] = round(sum(out["queries"].values()), 3)
    out["extended"] = med_map(extended)
    out["queries_min"] = timings
    out["extended_min"] = extended
    out["full_compute"] = full_compute
    # scaling signal (VERDICT r12 #2): prove $SPARK_GRAFT_CPUS reached
    # the session — echo the effective master and defaultParallelism so
    # the driver's low-core probe can tell "honored but overhead-bound"
    # from "ignored" (session.py reads SPARK_GRAFT_CPUS into local[n]).
    out["master"] = spark.sparkContext.master
    out["parallelism"] = spark.sparkContext.defaultParallelism
    out["stats"] = stats  # per-query median-of-N + spread (§14.3 protocol)
    if base is not None:
        out["regressions"] = find_regressions()
        # baseline total over the same query set and the same estimator
        # (sum of baseline medians), so value/baseline_total is a
        # like-for-like ratio even on subset runs
        out["baseline_total"] = round(
            sum(base_med[n] for n in timings if n in base_med), 3
        )
    out["env"] = env_guard
    out["noisy_queries"] = noisy
    unreliable = len(noisy) >= 3
    out["unreliable"] = unreliable

    # full record (extended + regressions) to a sidecar file; stdout gets
    # ONLY the compact contract line so the driver's bounded tail capture
    # can never clip it mid-JSON (the round-3 parsed:null failure mode)
    detail_path = resolve_detail_path(
        os.environ.get("SPARK_GRAFT_DETAIL_PATH"),
        subset=only_set is not None,
        unreliable=unreliable,
    )
    with open(detail_path, "w") as f:
        json.dump(out, f, indent=1)
    compact = {
        "metric": out["metric"],
        "headline": out["headline"],
        "value": out["value"],
        "unit": out["unit"],
        "queries": out["queries"],
        "sf": out["sf"],
        # additive scaling-signal fields (VERDICT r12 #2): the driver's
        # low-core probe reads these to confirm $SPARK_GRAFT_CPUS was
        # honored even when every query is overhead-bound at sf0.1
        "master": out["master"],
        "parallelism": out["parallelism"],
    }
    if "baseline_total" in out:
        compact["baseline_total"] = out["baseline_total"]
    if unreliable:
        # self-describing BENCH_r{N}.json: the driver records stdout
        compact["unreliable"] = True
        compact["noisy_queries"] = noisy
    sys.stdout.flush()
    print(json.dumps(compact))
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
