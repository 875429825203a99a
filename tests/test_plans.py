"""Plan-shape pins: the scale contract of representative queries,
checked structurally via etl_project_spark.plans. Correctness tests
can't see a silently-added Exchange or a lost filter pushdown — these
can."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F
from pyspark.sql import Window

from etl_project_spark.catalog import load_table
from etl_project_spark.plans import assert_scalable, plan_stats
from etl_project_spark.registry import all_queries


def test_unpartitioned_window_detector(spark):
    """plan_stats must count Window ops with an EMPTY partition spec
    and ONLY those — across every windowspecdefinition print shape
    (ordered rank, partition+order, partition-only, global frame,
    order-only running sum)."""
    df = spark.range(10).select(
        F.col("id"), (F.col("id") % 3).alias("g")
    )
    cases = [
        # (frame, expected unpartitioned count)
        (df.select(F.row_number().over(
            Window.partitionBy("g").orderBy("id")).alias("r")), 0),
        (df.select(F.sum("id").over(Window.partitionBy("g")).alias("s")), 0),
        (df.select(F.row_number().over(Window.orderBy("id")).alias("r")), 1),
        (df.select(F.sum("id").over(Window.partitionBy()).alias("s")), 1),
        (df.select(F.sum("id").over(Window.orderBy("id")).alias("s")), 1),
        # partitioned on an EXPRESSION (the fold-tree shape)
        (df.select(F.row_number().over(
            Window.partitionBy(F.floor(F.col("g") / 2))
            .orderBy("id")).alias("r")), 0),
        # partition/order expressions over string literals (Spark hoists
        # these into a _w0 projection, so only the alias reaches the
        # spec — pinned here so a future print-shape change is caught)
        (df.select(F.row_number().over(
            Window.partitionBy(
                F.concat(F.lit("a(b,"), F.col("g").cast("string"))
            ).orderBy("id")).alias("r")), 0),
        (df.select(F.row_number().over(
            Window.orderBy(
                F.concat(F.lit("x,(y"), F.col("id").cast("string"))
            )).alias("r")), 1),
    ]
    for frame, want in cases:
        s = plan_stats(frame)
        assert s.unpartitioned_windows == want, (want, s.plan)
        assert (f"GLOBAL-WINDOW(x{want})" in s.flags) == (want > 0)


def test_windowspec_parser_skips_quoted_segments():
    """The windowspecdefinition walker must treat quoted string literals
    as opaque: a '(' or ',' INSIDE a literal must not shift paren depth
    or split arguments. Current Spark hoists such expressions into _w0
    projections, but the parser shouldn't depend on that print shape."""
    from etl_project_spark.plans.audit import (
        _split_top_level,
        _unpartitioned_windows,
    )

    assert _split_top_level("concat('a(b,', g#1), id#0L ASC NULLS FIRST") == [
        "concat('a(b,', g#1)",
        "id#0L ASC NULLS FIRST",
    ]
    # partitioned window whose partition expr embeds a quoted '(' and ','
    part = (
        "(3) Window\n"
        "Arguments: [row_number() windowspecdefinition("
        "concat('a(b,', g#1), id#0L ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), "
        "currentrow$())) AS r#2]\n"
    )
    assert _unpartitioned_windows(part) == 0
    # global window whose ORDER expr embeds a quoted ')' — naive depth
    # tracking would close the spec early and mis-read the args
    glob = (
        "(3) Window\n"
        "Arguments: [row_number() windowspecdefinition("
        "concat('x)y', cast(id#0L as string)) ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), "
        "currentrow$())) AS r#2]\n"
    )
    assert _unpartitioned_windows(glob) == 1


def test_global_window_whitelist_matches_plans(spark, sf_dir):
    """Every BOUNDED_GLOBAL_WINDOW whitelist entry must name a real
    registry query that actually plans an unpartitioned window at
    sf0.001 — a stale entry would silently re-admit a future
    corpus-sized single-task sort under an old name."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import audit_plans

    qs = all_queries()
    for name in audit_plans.BOUNDED_GLOBAL_WINDOW:
        assert name in qs, name
        s = plan_stats(qs[name](spark, sf_dir))
        assert s.unpartitioned_windows > 0, (name, s.plan)


def test_broadcast_dim_join_has_no_fact_shuffle(spark, sf_dir):
    """j1: dim broadcast means the fact never shuffles for the join."""
    df = all_queries()["j1_broadcast_dim_join"](spark, sf_dir)
    stats = assert_scalable(df, allow_quadratic=False)
    assert stats.broadcasts >= 1
    # the only Exchanges allowed are for the aggregate, not the join
    assert "SortMergeJoin" not in stats.plan


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """A date-filtered scan must carry non-empty PushedFilters."""
    df = all_queries()["f1_eq_date_filter"](spark, sf_dir)
    stats = plan_stats(df)
    assert stats.pushed_scans >= 1, stats.plan


def test_column_pruning(spark, sf_dir):
    """A 2-column projection reads 2 columns, not the full table."""
    li = load_table(spark, sf_dir, "lineitem")
    df = li.select("l_orderkey", "l_quantity")
    stats = plan_stats(df, wide_scan_cols=3)
    assert not any(f.startswith("wide-scan") for f in stats.flags), stats.plan


def test_global_agg_is_two_exchange_max(spark, sf_dir):
    """Partial aggregation: a global agg moves 1 row/task, never the
    table — at most one shuffle (AQE may even remove it)."""
    li = load_table(spark, sf_dir, "lineitem")
    df = li.agg(F.sum("l_quantity").alias("s"))
    assert_scalable(df, max_shuffles=1)


def test_assert_scalable_catches_cartesian(spark, sf_dir):
    n = load_table(spark, sf_dir, "nation")
    bad = n.crossJoin(n.select(F.col("n_nationkey").alias("k2")))
    with pytest.raises(AssertionError, match="Cartesian|NestedLoop"):
        assert_scalable(bad)


def test_assert_scalable_catches_row_python_udf(spark, sf_dir):
    from pyspark.sql.types import LongType

    slow = F.udf(lambda x: x + 1, LongType())
    df = load_table(spark, sf_dir, "nation").select(slow("n_nationkey"))
    with pytest.raises(AssertionError, match="Python UDF"):
        assert_scalable(df)


def test_headline_queries_have_no_unintended_hazards(spark, sf_dir):
    """Every bench headline query: no quadratic joins, no row-Python."""
    import bench

    qs = all_queries()
    for name in bench.BENCH_QUERIES:
        if name == "x1_topk_cosine_exact":
            continue  # documented bounded ground-truth crossJoin
        assert_scalable(qs[name](spark, sf_dir))


def test_text_pipeline_ops_are_scan_local(spark, sf_dir):
    """tx7/tx8/tx9 (token counting, quality gate, PII scrub) must stay
    single-scan, shuffle-free, pure-JVM — per-row pipeline stages."""
    qs = all_queries()
    for name in ("tx7_bpe_token_count", "tx8_gopher_quality", "tx9_pii_redact"):
        stats = assert_scalable(qs[name](spark, sf_dir), max_shuffles=0)
        assert stats.scans == 1, stats.plan
        assert "arrow-python(ok)" not in stats.flags, stats.plan


def test_hash_sample_is_scan_local(spark, sf_dir):
    """smp2: deterministic sampling is a pushable-free filter over one
    scan — no shuffle, no RNG state."""
    stats = assert_scalable(
        all_queries()["smp2_hash_stratified_sample"](spark, sf_dir),
        max_shuffles=0,
    )
    assert stats.scans == 1, stats.plan


def test_winnowing_arrow_kernel_plan(spark, sf_dir):
    """tx10 (round-3 Arrow form): one scan, one parallelism
    repartition, the whole gram-hash/window-min/distinct pipeline in a
    single MapInPandas stage — no posexplode, no window sort, no
    distinct shuffle. tx11 (Rabin) has the same shape."""
    for name in ("tx10_winnowing_fingerprint", "tx11_rabin_winnowing"):
        df = all_queries()[name](spark, sf_dir)
        stats = assert_scalable(df, max_shuffles=1)
        assert stats.scans == 1, stats.plan
        assert "MapInPandas" in stats.plan, stats.plan


def test_winnowing_relational_twin_single_window_shuffle(spark, sf_dir):
    """The relational winnowing form (the oracle's mirror, kept for
    pre-exploded inputs): gram hashing stays scan-local; the only
    Exchange is the doc_id window partitioning (+ the distinct agg
    reusing it). No md5-array recomputation above the Generate — the
    O(n^2) plan trap shows up as a transform(...) inside a Project
    over posexplode."""
    from etl_project_spark.catalog import load_table
    from etl_project_spark.operators.text import winnow_fingerprints

    df = winnow_fingerprints(load_table(spark, sf_dir, "documents"))
    stats = assert_scalable(df, max_shuffles=2)
    assert stats.scans == 1, stats.plan
    import re

    proj_with_transform = re.findall(
        r"Project \[[^\]]*transform\(sequence[^\]]*\]", stats.plan
    )
    assert not proj_with_transform, stats.plan


def test_repeated_ngrams_single_gram_shuffle(spark, sf_dir):
    """pp5: the gram slice is a scalar projection above the explode;
    token-array split stays below the Generate (one evaluation per
    document), and the only Exchanges are the two-level distinct agg."""
    df = all_queries()["pp5_repeated_ngrams"](spark, sf_dir)
    stats = assert_scalable(df, max_shuffles=2)
    assert stats.scans == 1, stats.plan
    import re

    # a split() re-appearing in a Project above the Generate would mean
    # per-exploded-row recompute of the whole token array
    above_generate = stats.plan.split("Generate posexplode")[0]
    assert not re.search(r"Project \[[^\]]*split\(", above_generate), (
        stats.plan
    )


def test_int8_quantize_keeps_amax_out_of_lambda(spark, sf_dir):
    """x7: scan-local (zero shuffles), and amax stays an attribute
    reference inside the quantize lambda — CollapseProject inlining it
    would re-run the O(d) array_max per element (O(d^2)/row)."""
    df = all_queries()["x7_int8_quantize"](spark, sf_dir)
    stats = assert_scalable(df, max_shuffles=0)
    assert stats.scans == 1, stats.plan
    import re

    for m in re.finditer(r"Project \[[^\]]*AS q#[^\]]*\]", stats.plan):
        assert "array_max" not in m.group(0), stats.plan


def test_lm2_corpus_scanned_once(spark, sf_dir):
    """lm2: the exploded bigram relation is materialized (eager
    localCheckpoint) before fanning out to the model aggregate and the
    scoring join, because the HOF-lambda explode subtree defeats
    ReuseExchange (SURVEY §12.1) — so the final plan must contain ZERO
    parquet scans of documents (the corpus was read exactly once, in
    the checkpoint job) and the model side must broadcast."""
    df = all_queries()["lm2_perplexity_score"](spark, sf_dir)
    stats = assert_scalable(df)
    assert stats.scans == 0, stats.plan
    assert stats.broadcasts >= 1, stats.plan
    assert "Scan ExistingRDD" in stats.plan, stats.plan


def test_dd8_corpus_scanned_once(spark, sf_dir):
    """dd8: the shingled relation feeds the prefix build AND both
    verify-side array lookups; materializing it (eager localCheckpoint)
    means the final plan reads the checkpoint, never the parquet — the
    corpus scan + shingling runs exactly once."""
    df = all_queries()["dd8_jaccard_prefix_join"](spark, sf_dir)
    stats = assert_scalable(df)
    assert stats.scans == 0, stats.plan
    assert "Scan ExistingRDD" in stats.plan, stats.plan


def test_shingle_relation_shared_across_prefix_join_family(spark, sf_dir):
    """dd8/dd11/dd12 each consumed their own shingled+checkpointed
    relation — three corpus scans + shinglings where one suffices at
    100 TB (VERDICT r8 #5). Pin that the memoized relation is ONE
    object across the family (same checkpoint, so one shingling job),
    that a different sf_dir misses the memo, and that every family
    member's final plan still reads the checkpoint, never the parquet."""
    from etl_project_spark.operators.dedup import _shingle_sizes

    s1 = _shingle_sizes(spark, sf_dir)
    s2 = _shingle_sizes(spark, sf_dir)
    assert s1 is s2
    assert _shingle_sizes(spark, "/root/testdata/sf0.01") is not s1
    for name in (
        "dd8_jaccard_prefix_join",
        "dd11_containment_join",
        "dd12_containment_pairs",
    ):
        df = all_queries()[name](spark, sf_dir)
        stats = assert_scalable(df)
        assert stats.scans == 0, (name, stats.plan)
        assert "Scan ExistingRDD" in stats.plan, (name, stats.plan)


def test_lsh_pair_relation_shared_across_consumers(spark, sf_dir):
    """Eight operators consume the verified LSH pair relation; each
    used to re-derive and re-persist its own copy, so an operator's
    wall-time depended on whether a neighbor's cached plan fragments
    were live (dd10: 0.62 s warm vs 1.7 s solo — r8's 'noise-shaped'
    drift was cache-hit luck). Pin the deterministic form: one memoized
    materialized relation per (application, sf_dir, fingerprint), and
    the graph consumers' final plans read the checkpoint, never the
    parquet, for the edge side."""
    from etl_project_spark.operators.dedup import _lsh_pairs_memo

    p1 = _lsh_pairs_memo(spark, sf_dir)
    p2 = _lsh_pairs_memo(spark, sf_dir)
    assert p1 is p2
    for name in ("dd10_dup_graph_stats", "dd7_dup_clusters"):
        df = all_queries()[name](spark, sf_dir)
        stats = assert_scalable(df)
        assert "Scan ExistingRDD" in stats.plan, (name, stats.plan)


def test_pp7_corpus_scanned_once(spark, sf_dir):
    """pp7: the exploded token stream is materialized before feeding
    the vocab aggregate and the scoring join (lm2's pin, same reason) —
    zero parquet scans in the final plan, vocabulary broadcast."""
    df = all_queries()["pp7_dsir_weights"](spark, sf_dir)
    stats = assert_scalable(df)
    assert stats.scans == 0, stats.plan
    assert stats.broadcasts >= 1, stats.plan


def test_bpe3_plan_shape(spark, sf_dir):
    """bpe3: no quadratic stage, bounded shuffle count ((doc, word)
    pre-aggregation with map-side combine, cache join, groupBy(doc_id),
    the two-phase pack), and at execution the packer's bucket-totals
    branch reuses the window's Exchange (pp1's pin — one pass over the
    counted relation)."""
    df = all_queries()["bpe3_cached_shard_packing"](spark, sf_dir)
    stats = assert_scalable(df, max_shuffles=7)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, plan


def test_media_corpus_build_is_scalable(spark, sf_dir):
    """The end-to-end media build: no quadratic stage, no row-Python,
    Arrow kernels only, and the only unpartitioned window is the
    bounded bucket-totals prefix sum."""
    from etl_project_spark.ingest.media_corpus import clean_media_corpus

    stats = assert_scalable(clean_media_corpus(spark, sf_dir))
    assert "arrow-python(ok)" in stats.flags, stats.plan


def test_runtime_bloom_filter_prunes_fact_join(spark, sf_dir):
    """Scale pin: when a fact⋈fact join has a selective filter on one
    side and broadcast is off (the 100 TB shape — neither side fits),
    Spark injects a runtime bloom filter: the filtered side's join
    keys are bloom-aggregated and might_contain() is pushed into the
    big side's scan-side Filter, so most of the big fact is dropped
    before the shuffle. The engine relies on this at scale, so pin
    that the injection actually fires on our session (thresholds are
    size-gated; production tuning lowers the application-side gate the
    same way) AND that results are identical with and without it."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    q = lambda: (  # noqa: E731
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    originals = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = q()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan
        assert "bloom_filter_agg" in plan, plan
        with_bloom = {r["l_returnflag"]: r["n"] for r in df.collect()}
    finally:
        for k, v in originals.items():
            spark.conf.set(k, v)
    baseline = {r["l_returnflag"]: r["n"] for r in q().collect()}
    assert with_bloom == baseline and baseline


def test_pp9_corpus_scanned_once(spark, sf_dir):
    """pp9: the positioned gram relation is materialized (eager
    localCheckpoint) before fanning out to the dup-gram aggregate, the
    join-back, and the per-doc totals — zero parquet scans in the
    final plan (dd8's pin, same HOF-explode/ReuseExchange reason)."""
    df = all_queries()["pp9_dup_span_mask"](spark, sf_dir)
    stats = assert_scalable(df)
    assert stats.scans == 0, stats.plan
    assert "Scan ExistingRDD" in stats.plan, stats.plan


def test_lm4_corpus_scanned_once(spark, sf_dir):
    """lm4: the bigram-type relation is materialized once; the two
    rank windows and the type-count scalar all read the checkpoint —
    zero parquet scans, and the scalar joins broadcast."""
    df = all_queries()["lm4_kneser_ney"](spark, sf_dir)
    stats = assert_scalable(df)
    assert stats.scans == 0, stats.plan
    assert stats.broadcasts >= 1, stats.plan


def test_mm11_corpus_decoded_once(spark, sf_dir):
    """mm11: the frame-hash relation feeds BOTH self-join sides, so it
    is materialized (eager localCheckpoint) — the final plan must read
    the checkpoint (zero parquet scans: the decode kernel ran exactly
    once over the corpus) and join candidates on (frame_idx, fhash)
    postings, never a nested-loop pair scan."""
    df = all_queries()["mm11_video_neardup"](spark, sf_dir)
    stats = assert_scalable(df)
    assert stats.scans == 0, stats.plan
    assert "Scan ExistingRDD" in stats.plan, stats.plan


def test_an9_single_user_window_no_join(spark, sf_dir):
    """an9: last-touch attribution is ONE user-partitioned ordered
    window over the events scan — no self-join, no as-of join, and at
    most the window's single shuffle."""
    df = all_queries()["an9_attribution"](spark, sf_dir)
    stats = assert_scalable(df, max_shuffles=1)
    assert "Join" not in stats.plan, stats.plan
    assert stats.scans == 1, stats.plan


def test_pp12_no_corpus_window(spark, sf_dir):
    """pp12: composition audit inherits pp8's two-phase prefix sum —
    the only unbounded-ordered window runs over the tiny bucket-totals
    relation, and the top-source pick's row_number partitions by
    seq_id (bounded by docs-per-window), never corpus-wide."""
    df = all_queries()["pp12_seq_composition"](spark, sf_dir)
    stats = assert_scalable(df, max_shuffles=8)
    assert stats.broadcasts >= 1, stats.plan  # bucket offsets broadcast


def test_aqe_splits_skewed_join_partition(spark):
    """Scale pin: a skewed join key (99% of rows on one key — the
    hot-entity shape every 100 TB fact table has) must not serialize
    the whole join behind one reducer. With AQE's skew thresholds
    lowered to test scale (production tuning moves the same knobs),
    OptimizeSkewedJoin splits the oversized partition and the final
    plan carries the skew=true marker — pinning that the engine can
    rely on AQE skew handling on this Spark build, with results
    identical to the unsplit plan. Complements sk1/sk2's explicit
    salting: salting is the fallback when the join shape blocks AQE
    (e.g. a required output partitioning downstream)."""
    from pyspark.sql import functions as F

    skewed = spark.range(0, 1_000_000).select(
        F.when(F.col("id") % 100 < 99, F.lit(0))
        .otherwise(F.col("id") % 100)
        .alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("pay"),
    )
    dim = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    q = lambda: (  # noqa: E731
        skewed.join(dim, "k").select(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sv"),
        )
    )
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
    }
    originals = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = q()
        split = df.collect()[0]
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in originals.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    base = q().collect()[0]
    assert (split["n"], split["sv"]) == (base["n"], base["sv"])
    assert split["n"] == 1_000_000


def test_smp4_weighted_sample_plans_as_take_ordered(spark, sf_dir):
    """smp4 (VERDICT r6 #6, hardened r11): the rank<=R filter over a
    GLOBAL ordered window must be BOUNDED below the window by one of
    Catalyst's two rank-limit rewrites — LimitPushDownThroughWindow
    (a TakeOrderedAndProject feeding the window: per-partition top-R
    heaps merged driver-side, 0 shuffles — the plan Spark 4.1 emits
    here) or InferWindowGroupLimit (a WindowGroupLimit prefilter). If
    BOTH rewrites stop firing (filter shape drift, Spark upgrade),
    the unpartitioned Window sorts the whole corpus in one task —
    fine at sf0.1, fatal at 100 TB. The old assertion only checked
    TakeOrderedAndProject existed SOMEWHERE; this pins it below the
    Window node in the plan tree."""
    df = all_queries()["smp4_weighted_sample"](spark, sf_dir)
    stats = assert_scalable(df, max_shuffles=0)
    assert stats.unpartitioned_windows == 1, stats.plan
    tree = stats.plan.split("\n\n", 1)[0].splitlines()
    win = [i for i, l in enumerate(tree) if re.search(r"\bWindow \(", l)]
    assert len(win) == 1, stats.plan
    below = "\n".join(tree[win[0] + 1 :])
    assert (
        "TakeOrderedAndProject" in below or "WindowGroupLimit" in below
    ), stats.plan


def test_cdc4_merge_join_reuses_aggregate_partitioning(spark, sf_dir):
    """cdc4's full outer join must ride the two key-compaction
    exchanges — exactly 2 shuffles, no third exchange for the join
    (both aggregates already hash-partition on the join key). If a
    projection between aggregate and join ever breaks the output
    partitioning (e.g. renaming the key columns through an alias the
    optimizer can't see through), Spark silently inserts a third
    full-relation exchange — invisible at sf0.1, dominant at 100 TB."""
    df = all_queries()["cdc4_merge_upsert"](spark, sf_dir)
    stats = assert_scalable(df, max_shuffles=2)
    assert stats.shuffles == 2, stats.plan


def test_cdc5_scd2_merge_shuffle_budget(spark, sf_dir):
    """cdc5: one window per side + the first-change aggregate — the
    close-ts join and the union must not add exchanges beyond the
    three key-partitioned ones."""
    df = all_queries()["cdc5_scd2_merge"](spark, sf_dir)
    stats = assert_scalable(df, max_shuffles=3)
    assert stats.shuffles <= 3, stats.plan


def test_ivfpq_serving_plans_are_pruned_and_bounded(spark, sf_dir):
    """x19/x20: the serving plans must keep the IVF economics visible
    in the physical tree — the query side broadcasts (candidates never
    shuffle for the ADC join), at most one exchange feeds the
    per-query shortlist window (which must be partitioned — no global
    sort anywhere), and no quadratic join exists (the cell equi-join
    IS the pruning)."""
    for name in ("x19_ivfpq_serving_topk", "x20_ivfpq_trained_serving"):
        df = all_queries()[name](spark, sf_dir)
        stats = assert_scalable(df, max_shuffles=1)
        assert stats.broadcasts >= 2, (name, stats.plan)
        assert stats.unpartitioned_windows == 0, (name, stats.plan)
