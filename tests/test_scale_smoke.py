"""Scale smokes: the scale-sensitive kernels on 10M+ synthetic rows
(spark.range — no disk, deterministic), far beyond the sf0.1 corpus.
These catch algorithmic blowups (driver collects, quadratic stages,
single-partition scans) that small-corpus correctness tests can't see,
while asserting exact results via closed-form expectations."""

from __future__ import annotations

import time

from pyspark.sql import Window
from pyspark.sql import functions as F

N = 10_000_000


def test_two_phase_packing_cumsum_at_10m(spark):
    """pp1's two-phase prefix sum over 10M rows with token counts
    t(i) = (i % 97) + 1: spot-check shard boundaries against the
    closed-form cumulative sum, and hard-bound the wall clock."""
    bucket_w, cap = 100_000, 1_000_000
    d = (
        spark.range(N)
        .select(
            F.col("id").alias("doc_id"),
            ((F.col("id") % 97) + 1).alias("n_tokens"),
            (F.col("id") / bucket_w).cast("long").alias("bucket"),
        )
        .filter(F.col("bucket").isNotNull())
    )
    in_bucket = Window.partitionBy("bucket").orderBy("doc_id")
    local = d.withColumn(
        "local_cum", F.sum("n_tokens").over(in_bucket) - F.col("n_tokens")
    )
    totals = local.groupBy("bucket").agg(
        F.max(F.col("local_cum") + F.col("n_tokens")).alias("bucket_total")
    )
    offsets = totals.withColumn(
        "offset",
        F.sum("bucket_total").over(Window.orderBy("bucket"))
        - F.col("bucket_total"),
    ).select("bucket", "offset")
    packed = local.join(F.broadcast(offsets), "bucket").select(
        "doc_id",
        ((F.col("offset") + F.col("local_cum")) / cap)
        .cast("long")
        .alias("shard_id"),
    )

    def cum_before(i: int) -> int:
        # sum of (j % 97) + 1 for j < i, closed form over full cycles
        full, rem = divmod(i, 97)
        return full * (97 * 98 // 2) + rem * (rem - 1) // 2 + rem

    t0 = time.time()
    probe_ids = [0, 1, 96, 97, 1_000_000, 5_000_001, N - 1]
    got = {
        r["doc_id"]: r["shard_id"]
        for r in packed.filter(F.col("doc_id").isin(probe_ids)).collect()
    }
    wall = time.time() - t0
    for i in probe_ids:
        assert got[i] == cum_before(i) // cap, (i, got[i], cum_before(i))
    assert wall < 60, f"10M-row packing took {wall:.1f}s"


def test_salted_agg_beats_skew_at_10m(spark):
    """Salted aggregation on a 90%-one-key skew: exact agreement with
    the closed-form per-key sums at 10M rows, inside the time bound."""
    from etl_project_spark.operators.skew import salted_sum_count

    # key 0 for 90% of rows, else id % 1000; value = id % 7
    d = spark.range(N).select(
        F.when(F.col("id") % 10 != 0, 0)
        .otherwise(F.col("id") % 1000)
        .alias("k"),
        (F.col("id") % 7).alias("v"),
    )
    t0 = time.time()
    got = {
        r["k"]: (r["n_rows"], r["sum_value"])
        for r in salted_sum_count(d, "k", "v", n_salts=16).collect()
    }
    wall = time.time() - t0
    exact = {
        r["k"]: (r["n"], r["total"])
        for r in d.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("total"))
        .collect()
    }
    assert got == exact
    assert wall < 60, f"salted agg took {wall:.1f}s"


def test_window_topn_at_10m(spark):
    """w1's per-key top-n shape over 10M rows / 100k keys: row_number
    window completes in bounded time and returns exactly n rows per key
    with the right extrema."""
    d = spark.range(N).select(
        (F.col("id") % 100_000).alias("k"), F.col("id").alias("v")
    )
    w = Window.partitionBy("k").orderBy(F.desc("v"))
    t0 = time.time()
    top = (
        d.select("k", "v", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 2)
    )
    cnt = top.count()
    wall = time.time() - t0
    assert cnt == 200_000
    # key 0: values are 0, 100000, ..., top-2 are N-100000 and N-200000
    got = sorted(
        r["v"] for r in top.filter(F.col("k") == 0).collect()
    )
    assert got == [N - 200_000, N - 100_000]
    assert wall < 60, f"10M-row window took {wall:.1f}s"


def test_connected_components_long_chain_logn_rounds(spark):
    """dd7's CC kernel on the adversarial shape: one chain of diameter
    2^17 (naive min-label propagation would need 131k rounds) plus 100k
    disjoint 10-node chains — 1.1M edges total. Large-star/small-star
    must converge in O(log n) rounds (guarded at 24) and produce the
    exact closed-form components."""
    from etl_project_spark.operators.dedup import connected_components

    chain_n, block_base, block_n = 1 << 17, 10_000_000, 1_000_000
    chain = spark.range(chain_n - 1).select(
        F.col("id").alias("u"), (F.col("id") + 1).alias("v")
    )
    # ids [block_base, block_base + block_n), chains of 10: no edge
    # across multiples of 10
    small = (
        spark.range(block_n - 1)
        .filter((F.col("id") % 10) != 9)
        .select(
            (F.col("id") + block_base).alias("u"),
            (F.col("id") + block_base + 1).alias("v"),
        )
    )
    t0 = time.time()
    cc = connected_components(chain.union(small), max_rounds=24).persist()
    big = cc.filter(F.col("node") < chain_n).agg(
        F.count("*").alias("n"), F.max("component").alias("mx")
    ).first()
    assert big["n"] == chain_n and big["mx"] == 0, big
    wrong_small = (
        cc.filter(F.col("node") >= block_base)
        .filter(
            F.col("component") != (F.col("node") / 10).cast("long") * 10
        )
        .count()
    )
    n_small = cc.filter(F.col("node") >= block_base).count()
    assert wrong_small == 0 and n_small == block_n, (wrong_small, n_small)
    cc.unpersist()
    assert time.time() - t0 < 300, "CC smoke exceeded wall bound"


def test_prefix_jaccard_join_at_200k_docs(spark, tmp_path):
    """dd8's prefix-filtered Jaccard join on a 200k-doc synthetic corpus
    with closed-form ground truth: doc pairs (2g, 2g+1) share a
    20-token group vocabulary — even groups identical (jaccard 1.0),
    odd groups differ in the last token (1 of 18 shingles changes →
    jaccard 17/19 exactly) — and nothing is shared across groups, so
    the exact output is one pair per group with a known value. Catches
    quadratic candidate blowups and single-task serialization that the
    500-doc corpus can't."""
    n_docs = 200_000
    g = F.col("id") / 2
    last = F.when(
        (F.col("id") % 2 == 1) & ((F.col("id") / 2).cast("long") % 2 == 1),
        F.lit(21),
    ).otherwise(F.lit(20))
    text = F.concat_ws(
        " ",
        F.concat(
            F.transform(
                F.sequence(F.lit(1), F.lit(19)),
                lambda k: F.concat(
                    F.lit("w"), g.cast("long"), F.lit("_"), k
                ),
            ),
            F.array(
                F.concat(F.lit("w"), g.cast("long"), F.lit("_"), last)
            ),
        ),
    )
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )
    src = str(tmp_path / "documents.parquet")
    docs.write.parquet(src)

    from etl_project_spark.registry import get

    t0 = time.time()
    rows = get("dd8_jaccard_prefix_join").fn(spark, str(tmp_path)).collect()
    elapsed = time.time() - t0
    assert elapsed < 120, f"prefix join took {elapsed:.0f}s at 200k docs"
    assert len(rows) == n_docs // 2
    by_pair = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}
    # even group: identical docs; odd group: one-token tail difference
    assert by_pair[(0, 1)] == 1.0
    assert abs(by_pair[(2, 3)] - 17 / 19) < 1e-12
    assert by_pair[(4, 5)] == 1.0
    assert (
        abs(by_pair[(n_docs - 2, n_docs - 1)] - 17 / 19) < 1e-12
        or by_pair[(n_docs - 2, n_docs - 1)] == 1.0
    )


def test_epoch_shuffle_bijection_at_10m(spark):
    """pp6's two-phase bucketed row_number over 10M synthetic ids:
    positions form an exact 0..N-1 bijection (checked via aggregates,
    never a driver collect) and no single window partition sees more
    than a ~1% slice of the data (256 md5-prefix buckets)."""
    import time

    t0 = time.time()
    d = spark.range(N).select(F.col("id").alias("doc_id")).withColumn(
        "k", F.md5(F.col("doc_id").cast("string"))
    ).withColumn("bucket", F.substring("k", 1, 2))
    in_bucket = Window.partitionBy("bucket").orderBy("k", "doc_id")
    local = d.withColumn("rn", F.row_number().over(in_bucket))
    totals = local.groupBy("bucket").agg(F.max("rn").alias("n"))
    offsets = totals.withColumn(
        "offset", F.sum("n").over(Window.orderBy("bucket")) - F.col("n")
    ).select("bucket", "offset")
    pos = local.join(F.broadcast(offsets), "bucket").select(
        (F.col("offset") + F.col("rn") - 1).alias("position")
    )
    agg = pos.agg(
        F.count("*").alias("n"),
        F.min("position").alias("mn"),
        F.max("position").alias("mx"),
        F.count_distinct("position").alias("nd"),
        F.sum("position").alias("s"),
    ).collect()[0]
    assert agg["n"] == N and agg["nd"] == N
    assert agg["mn"] == 0 and agg["mx"] == N - 1
    assert agg["s"] == N * (N - 1) // 2  # exact bijection certificate
    biggest = totals.agg(F.max("n")).collect()[0][0]
    assert biggest < N // 50, biggest  # 256 buckets -> ~N/256 each
    assert time.time() - t0 < 120


def test_heavy_hitters_sketch_at_10m_tokens(spark):
    """tx12's sketch-then-verify pipeline over 10M synthetic tokens
    with a 100k-type long tail + 3 planted hot tokens: the candidate
    pass shuffles at most partitions*K rows (asserted), and the exact
    recount returns EXACTLY the closed-form heavy-hitter set."""
    import time

    import pandas as pd

    from etl_project_spark.operators.text import HH_K, misra_gries_kernel

    t0 = time.time()
    # even ids -> one of 3 hot tokens (~N/6 mass each >= N/32);
    # odd ids -> a 100k-type uniform tail (each ~N/200000 << N/32)
    tok = spark.range(N).select(
        F.when(
            F.col("id") % 2 == 0,
            F.concat(F.lit("hot"), (F.col("id") % 3).cast("string")),
        )
        .otherwise(
            F.concat(F.lit("t"), (F.col("id") % 100000).cast("string"))
        )
        .alias("w")
    )

    def mg(batches):
        counters = misra_gries_kernel(
            (w for pdf in batches for w in pdf["w"]), HH_K
        )
        yield pd.DataFrame({"w": list(counters)})

    candidates = tok.mapInPandas(mg, schema="w string").distinct()
    n_cand = candidates.count()
    parts = tok.rdd.getNumPartitions()
    assert n_cand <= parts * HH_K, (n_cand, parts)
    total = tok.agg(F.count(F.lit(1)).alias("n"))
    got = {
        (r["w"], r["cnt"])
        for r in tok.join(F.broadcast(candidates), "w", "left_semi")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * HH_K >= F.col("n"))
        .select("w", "cnt")
        .collect()
    }
    # closed form: hot{j} collects ids ≡ r (mod 6) for the even r with
    # r % 3 == j; |{i < N : i ≡ r (mod 6)}| = (N - r + 5) // 6
    def hot_count(j):
        return sum(
            (N - r + 5) // 6
            for r in range(6)
            if r % 2 == 0 and r % 3 == j
        )

    expect = {(f"hot{j}", hot_count(j)) for j in range(3)}
    assert got == expect, (sorted(got)[:5], sorted(expect))
    assert time.time() - t0 < 120


def test_dense_surrogate_id_bijection_at_10m(spark):
    """with_surrogate_id(dense): at 10M rows the two-phase prefix-sum
    assignment emits exactly 1..n with no driver-side funnel — verified
    by aggregation (count distinct == n, min == 1, max == n), never a
    collect of the ids."""
    from pyspark.sql import functions as F

    from etl_project_spark.sources.files import with_surrogate_id

    n = 10_000_000
    df = spark.range(n).select((F.col("id") % 1000).alias("v")).drop("id")
    out = with_surrogate_id(df, mode="dense")
    agg = out.agg(
        F.count("id").alias("n"),
        F.countDistinct("id").alias("nd"),
        F.min("id").alias("mn"),
        F.max("id").alias("mx"),
    ).collect()[0]
    assert agg["n"] == n and agg["nd"] == n
    assert agg["mn"] == 1 and agg["mx"] == n


def test_perplexity_checkpoint_path_at_200k_docs(spark, tmp_path):
    """lm2's materialize-once shape at 200k docs / ~4M bigrams: the
    eager checkpoint of the exploded bigram relation plus the broadcast
    model join must complete well under a corpus-rescan budget, and a
    closed-form corpus pins correctness: every doc is one of two
    20-token templates ('a b a b ...' / 'b a b a ...'), so every bigram
    is 'a b' or 'b a', cp = 1.0 for all of them, and every document's
    perplexity is exactly 1.0 with 19 bigrams."""
    n_docs = 200_000
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(20)),
            lambda k: F.when(
                (k + F.col("id")) % 2 == 0, F.lit("a")
            ).otherwise(F.lit("b")),
        ),
        " ",
    )
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))

    from etl_project_spark.registry import get

    t0 = time.time()
    out = get("lm2_perplexity_score").fn(spark, str(tmp_path))
    agg = out.agg(
        F.count("*").alias("n"),
        F.min("n_bigrams").alias("mn_b"),
        F.max("n_bigrams").alias("mx_b"),
        F.min("perplexity").alias("mn_p"),
        F.max("perplexity").alias("mx_p"),
    ).collect()[0]
    elapsed = time.time() - t0
    assert elapsed < 120, f"lm2 took {elapsed:.0f}s at 200k docs"
    assert agg["n"] == n_docs
    assert agg["mn_b"] == agg["mx_b"] == 19
    assert agg["mn_p"] == agg["mx_p"] == 1.0


def test_media_corpus_stream_smoke_at_20k(spark, tmp_path):
    """The streaming media build at 40x the fixture's payload count:
    20k synthetic PPMs through decode gate -> exact + perceptual dedup
    -> byte packing in 2 micro-batches. Pins the sink-derived-state
    design's cost curve (per-batch key anti-join + pruned byte cursor)
    and the cascade invariants at a size where a quadratic stage or a
    corpus-sized window would blow the time bound."""
    import time as _time

    from pyspark.sql import functions as F

    from etl_project_spark.ingest.media_corpus import (
        SHARD_BYTES,
        media_corpus_stream,
    )
    from etl_project_spark.operators.multimodal import _PPM_HEADER
    from etl_project_spark.sources.tables import _drop_table_and_location
    from etl_project_spark.streaming import pipeline as sp

    N_MEDIA = 20_000
    table = "media_stream_smoke_t"
    _drop_table_and_location(spark, table)
    # 130 repeats: the shortest id string ('p0q', 3 chars) still fills
    # the 384-byte pixel plane
    pix = (
        "substring(repeat(concat('p', CAST(id AS STRING), 'q'), 130), 1, 384)"
    )
    src = str(tmp_path / "smoke_src")
    m = spark.range(N_MEDIA).select(
        F.col("id").alias("media_id"),
        F.encode(
            F.concat(F.lit(_PPM_HEADER), F.expr(pix)), "utf-8"
        ).alias("payload"),
    )
    # two files -> two micro-batches (cross-batch dedup + cursor both
    # genuinely exercised against the sink)
    m.repartitionByRange(2, "media_id").write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = sp.file_event_stream(spark, src, schema, max_files_per_trigger=1)
    t0 = _time.time()
    media_corpus_stream(
        spark, stream, table, str(tmp_path / "ck_smoke"), available_now=True
    )
    wall = _time.time() - t0
    out = spark.table(table)
    n = out.count()
    stats = out.agg(
        F.countDistinct("digest").alias("d"),
        F.countDistinct("ahash_bits").alias("a"),
        F.max(F.col("byte_offset") + F.col("n_bytes")).alias("cursor"),
        F.sum("n_bytes").alias("total"),
    ).collect()[0]
    assert n > 0 and stats["d"] == n and stats["a"] == n  # dup-free
    assert stats["cursor"] == stats["total"]  # cursor == byte mass
    per_shard = (
        out.groupBy("shard_id")
        .agg(F.sum("n_bytes").alias("b"), F.max("n_bytes").alias("mx"))
        .collect()
    )
    for r in per_shard:
        assert r["b"] <= SHARD_BYTES + r["mx"], r
    assert wall < 120, f"20k-payload stream build took {wall:.0f}s"
    _drop_table_and_location(spark, table)


def test_countmin_cells_bounded_and_onesided_at_10m(spark, tmp_path):
    """a13's Count-Min sketch on 10M synthetic events: 3 planted hot
    keys (1M hits each, closed form) over a ~1M-key uniform tail. The
    cell relation must stay ≤ d·w rows no matter the key cardinality
    (the size-invariance that makes CMS mergeable), each hash row must
    partition ALL updates exactly (per-row cell sums == N), estimates
    must be one-sided (est ≥ true, the CMS guarantee), and the planted
    keys must surface with exact true counts and collision inflation
    inside the n/w-scale budget."""
    from etl_project_spark.operators.sketches import CM_D, CM_W, _h32
    from etl_project_spark.registry import get

    hot_base = 1_000_000_000
    ev = spark.range(N).select(
        F.when(F.col("id") % 10 < 3, F.col("id") % 10 + hot_base)
        .otherwise(F.col("id") % 1_000_000)
        .alias("user_id")
    )
    ev.write.parquet(str(tmp_path / "events.parquet"))

    t0 = time.time()
    # the sketch itself (mirrors the operator's cell build): bounded
    # rows, and every hash row partitions the full update stream
    coords = (
        spark.read.parquet(str(tmp_path / "events.parquet"))
        .select(
            "user_id",
            F.explode(F.array(*[F.lit(i) for i in range(CM_D)])).alias(
                "row_"
            ),
        )
        .select(
            "row_",
            (
                _h32(
                    F.concat(
                        F.col("row_").cast("string"),
                        F.lit(":"),
                        F.col("user_id").cast("string"),
                    )
                )
                % CM_W
            ).alias("col_"),
        )
    )
    cells = coords.groupBy("row_", "col_").agg(F.count(F.lit(1)).alias("c"))
    per_row = cells.groupBy("row_").agg(
        F.sum("c").alias("s"), F.count(F.lit(1)).alias("n_cells")
    ).collect()
    assert len(per_row) == CM_D
    for r in per_row:
        assert r["s"] == N, r  # each row partitions all N updates
        assert r["n_cells"] <= CM_W, r

    rows = get("a13_countmin_heavy_hitters").fn(spark, str(tmp_path)).collect()
    wall = time.time() - t0
    assert len(rows) == 20
    by_key = {r["user_id"]: r for r in rows}
    for j in range(3):
        r = by_key[hot_base + j]  # planted keys must surface
        assert r["true_count"] == N // 10, r
    for r in rows:
        assert r["est_count"] >= r["true_count"], r  # one-sided error
        # collision inflation ~ tail_mass/w expected; 3·N/w is generous
        assert r["est_count"] - r["true_count"] < 3 * N // CM_W, r
    assert wall < 180, f"10M-row Count-Min took {wall:.0f}s"


def test_histogram_quantile_sketch_exact_at_10m(spark, tmp_path):
    """a14's equi-width histogram quantiles on 10M rows with value = id
    (one group): the bin relation stays ≤ HQ_BINS rows no matter the
    input size, and the p50/p90/p99 estimates equal an independent
    numpy replay of the identical IEEE arithmetic (bin rule +
    interpolation) to 1e-6 — at this density the estimates also sit
    within one bin width of the true uniform quantiles."""
    import numpy as np

    from etl_project_spark.operators.sketches import HQ_BINS, HQ_QS
    from etl_project_spark.registry import get

    li = spark.range(N).select(
        F.lit("A").alias("l_returnflag"),
        F.col("id").cast("double").alias("l_extendedprice"),
    )
    li.write.parquet(str(tmp_path / "lineitem.parquet"))

    t0 = time.time()
    out = get("a14_histogram_quantile_sketch").fn(spark, str(tmp_path))
    row = out.collect()
    wall = time.time() - t0
    assert len(row) == 1 and row[0]["l_returnflag"] == "A"

    # independent replay: same doubles, same operation order
    x = np.arange(N, dtype=np.float64)
    mn, mx, n = 0.0, float(N - 1), N
    bins = np.minimum(
        np.floor((x - mn) / (mx - mn) * HQ_BINS), HQ_BINS - 1
    ).astype(np.int64)
    c = np.bincount(bins, minlength=HQ_BINS)
    assert (c > 0).sum() <= HQ_BINS  # bounded sketch state
    cum = np.cumsum(c)
    for q in HQ_QS:
        qn = q * n
        b = int(np.searchsorted(cum, qn, side="left"))
        cum_before = float(cum[b] - c[b])
        expect = mn + (mx - mn) * (b + (qn - cum_before) / float(c[b])) / HQ_BINS
        got = row[0][f"p{int(q * 100)}_est"]
        assert abs(got - expect) < 1e-6, (q, got, expect)
        # and the estimate is within one bin width of the true quantile
        assert abs(got - q * (N - 1)) <= (mx - mn) / HQ_BINS + 1, (q, got)
    assert wall < 120, f"10M-row histogram sketch took {wall:.0f}s"


def test_holt_constant_series_exact_at_10m(spark, tmp_path):
    """ts9's Holt fold on 10M rows (100k users × 100 observations): a
    constant series per user is a fixed point of the a=b=0.5 update in
    exact IEEE arithmetic (0.5·v + 0.5·(v+0) == v), so every user must
    emit level == its value, trend == 0, n_obs == 100 — checked via
    aggregates, never a driver collect of the users."""
    from etl_project_spark.registry import get

    n_users = 100_000
    ev = spark.range(N).select(
        (F.col("id") % n_users).alias("user_id"),
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            (F.col("id") / n_users).cast("long") * 1_000_000
        ).alias("ts"),
        (F.col("id") % n_users).cast("double").alias("value"),
    )
    ev.write.parquet(str(tmp_path / "events.parquet"))

    t0 = time.time()
    out = get("ts9_holt_forecast").fn(spark, str(tmp_path))
    agg = out.agg(
        F.count("*").alias("n"),
        F.max(F.abs(F.col("holt_level") - F.col("user_id"))).alias("dl"),
        F.max(F.abs("holt_trend")).alias("dt"),
        F.min("n_obs").alias("mn_o"),
        F.max("n_obs").alias("mx_o"),
    ).collect()[0]
    wall = time.time() - t0
    assert agg["n"] == n_users
    assert agg["dl"] == 0.0 and agg["dt"] == 0.0
    assert agg["mn_o"] == agg["mx_o"] == 100
    assert wall < 180, f"10M-row Holt fold took {wall:.0f}s"


class _FakeGroupState:
    """Minimal applyInPandasWithState GroupState stand-in for driving
    the stateful kernels directly (state shape + arithmetic, no
    streaming harness)."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        assert isinstance(v, tuple)
        self._v = v


def test_stream_kernels_hold_scalar_state_at_1m_updates_per_key():
    """The streaming sketch/forecast twins must carry O(1) state per
    key no matter how many updates flow through: drive each REAL
    kernel (module-level in streaming/stateful.py) with 1M
    observations for one key across 100 micro-batches and assert the
    state stays a fixed-width scalar tuple with the closed-form final
    value (holt: a constant series is a fixed point of the a=b=0.5
    update; cms: the counter equals total updates; hll: running max
    rho)."""
    import pandas as pd

    from etl_project_spark.streaming.stateful import (
        _cms_cell_update,
        _hll_register_update,
        _holt_update,
    )

    chunk_n, n_chunks = 10_000, 100

    # holt: constant series 7.5 -> state exactly (7.5, 0.0, n) forever
    state = _FakeGroupState()
    chunk = pd.DataFrame(
        {
            "ts": range(chunk_n),
            "event_id": range(chunk_n),
            "value": [7.5] * chunk_n,
        }
    )
    for i in range(n_chunks):
        list(_holt_update((42,), iter([chunk]), state))
        assert len(state.get) == 3  # O(1): (level, trend, n) scalars
        assert state.get[0] == 7.5 and state.get[1] == 0.0
    assert state.get == (7.5, 0.0, chunk_n * n_chunks)

    # cms: per-cell counter equals the exact number of updates seen
    state = _FakeGroupState()
    cell_chunk = pd.DataFrame({"row_": [1] * chunk_n, "col_": [7] * chunk_n})
    for i in range(n_chunks):
        list(_cms_cell_update((1, 7), iter([cell_chunk]), state))
        assert len(state.get) == 1
    assert state.get == (chunk_n * n_chunks,)

    # hll: per-bucket running max rho, insensitive to update volume
    state = _FakeGroupState()
    for i in range(n_chunks):
        rho_chunk = pd.DataFrame({"rho": [1 + (i % 13)] * chunk_n})
        list(_hll_register_update((3,), iter([rho_chunk]), state))
        assert len(state.get) == 1
    assert state.get == (13,)


def test_hll_registers_bounded_and_accurate_at_10m(spark):
    """a12's HLL kernel on 10M synthetic events with EXACTLY 1M
    distinct users (user_id = i % 1_000_000): the register relation
    must stay ≤ 1024 rows no matter the input (the size-invariance
    that makes the sketch a rollup-table citizen), and the estimate
    must land within the 4-sigma error budget of the known truth —
    at a cardinality 4 orders of magnitude past the sf-corpus tests,
    where a broken register rule or a lost MAX would be loud. Also
    hard-bounds the wall clock: the plan is one scan + a ≤1024-row
    shuffle, so 10M rows must clear in seconds."""
    import math

    from etl_project_spark.operators.sketches import (
        HLL_M,
        HLL_WBITS,
        _h32,
    )

    n, distinct = 10_000_000, 1_000_000
    ev = spark.range(n).select(
        (F.col("id") % distinct).alias("user_id")
    )
    h = _h32(F.col("user_id").cast("string"))
    w = h % (1 << HLL_WBITS)
    rho = F.when(w == 0, F.lit(HLL_WBITS + 1)).otherwise(
        F.lit(HLL_WBITS + 1) - F.length(F.conv(w.cast("string"), 10, 2))
    )
    t0 = time.time()
    reg = (
        ev.select(
            (h / (1 << HLL_WBITS)).cast("long").alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
    rows = reg.collect()
    wall = time.time() - t0
    assert len(rows) <= HLL_M
    z_scaled = sum(1 << (HLL_WBITS + 1 - r["rho"]) for r in rows)
    v = HLL_M - len(rows)
    z_scaled += v * (1 << (HLL_WBITS + 1))
    alpha = 0.7213 / (1.0 + 1.079 / HLL_M)
    est = alpha * HLL_M * HLL_M * (1 << (HLL_WBITS + 1)) / z_scaled
    # NOTE: with a 32-bit hash and 1M distinct keys, hash collisions
    # bias the raw estimate low by ~n²/2^33 ≈ 0.01% — negligible next
    # to the 3.3% rse, so the plain 4-sigma budget still applies.
    assert abs(est - distinct) / distinct < 4 * 1.04 / math.sqrt(HLL_M), (
        est,
        distinct,
    )
    assert wall < 120, wall


def test_systematic_pps_exact_at_10m(spark, tmp_path):
    """smp8's two-phase prefix-sum + grid selection at 10M docs with
    weights w(i) = (i % 97) + 1: Σ n_picks must equal SMP8_K exactly
    (grid completeness survives the bucketed cumsum), and every picked
    doc must match the closed-form replay of the grid rule — the
    cumulative sum has the same closed form as the pp1 smoke, so no
    10M-row driver-side loop is needed."""
    from etl_project_spark.operators.pipeline import SMP8_K
    from etl_project_spark.registry import get

    docs = spark.range(N).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") % 97) + 1).alias("n_chars"),
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))

    def cum(i: int) -> int:
        # Σ_{j<=i} (j % 97) + 1, closed form over full cycles
        full, rem = divmod(i + 1, 97)
        return full * (97 * 98 // 2) + rem * (rem - 1) // 2 + rem

    total = cum(N - 1)
    t0 = time.time()
    out = get("smp8_systematic_pps_sample").fn(spark, str(tmp_path))
    rows = out.collect()  # ≤ SMP8_K rows — bounded by construction
    wall = time.time() - t0
    assert sum(r["n_picks"] for r in rows) == SMP8_K
    for r in rows:
        i = r["doc_id"]
        c, w = cum(i), (i % 97) + 1
        assert r["cum_weight"] == c, (i, r["cum_weight"], c)
        picks = (c * SMP8_K) // total - ((c - w) * SMP8_K) // total
        assert r["n_picks"] == picks > 0, (i, r["n_picks"], picks)
    assert wall < 120, f"10M-row systematic PPS took {wall:.0f}s"


def test_containment_prefix_join_at_200k_docs(spark, tmp_path):
    """dd12's asymmetric containment join on a 200k-doc corpus with
    closed-form ground truth: doc 2g+1 is the 21-token PREFIX of doc
    2g's 30 tokens (group-unique vocabularies), so the small doc's 19
    3-shingles are all contained in the big doc's 28 —
    C(small→big) = 1.0 — while the reverse direction is 19/28 ≈ 0.68
    < 0.8 and nothing is shared across groups. The exact output is ONE
    directional pair per group; catches candidate blowups in the
    full-postings destination side and any symmetry bug in the
    source-prefix rule."""
    n_docs = 200_000
    g = (F.col("id") / 2).cast("long")
    n_toks = F.when(F.col("id") % 2 == 0, F.lit(30)).otherwise(F.lit(21))
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_toks),
            lambda k: F.concat(F.lit("w"), g, F.lit("_"), k),
        ),
        " ",
    )
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))

    from etl_project_spark.registry import get

    t0 = time.time()
    rows = get("dd12_containment_pairs").fn(spark, str(tmp_path)).collect()
    elapsed = time.time() - t0
    assert elapsed < 150, f"containment join took {elapsed:.0f}s at 200k docs"
    assert len(rows) == n_docs // 2
    for r in rows:
        # direction: odd (small, 21 tokens) contained in even (big)
        assert r["doc_src"] % 2 == 1 and r["doc_dst"] == r["doc_src"] - 1
        assert r["containment"] == 1.0


def test_seasonal_decomposition_recovers_planted_cycle_at_10m(
    spark, tmp_path
):
    """ts10 on 10M synthetic events spanning ~10 years (~87,600 hourly
    buckets, 40x the sf0.1 series): a pure 24h cycle value = 100 +
    10*hour_of_day decomposes EXACTLY — constant trend 215, seasonal
    10*hod - 115, residual 0 — because every stage is integer-exact
    and a periodic series' every contiguous 24-hour sum is identical.
    Catches blowups in the hourly aggregate and the unpartitioned
    calendar-bounded window that the one-month corpus can't."""
    n = N  # 10M events, one every 32s
    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(1_500_000_000) + F.col("id") * 32
        ).alias("ts"),
        (
            F.lit(100.0)
            + 10.0
            * F.hour(
                F.timestamp_seconds(F.lit(1_500_000_000) + F.col("id") * 32)
            )
        ).alias("value"),
    )
    ev.write.parquet(str(tmp_path / "events.parquet"))

    from etl_project_spark.registry import get

    t0 = time.time()
    rows = get("ts10_seasonal_decomposition").fn(spark, str(tmp_path)).collect()
    elapsed = time.time() - t0
    assert elapsed < 180, f"ts10 took {elapsed:.0f}s at 10M events"
    # every hour between the first and last event observed (the span's
    # first and last hours are partial but still bucketed)
    t_first, t_last = 1_500_000_000, 1_500_000_000 + (n - 1) * 32
    assert len(rows) == t_last // 3600 - t_first // 3600 + 1
    n_trend = 0
    for r in rows:
        hod = r.bucket_hour.hour
        assert r.value_mean == 100.0 + 10.0 * hod
        assert r.seasonal == 10.0 * hod - 115.0
        if r.trend is not None:
            n_trend += 1
            assert r.trend == 215.0
            assert r.residual == 0.0
    assert n_trend == len(rows) - 24  # exactly the 2x12 edge rows lack trend


def test_cross_source_entropy_closed_form_at_200k_docs(spark, tmp_path):
    """lm8 on a 200k-doc synthetic corpus with a 50,001-word vocabulary
    and closed-form cross-entropies: 10 sources, each doc = one shared
    token 'c' + one source-private token (5,000 per source, 4
    occurrences each). Off-diagonal cells see ONLY the shared token;
    the diagonal adds the private mass. Catches vocab-join blowups and
    any corpus-sized relation leaking into the pairwise stage."""
    import math

    n_docs = 200_000
    s = F.col("id") % 10
    # private-token index from id/10 so it is INDEPENDENT of the
    # source digit (id%10 and id%5000 share the factor 10 — the naive
    # pairing gives each source a disjoint 500-token vocabulary)
    text = F.concat(
        F.lit("c s"),
        s,
        F.lit("_t"),
        F.floor(F.col("id") / 10) % 5000,
    )
    spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        s.cast("string").alias("source"),
        text.alias("text"),
    ).write.parquet(str(tmp_path / "documents.parquet"))

    from etl_project_spark.registry import get

    t0 = time.time()
    rows = get("lm8_cross_source_entropy").fn(spark, str(tmp_path)).collect()
    elapsed = time.time() - t0
    assert elapsed < 120, f"lm8 took {elapsed:.0f}s at 200k docs"
    assert len(rows) == 100
    n_s = 2 * (n_docs // 10)  # tokens per source
    vocab = 10 * 5000 + 1
    ce_cross = math.log(n_s + vocab) - 0.5 * math.log(n_docs // 10 + 1)
    ce_self = ce_cross - 0.5 * math.log(4 + 1)
    for r in rows:
        assert r.n_eval_tokens == n_s
        expect = ce_self if r.train_source == r.eval_source else ce_cross
        assert abs(r.cross_entropy - expect) < 1e-6, (
            r.train_source,
            r.eval_source,
        )


def test_hamming_index_at_1m_vectors(spark, tmp_path):
    """Persisted Hamming index at 1M synthetic vectors (100x the sf0.1
    corpus) with planted exact clones: build + probe must stay inside
    the wall-clock budget, the near-dup probe must certify d_k = 0 and
    touch ONE bucket directory in 256, and the returned neighbor must
    be the planted clone. Catches single-task builds and probe plans
    that scan the whole index despite the certificate."""
    n = 1_000_000
    # deterministic ±1 embedding from the id's bits; ids 2g and 2g+1
    # share g's bit pattern -> exact clones, Hamming 0
    g = F.floor(F.col("id") / 2)
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(47)),
        lambda i: F.when(
            F.floor(g / F.pow(F.lit(2.0), (i % 20).cast("double")))
            .cast("long")
            % 2
            == 1,
            1.0,
        ).otherwise(-1.0),
    )
    spark.range(n).select(
        F.col("id").alias("vec_id"), emb.alias("embedding")
    ).write.parquet(str(tmp_path / "embeddings.parquet"))

    from etl_project_spark.operators.similarity import (
        build_hamming_index,
        hamming_signatures,
        query_hamming_index,
    )

    t0 = time.time()
    build_hamming_index(spark, str(tmp_path), table="ham_1m_idx")
    built = time.time() - t0
    assert built < 120, f"build took {built:.0f}s at 1M vectors"
    assert spark.table("ham_1m_idx").count() == n
    # probe three even ids: each has its odd clone at distance 0
    from etl_project_spark.operators.similarity import X17_WORDS

    sigs = {
        r["vec_id"]: tuple(r[f"sig{w}"] for w in range(X17_WORDS))
        for r in hamming_signatures(spark, str(tmp_path))
        .filter(F.col("vec_id").isin(0, 1, 77778, 77779, 500000, 500001))
        .collect()
    }
    queries = [(v, sigs[v]) for v in (0, 77778, 500000)]
    stats: dict = {}
    t0 = time.time()
    rows = query_hamming_index(
        spark, queries, k=1, table="ham_1m_idx", probe_stats=stats
    ).collect()
    probed = time.time() - t0
    assert probed < 60, f"probe took {probed:.0f}s at 1M vectors"
    got = {r["query_id"]: r for r in rows}
    for q in (0, 77778, 500000):
        assert got[q]["hamming"] == 0
        # clones tie at distance 0; the id tie-break picks the lowest
        # non-self — the even partner's odd clone, or an earlier id
        # sharing the 20-bit pattern
        assert sigs.get(got[q]["neighbor_id"], None) is None or (
            got[q]["neighbor_id"] != q
        )
    # each query certifies d_k = 0 -> probes only its own-prefix bucket
    assert stats["pass2_union_buckets"] <= 3, stats


def test_mrl_sketch_at_10m_rows(spark, tmp_path):
    """a15's fold tree over a 10M-row synthetic lineitem (values =
    a bijective scramble of 0..N-1, so exact ranks are closed-form):
    every published rank_err must stay under the asymptotic MRL band
    for these buffer sizes (~0.1%) and the fold must finish inside the
    wall budget. Catches level-window blowups the 6k-row corpus
    can't."""
    n = N
    # (id * 7 + 3) % N is a bijection on [0, N) since gcd(7, N) = 1
    spark.range(n).select(
        F.col("id").alias("l_orderkey"),
        F.lit(1).alias("l_linenumber"),
        ((F.col("id") * 7 + 3) % n).cast("double").alias(
            "l_extendedprice"
        ),
    ).write.parquet(str(tmp_path / "lineitem.parquet"))

    from etl_project_spark.registry import get

    t0 = time.time()
    rows = get("a15_mrl_quantile_sketch").fn(spark, str(tmp_path)).collect()
    elapsed = time.time() - t0
    assert elapsed < 240, f"a15 took {elapsed:.0f}s at 10M rows"
    assert len(rows) == 6
    for r in rows:
        # value v has exact rank v (bijection onto 0..N-1)
        assert r.exact_rank == int(r.est_value)
        assert r.rank_err <= 0.001, (r.p, r.rank_err)


def test_merge_upsert_at_10m_changes(spark, tmp_path):
    """cdc4's merge core at 10M change rows over a 1M-key snapshot
    (closed-form synthetic): id i is a change for key i % 1M with
    version v = i // 1M and value v * 1M + key — the per-key latest is
    v = 9, tombstones hit keys ≡ 0 (mod 100) via NULL value at v = 9,
    and keys ≥ 500k are absent from the target (inserts). Verifies
    action counts and spot values in closed form, inside a wall
    budget. Catches merge plans whose join stops riding the
    aggregate partitioning (a third full shuffle would blow the
    budget at this size) and tombstone handling that only works at
    fixture scale."""
    import time as _time

    from etl_project_spark.operators.cdc import merge_snapshot

    n_keys = 1_000_000
    n_changes = 10_000_000
    base_ts = F.lit("2024-01-01 00:00:00").cast("timestamp")
    target = spark.range(500_000).select(
        F.col("id").alias("user_id"),
        F.lit("click").alias("event_type"),
        base_ts.alias("ts"),
        (F.col("id") * 1.0).alias("value"),
    )
    key = F.col("id") % n_keys
    ver = F.floor(F.col("id") / n_keys)
    changes = spark.range(n_changes).select(
        F.col("id").alias("event_id"),
        (base_ts + F.make_interval(secs=ver * 60)).alias("ts"),
        key.alias("user_id"),
        F.lit("click").alias("event_type"),
        F.when(
            (key % 100 == 0) & (ver == 9), F.lit(None).cast("double")
        )
        .otherwise((ver * F.lit(float(n_keys))) + key)
        .alias("value"),
    )
    t0 = _time.time()
    out = merge_snapshot(target, changes)
    counts = {
        r["action"]: (r["n"], r["sv"])
        for r in out.groupBy("action")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("user_id").alias("sv"),
        )
        .collect()
    }
    elapsed = _time.time() - t0
    assert elapsed < 180, f"merge took {elapsed:.0f}s at 10M changes"
    # tombstoned keys: multiples of 100 -> 10k of 1M keys vanish;
    # updates = present-in-target keys (0..499999) minus their
    # tombstones; inserts = absent keys minus theirs; keeps = none
    # (every target key gets a change)
    n_tomb_low = 5_000  # multiples of 100 in [0, 500k)
    assert counts["update"][0] == 500_000 - n_tomb_low
    assert counts["insert"][0] == 500_000 - n_tomb_low
    assert "keep" not in counts
    # value spot-check: every surviving row carries v=9's value
    spot = (
        out.filter(F.col("user_id").isin(1, 123_457, 999_999))
        .select("user_id", "value", "action")
        .collect()
    )
    for r in spot:
        assert r["value"] == 9.0 * n_keys + r["user_id"], r
