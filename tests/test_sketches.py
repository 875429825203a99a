"""Property pins for the deterministic sketch twins (a12/a13/a14) and
the embedding-drift monitor (dq10): beyond the differential hash check
(which proves Spark == DuckDB), these assert the sketches' THEORETICAL
guarantees against exact ground truth — the part a replayed-but-wrong
implementation would still fail."""

from __future__ import annotations

import importlib.util
import math
import pathlib

from pyspark.sql import functions as F

from etl_project_spark.catalog import load_table
from etl_project_spark.registry import all_queries


def test_a12_hll_estimate_within_error_budget(spark, sf_dir):
    """HLL with m=1024 registers has rse ≈ 1.04/√1024 ≈ 3.3%; the
    estimate must sit within 4 sigma of the exact distinct count (and
    the relation itself publishes both, so this is also a self-check
    of the published row)."""
    row = all_queries()["a12_hll_md5_reference"](spark, sf_dir).collect()[0]
    est, exact = row["n_users_est"], row["n_users_exact"]
    assert exact > 0
    assert abs(est - exact) / exact < 4 * 1.04 / math.sqrt(1024), row


def test_a13_countmin_estimates_are_one_sided(spark, sf_dir):
    """Count-Min never underestimates: est >= true for every published
    key, and the inflation is bounded by the sketch guarantee
    eps = e/w per unit of total mass at 3-row confidence."""
    rows = all_queries()["a13_countmin_heavy_hitters"](
        spark, sf_dir
    ).collect()
    assert rows
    n_total = load_table(spark, sf_dir, "events").count()
    from etl_project_spark.operators.sketches import CM_W

    for r in rows:
        assert r["est_count"] >= r["true_count"], r
        # generous 3x the expected-collision bound — a wrong hash or a
        # lost MIN would blow straight past it
        assert r["est_count"] - r["true_count"] <= 3 * n_total / CM_W, r


def test_a14_histogram_quantiles_within_bin_width(spark, sf_dir):
    """The interpolated estimate can be off by at most one bin width
    from the exact quantile (equi-width histogram guarantee)."""
    est = {
        r["l_returnflag"]: r
        for r in all_queries()["a14_histogram_quantile_sketch"](
            spark, sf_dir
        ).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exact = (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
            F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
            F.min("l_extendedprice").alias("mn"),
            F.max("l_extendedprice").alias("mx"),
        )
        .collect()
    )
    from etl_project_spark.operators.sketches import HQ_BINS

    for r in exact:
        width = (r["mx"] - r["mn"]) / HQ_BINS
        e = est[r["l_returnflag"]]
        for q in (50, 90, 99):
            assert abs(e[f"p{q}_est"] - r[f"p{q}"]) <= 2 * width, (
                r["l_returnflag"],
                q,
                e[f"p{q}_est"],
                r[f"p{q}"],
            )


def test_dq10_drift_near_one_on_stationary_clustered_data(spark, tmp_path):
    """On label-clustered embeddings whose even/odd halves come from
    the SAME distribution (the planted fixture), per-label centroid
    cosine must sit near 1.0 — the stationary baseline a drift alarm
    thresholds against. (The uniform driver corpus gives noisy
    centroids by construction; the hash check covers it there.)"""
    tool = (
        pathlib.Path(__file__).parent.parent / "tools" / "measure_recall.py"
    )
    spec = importlib.util.spec_from_file_location("measure_recall", tool)
    mr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mr)
    planted = mr.make_planted_fixture(str(tmp_path / "planted"), n=2000)
    rows = all_queries()["dq10_embedding_drift"](spark, planted).collect()
    assert len(rows) == 25  # one row per planted cluster label
    for r in rows:
        assert r["centroid_cosine"] > 0.95, r
        assert r["n_ref"] + r["n_cur"] > 0


def test_ann_twins_are_drop_in_compatible(spark, sf_dir):
    """The deterministic reference twins must be drop-in interchangeable
    with their production paths: same output schema (name, type,
    nullability-insensitive) and same per-query row budget, so a
    consumer can swap x4→x14 / x9→x15 (and x3→x6) for a replayable run
    without touching downstream code."""
    qs = all_queries()
    for prod, twin in [
        ("x4_ivf_topk", "x14_ivf_reference_topk"),
        ("x9_pq_topk", "x15_pq_reference_topk"),
        ("x3_lsh_bucketed_topk", "x6_rademacher_lsh_topk"),
        # the composed serving pipelines serve the same contract as
        # the production IVF path they prune for
        ("x4_ivf_topk", "x19_ivfpq_serving_topk"),
        ("x4_ivf_topk", "x20_ivfpq_trained_serving"),
    ]:
        p = qs[prod](spark, sf_dir)
        t = qs[twin](spark, sf_dir)
        assert [(f.name, f.dataType) for f in p.schema.fields] == [
            (f.name, f.dataType) for f in t.schema.fields
        ], (prod, twin)
        from pyspark.sql import functions as F2

        per_q = (
            t.groupBy("query_id")
            .agg(F2.count(F2.lit(1)).alias("n"))
            .collect()
        )
        from etl_project_spark.operators.similarity import TOP_K

        assert all(r["n"] <= TOP_K for r in per_q), (twin, per_q)


def test_mrl_sketch_matches_python_fold_and_bounds_error(spark, sf_dir):
    """a15's fold tree replayed from scratch in Python (adaptive
    mrl_params depth, integer-mix buckets, sorted-merge odd-position
    compaction) must select the identical summary elements, and every
    published rank_err must stay inside a loose MRL bound for this
    tree (~2% at the sf0.001 buffer sizes)."""
    import math

    from etl_project_spark.catalog import load_table
    from etl_project_spark.operators.sketches import (
        MRL_QS,
        mrl_params,
    )
    from etl_project_spark.registry import get

    rows = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    ).collect()
    n = len(rows)
    levels, nbuckets, w = mrl_params(n)
    buckets: dict[int, list] = {b: [] for b in range(nbuckets)}
    for r in rows:
        b = (
            r.l_orderkey * 40503 + r.l_linenumber * 2654435761
        ) % nbuckets
        buckets[b].append(
            (r.l_extendedprice, r.l_orderkey * 8 + r.l_linenumber)
        )
    cur = buckets
    for _ in range(levels):
        nxt: dict[int, list] = {}
        for b, els in cur.items():
            nxt.setdefault(b // 2, []).extend(els)
        cur = {
            b: sorted(els)[::2] for b, els in nxt.items()
        }  # odd sorted positions (1st, 3rd, ... 1-indexed)
    fin = sorted(el for els in cur.values() for el in els)
    want = {}
    for p in MRL_QS:
        i = min(max(int(math.ceil(p * n / w + 0.5)), 1), len(fin))
        want[p] = fin[i - 1][0]
    got = {
        r.p: r
        for r in get("a15_mrl_quantile_sketch").fn(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    exact_sorted = sorted(r.l_extendedprice for r in rows)
    for p, r in got.items():
        assert r.est_value == want[p], p
        # published honesty column re-derives
        exact_rank = sum(1 for v in exact_sorted if v < r.est_value)
        assert r.exact_rank == exact_rank
        assert abs(r.rank_err - round(abs(exact_rank - p * n) / n, 6)) == 0
        assert r.rank_err <= 0.02, (p, r.rank_err)


def test_mrl_adaptive_fold_replay_midsize(spark, tmp_path):
    """The sf0.001 corpus sits below the no-fold threshold
    (MRL_FINAL_B*MRL_BUF_CAP rows), so the replay above never folds;
    this synthetic 150k-row lineitem forces levels=3 and replays the
    full adaptive tree element-for-element, plus pins mrl_params'
    derivation at the exact power-of-two boundaries."""
    import math

    from pyspark.sql import functions as F

    from etl_project_spark.operators.sketches import (
        MRL_BUF_CAP,
        MRL_FINAL_B,
        MRL_MAX_LEVELS,
        MRL_QS,
        mrl_params,
    )
    from etl_project_spark.registry import get

    # derivation pins: no fold at/below the threshold, one more level
    # exactly when the count crosses a power-of-two boundary, capped
    thr = MRL_FINAL_B * MRL_BUF_CAP
    assert mrl_params(1) == (0, MRL_FINAL_B, 1)
    assert mrl_params(thr) == (0, MRL_FINAL_B, 1)
    assert mrl_params(thr + 1) == (1, MRL_FINAL_B * 2, 2)
    assert mrl_params(4 * thr) == (2, MRL_FINAL_B * 4, 4)
    assert mrl_params(4 * thr + 1) == (3, MRL_FINAL_B * 8, 8)
    assert mrl_params(10**18)[0] == MRL_MAX_LEVELS

    n = 150_000
    levels, nbuckets, w = mrl_params(n)
    assert levels == 3, (levels, nbuckets)
    spark.range(n).select(
        F.col("id").alias("l_orderkey"),
        (F.col("id") % 7 + 1).alias("l_linenumber"),
        (((F.col("id") * 48271 + 11) % n)).cast("double").alias(
            "l_extendedprice"
        ),
    ).write.parquet(str(tmp_path / "lineitem.parquet"))

    rows = [
        (i, int(i % 7 + 1), float((i * 48271 + 11) % n))
        for i in range(n)
    ]
    buckets: dict[int, list] = {}
    for ok, ln, v in rows:
        b = (ok * 40503 + ln * 2654435761) % nbuckets
        buckets.setdefault(b, []).append((v, ok * 8 + ln))
    cur = buckets
    for _ in range(levels):
        nxt: dict[int, list] = {}
        for b, els in cur.items():
            nxt.setdefault(b // 2, []).extend(els)
        cur = {b: sorted(els)[::2] for b, els in nxt.items()}
    assert len(cur) == MRL_FINAL_B
    assert all(len(els) <= MRL_BUF_CAP + levels for els in cur.values())
    fin = sorted(el for els in cur.values() for el in els)
    got = {
        r.p: r
        for r in get("a15_mrl_quantile_sketch")
        .fn(spark, str(tmp_path))
        .collect()
    }
    for p in MRL_QS:
        i = min(max(int(math.ceil(p * n / w + 0.5)), 1), len(fin))
        r = got[p]
        assert r.est_value == fin[i - 1][0], p
        # values are a bijection onto 0..n-1: exact rank == value
        assert r.exact_rank == int(r.est_value)
        assert r.rank_err <= 0.002, (p, r.rank_err)


def test_mrl_chunked_fold_matches_per_level_fold(spark, sf_dir, monkeypatch):
    """r12: the blocked fold (MRL_FOLD_CHUNK levels per shuffle) must
    produce the identical summary/output as the per-level fold — the
    chunk key only pins partitioning; the pairwise merges are the same
    tree either way."""
    from etl_project_spark.operators import sketches as SK

    monkeypatch.setattr(SK, "MRL_FOLD_CHUNK", 1)
    per_level = SK.a15_mrl_quantile_sketch(spark, sf_dir).orderBy("p").collect()
    monkeypatch.setattr(SK, "MRL_FOLD_CHUNK", 5)
    blocked = SK.a15_mrl_quantile_sketch(spark, sf_dir).orderBy("p").collect()
    assert per_level == blocked
