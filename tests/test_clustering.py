"""km1 integer-exact k-means + sd1 SemDeDup: Lloyd's descent property,
assignment validity, and pruning precision/recall vs the exact
brute-force cosine pair set."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from etl_project_spark.operators import clustering as km
from etl_project_spark.registry import get


def _quantized_matrix(spark, sf_dir):
    rows = sorted(
        km._quantized(spark, sf_dir).collect(), key=lambda r: r["vec_id"]
    )
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    Q = np.array([r["q"] for r in rows], dtype=np.int64)
    return ids, Q


def _inertia(Q, ids, assign, centroids):
    cl = np.array([assign[i] for i in ids])
    total = 0
    for c, cen in centroids.items():
        member = Q[cl == c]
        d = member - np.asarray(cen, dtype=np.int64)[None, :]
        total += int((d * d).sum())
    return total


def test_kmeans_descends_and_covers(spark, sf_dir):
    """Lloyd's invariant: inertia against the CURRENT centroids is
    non-increasing iteration over iteration (each assignment step picks
    the nearest centroid; each update step is the within-cluster
    mean, up to the int re-quantization whose perturbation is bounded
    by 0.5 per dim). Also: every vector is assigned, clusters are a
    subset of the seed ids."""
    ids, Q = _quantized_matrix(spark, sf_dir)
    # replay the iterations locally (same integer arithmetic)
    clusters = list(range(km.KM_K))
    C = Q[: km.KM_K].copy()
    prev = None
    for _ in range(km.KM_ITERS):
        diff = Q[:, None, :] - C[None, :, :]
        d = (diff * diff).sum(axis=2)
        a = np.argmin(d, axis=1)
        inertia = int(d[np.arange(len(Q)), a].sum())
        if prev is not None:
            # assignment against the updated centroids can't be worse
            # than the previous iteration's final inertia by more than
            # the re-quantization slack (0.25 per dim per point)
            assert inertia <= prev + len(Q) * Q.shape[1]
        # centroid update (exact int sums, floor(s/n + 0.5))
        C = np.array(
            [
                np.floor(Q[a == j].sum(axis=0) / max((a == j).sum(), 1) + 0.5)
                if (a == j).any()
                else C[j]
                for j in range(len(C))
            ],
            dtype=np.int64,
        )
        prev = int(
            ((Q - C[a]) * (Q - C[a])).sum()
        )  # inertia against updated centroids
    got = {
        r["vec_id"]: r["cluster"]
        for r in get("km1_kmeans_lloyd").fn(spark, sf_dir).collect()
    }
    assert set(got) == set(int(i) for i in ids)
    assert set(got.values()) <= set(range(km.KM_K))


def test_semantic_dedup_precision_and_recall(spark, sf_dir):
    """Every sd1 prune is a TRUE near-dup (precision 1: the keeper
    really sits at cosine >= tau, verified brute-force), and clustered
    pruning retains a measured fraction of the exact pair set (the
    SemDeDup recall trade: cross-cluster pairs are the loss)."""
    emb = sorted(
        km.load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .collect(),
        key=lambda r: r["vec_id"],
    )
    ids = np.array([r["vec_id"] for r in emb])
    M = np.vstack([r["e"] for r in emb])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    sim = M @ M.T
    ia, ib = np.nonzero(np.triu(sim >= km.SD_TAU, k=1))
    exact_dropped = {int(ids[b]) for b in ib}

    got = {
        r["vec_id"]: r["keeper_id"]
        for r in get("sd1_semantic_dedup").fn(spark, sf_dir).collect()
    }
    assert got, "no prunes — threshold is vacuous on this corpus"
    pos = {int(v): k for k, v in enumerate(ids)}
    for dropped, keeper in got.items():
        assert keeper < dropped
        assert sim[pos[keeper], pos[dropped]] >= km.SD_TAU  # precision 1
    # near-random embeddings are SemDeDup's worst case: tau=0.4 pairs
    # are marginal (not planted duplicates), so many straddle Voronoi
    # boundaries. The 2-nearest-centroid soft assignment (round 4)
    # recovers boundary-straddling pairs: measured 0.79-0.85 at
    # sf0.01/sf0.1 (RECALL.json; was 0.41-0.45 hard-assigned). At a
    # production tau≈0.95 true duplicates are near-identical vectors
    # and co-cluster with probability ≈1.
    recall = len(set(got) & exact_dropped) / len(exact_dropped)
    assert recall >= 0.9, f"clustered dedup recall {recall:.2f}"


def test_probe_assignment_contract(spark, sf_dir):
    """kmeans_probe_assignments: exactly nprobe rows per vector with
    distinct cells, and rank-1 equals the hard assignment (same packed
    exact distance key)."""
    hard = {
        r["vec_id"]: r["cluster"]
        for r in km.kmeans_assignments(spark, sf_dir).collect()
    }
    probe_rows = km.kmeans_probe_assignments(spark, sf_dir, 2).collect()
    by_vec: dict[int, list[int]] = {}
    for r in probe_rows:
        by_vec.setdefault(r["vec_id"], []).append(r["cluster"])
    assert set(by_vec) == set(hard)
    for vec_id, cells in by_vec.items():
        assert len(cells) == 2 and len(set(cells)) == 2, (vec_id, cells)
        # mapInPandas emits the nprobe cells in rank order per vector
        assert cells[0] == hard[vec_id], (vec_id, cells)


def test_margin_probe_assignment_contract(spark, sf_dir):
    """kmeans_margin_probe_assignments: brute-force numpy replay of the
    residual-aware rule — the probe set must equal {min_probes nearest
    by packed key} UNION {cells with dist*100 <= d1*margin_pct}, with
    nprobes the exact set size on every row, and rank-1 membership
    (the hard assignment's cell) always present."""
    clusters, C = km._kmeans_final_state(spark, sf_dir)
    q = {
        r["vec_id"]: np.array(r["q"], dtype=np.int64)
        for r in km._quantized(spark, sf_dir).collect()
    }
    cls = np.array(clusters, dtype=np.int64)
    margin_pct, min_probes = 120, 3
    rows = km.kmeans_margin_probe_assignments(
        spark, sf_dir, margin_pct, min_probes
    ).collect()
    by_vec: dict[int, set] = {}
    nprobes: dict[int, int] = {}
    for r in rows:
        by_vec.setdefault(r["vec_id"], set()).add(r["cluster"])
        nprobes[r["vec_id"]] = r["nprobes"]
    assert set(by_vec) == set(q)
    for vid, qv in q.items():
        d = ((C - qv[None, :]) ** 2).sum(axis=1)
        packed = d * km.KM_K + cls
        order = np.argsort(packed)
        d1 = d[order[0]]
        expect = set(cls[order[:min_probes]]) | {
            int(cls[i])
            for i in range(len(cls))
            if d[i] * 100 <= d1 * margin_pct
        }
        assert by_vec[vid] == expect, vid
        assert nprobes[vid] == len(expect), vid
        assert int(cls[order[0]]) in by_vec[vid]
