"""Embedding clustering + semantic dedup — the SemDeDup-shaped pair a
training-data pipeline runs over an embedded corpus: k-means partitions
the space, then near-duplicate pruning pays its quadratic cost only
WITHIN clusters (Abbas et al.'s SemDeDup recipe, re-expressed on
DataFrames).

Differential-checkability is the hard part of iterative clustering: a
float k-means diverges across engines because sum order perturbs means,
means perturb assignments, and one flipped assignment cascades. km1
sidesteps the whole class: embeddings are quantized once to int64
(floor(x*10^4 + 0.5), the x7 rule), distances are exact integer sums
(associative — order cannot matter), and centroid updates re-quantize
through floor(sum/n + 0.5) where sum is an exact int64 — every engine
computes bit-identical assignments at every iteration, so the DuckDB
oracle (the same 3 Lloyd iterations unrolled as CTEs, an5's PageRank
trick) hash-matches exactly.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_project_spark.catalog import load_table
from etl_project_spark.registry import register

KM_K = 8  # clusters
# Lloyd iterations (fixed — static plan, an5 precedent). Must stay
# >= 2: km2 reads trace[-2] (the state the final assignment used).
KM_ITERS = 3
assert KM_ITERS >= 2, "km2 indexes trace[-2]"
KM_DIM = 64  # embedding width of the corpus
KM_QSCALE = 10000  # quantization: floor(x*1e4 + 0.5), exact in int64
SD_TAU = 0.4  # semantic-dedup cosine threshold (dd6's corpus-aware bar)

_DIST = (
    "list_sum(list_transform(list_zip(e.q, c.q), "
    "p -> (struct_extract(p, 1) - struct_extract(p, 2))"
    " * (struct_extract(p, 1) - struct_extract(p, 2))))"
)


def _km_oracle_ctes() -> str:
    """The km1 iterations unrolled as DuckDB CTEs (e0 = quantized
    vectors, c0 = seed centroids, a{k}/c{k} = assignment/update)."""
    parts = [
        f"""
    WITH e0 AS (
        SELECT vec_id,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> CAST(FLOOR(x * {KM_QSCALE} + 0.5) AS BIGINT))
                   AS q
        FROM embeddings
    ), c0 AS (
        SELECT vec_id AS cl, q FROM e0 WHERE vec_id < {KM_K}
    )"""
    ]
    for k in range(1, KM_ITERS + 1):
        parts.append(f""", a{k} AS (
        -- tie-break packed into one exact BIGINT: dist*K + cl picks
        -- the lowest cluster id among equal distances (dist < 2^42,
        -- so the pack cannot overflow or collide)
        SELECT e.vec_id,
               arg_min(c.cl, ({_DIST}) * {KM_K} + c.cl) AS cl
        FROM e0 e CROSS JOIN c{k - 1} c
        GROUP BY e.vec_id
    )""")
        if k < KM_ITERS:
            parts.append(f""", c{k} AS (
        SELECT cl, list(ci ORDER BY i) AS q
        FROM (
            SELECT a.cl, g.i,
                   CAST(FLOOR(CAST(SUM(e.q[g.i]) AS DOUBLE) / COUNT(*) + 0.5)
                        AS BIGINT) AS ci
            FROM a{k} a JOIN e0 e USING (vec_id)
            CROSS JOIN generate_series(1, {KM_DIM}) AS g(i)
            GROUP BY a.cl, g.i
        ) GROUP BY cl
    )""")
    return "".join(parts)


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor(x * KM_QSCALE + F.lit(0.5)).cast("long"),
        ).alias("q"),
    )


# Final-state memo: the Lloyd loop's driver-side collects re-execute
# eagerly on every call, and km1/sd1/ivf_centroids/build_ivf_index each
# need the same state — without the memo a bench or driver window pays
# the full 3-iteration loop up to 4x per sf (round-3 advice). Pure
# deterministic data (integer-exact arithmetic, fixed seeds), so the
# memo is safe across SparkSessions; keyed on (sf_dir, parquet
# fingerprint) so a REGENERATED fixture under the same path invalidates
# it instead of serving stale clusters (round-4 advice).
_KM_STATE: dict[tuple, list[tuple[list[int], np.ndarray]]] = {}
_KM_CENTROIDS: dict[tuple, np.ndarray] = {}


def _km_key(sf_dir: str) -> tuple:
    from etl_project_spark.catalog import table_fingerprint

    return (sf_dir, table_fingerprint(sf_dir, "embeddings"))


def _kmeans_state_trace(
    spark: SparkSession, sf_dir: str
) -> list[tuple[list[int], np.ndarray]]:
    """Every centroid state of the Lloyd loop: ``trace[0]`` = seeds,
    ``trace[t]`` = (cluster ids, quantized centroid matrix) after t
    updates, up to ``trace[KM_ITERS - 1]`` — the state the FINAL
    assignment pass scans with. km2's silhouette needs the PENULTIMATE
    state too (the membership it evaluates is the assignment that
    built the final centroids), so the whole trace is memoized — it is
    the same loop either way, just without discarding history.

    Seeds are the KM_K lowest vec_ids (engine-neutral; production
    swaps in k-means|| — the loop is init-agnostic). Per iteration:
    assignment is one numpy int64 kernel per Arrow batch (exact —
    integer adds are associative, so numpy's reduction order is
    irrelevant), and the centroid update aggregates exact integer
    sums per (cluster, dim) — a 512-row collect per iteration steers
    the next broadcast, the same bounded-driver-pull pattern as the
    IVF centroids (similarity.py). The corpus is scanned once per
    iteration; at 100 TB persist the quantized projection and
    checkpoint like an5."""
    key = _km_key(sf_dir)
    if key in _KM_STATE:
        return _KM_STATE[key]
    embq = _quantized(spark, sf_dir)
    seeds = sorted(
        embq.filter(F.col("vec_id") < KM_K).collect(),
        key=lambda r: r["vec_id"],
    )
    clusters = [int(r["vec_id"]) for r in seeds]
    C = np.array([r["q"] for r in seeds], dtype=np.int64)
    trace = [(clusters, C)]
    for _it in range(KM_ITERS - 1):
        assign = _assign_kernel(embq, clusters, C)
        sums = (
            assign.join(embq, "vec_id")
            .select("cluster", F.posexplode("q").alias("i", "v"))
            .groupBy("cluster", "i")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_cl: dict[int, list] = {}
        for r in sums:
            by_cl.setdefault(int(r["cluster"]), [None] * KM_DIM)[
                int(r["i"])
            ] = math.floor(int(r["s"]) / int(r["n"]) + 0.5)
        clusters = sorted(by_cl)
        C = np.array([by_cl[cl] for cl in clusters], dtype=np.int64)
        trace.append((clusters, C))
    _KM_STATE[key] = trace
    return trace


def _kmeans_final_state(
    spark: SparkSession, sf_dir: str
) -> tuple[list[int], np.ndarray]:
    """(cluster ids, quantized centroid matrix) after the KM_ITERS-1
    centroid updates — see :func:`_kmeans_state_trace`."""
    return _kmeans_state_trace(spark, sf_dir)[-1]


def kmeans_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cluster) after KM_ITERS integer-exact Lloyd iterations
    (see _kmeans_final_state for the loop and its scale posture)."""
    clusters, C = _kmeans_final_state(spark, sf_dir)
    return _assign_kernel(_quantized(spark, sf_dir), clusters, C)


def kmeans_probe_assignments(
    spark: SparkSession, sf_dir: str, nprobe: int = 2
) -> DataFrame:
    """(vec_id, cluster) soft assignment: each vector mapped to its
    ``nprobe`` nearest final centroids (same integer-exact distance and
    lowest-cluster-id tie-break as the hard assignment — rank 1 is
    exactly ``kmeans_assignments``). The pruning passes (sd1) scan this
    instead of the hard assignment so near-dup pairs straddling a
    Voronoi boundary land in a shared cell; cost is nprobe rows per
    vector — linear, never quadratic."""
    clusters, C = _kmeans_final_state(spark, sf_dir)
    return _assign_kernel(
        _quantized(spark, sf_dir), clusters, C, nprobe=nprobe
    )


def kmeans_margin_probe_assignments(
    spark: SparkSession,
    sf_dir: str,
    margin_pct: int,
    min_probes: int,
    embq: DataFrame | None = None,
) -> DataFrame:
    """(vec_id, cluster, nprobes) RESIDUAL-AWARE soft assignment: each
    vector probes every final centroid whose exact integer distance
    sits within ``margin_pct``% of its nearest centroid's distance
    (``d_c * 100 <= d_1 * margin_pct``), floored to the ``min_probes``
    nearest cells by the packed ``dist*K + cl`` key. Interior vectors
    keep the minimum probe budget; Voronoi-boundary vectors — the ones
    whose true neighbors straddle cells — expand adaptively, which is
    where a FIXED nprobe loses its recall (measured at sf0.1: fixed
    nprobe=4 covers 0.90 of true top-k cells at 4 probes/query, the
    margin rule covers 0.98 at the same 4.0 average). ``nprobes`` is
    emitted so consumers can scale shortlist depth with the realized
    probe width. All comparisons are exact int64 (dist < 2^42, so the
    *100 / *margin_pct products stay far under 2^63) — both engines
    derive the identical probe set. Pass ``embq`` to probe a subset
    (e.g. only the query vectors) without scanning the corpus."""
    clusters, C = _kmeans_final_state(spark, sf_dir)
    if embq is None:
        embq = _quantized(spark, sf_dir)
    bC = embq.sparkSession.sparkContext.broadcast((clusters, C))

    def kernel(batches):
        cls, cen = bC.value
        cls = np.array(cls, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.vstack(pdf["q"].to_numpy()).astype(np.int64)
            diff = M[:, None, :] - cen[None, :, :]
            d = (diff * diff).sum(axis=2)  # exact int64; max ~4e11
            packed = d * KM_K + cls[None, :]
            order = np.argsort(packed, axis=1)
            d1 = np.take_along_axis(d, order[:, :1], axis=1)
            sel = d * 100 <= d1 * margin_pct
            rows = np.arange(len(M))
            for j in range(min(min_probes, d.shape[1])):
                sel[rows, order[:, j]] = True
            counts = sel.sum(axis=1).astype(np.int64)
            ri, ci = np.nonzero(sel)
            ids = pdf["vec_id"].to_numpy()
            yield pd.DataFrame(
                {
                    "vec_id": ids[ri],
                    "cluster": cls[ci],
                    "nprobes": counts[ri],
                }
            )

    return embq.mapInPandas(
        kernel, schema="vec_id long, cluster long, nprobes long"
    )


def kmeans_centroids(spark: SparkSession, sf_dir: str) -> np.ndarray:
    """Per-final-cluster mean of the ORIGINAL double embeddings after
    the km1 iterations — the Lloyd-refined centroid matrix (KM_K x dim,
    cluster-id row order). Plugging these into the IVF paths nearly
    doubles recall@k vs the raw hash-sample seeds (measured 0.46 ->
    0.80 at nprobe=2 on this corpus): refined centroids balance the
    Voronoi cells, so a fixed probe budget covers more of each query's
    true neighborhood. Memoized per sf_dir like the Lloyd state."""
    key = _km_key(sf_dir)
    if key in _KM_CENTROIDS:
        return _KM_CENTROIDS[key]
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    assign = kmeans_assignments(spark, sf_dir)
    rows = (
        assign.join(emb, "vec_id")
        .select("cluster", F.posexplode("e").alias("i", "v"))
        .groupBy("cluster", "i")
        .agg(F.avg("v").alias("m"))
        .collect()
    )
    by_cl: dict[int, dict[int, float]] = {}
    dim = 0
    for r in rows:
        by_cl.setdefault(int(r["cluster"]), {})[int(r["i"])] = float(r["m"])
        dim = max(dim, int(r["i"]) + 1)
    out = np.array(
        [
            [by_cl[cl][i] for i in range(dim)]
            for cl in sorted(by_cl)
        ],
        dtype=np.float64,
    )
    _KM_CENTROIDS[key] = out
    return out


def _assign_kernel(
    embq: DataFrame,
    clusters: list[int],
    C: np.ndarray,
    nprobe: int = 1,
) -> DataFrame:
    bC = embq.sparkSession.sparkContext.broadcast((clusters, C))

    def kernel(batches):
        cls, cen = bC.value
        cls = np.array(cls, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.vstack(pdf["q"].to_numpy()).astype(np.int64)
            diff = M[:, None, :] - cen[None, :, :]
            d = (diff * diff).sum(axis=2)  # exact int64; max ~4e11
            if nprobe == 1:
                # argmin returns the FIRST minimum: cls ascending = the
                # lowest-cluster-id tie-break the oracle's arg_min uses
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"].to_numpy(),
                        "cluster": cls[np.argmin(d, axis=1)],
                    }
                )
            else:
                # top-nprobe by the same packed exact key the oracle
                # ranks on (dist*K + cl: unique per cell, so the sort
                # is total and any argsort kind is deterministic)
                packed = d * KM_K + cls[None, :]
                idx = np.argsort(packed, axis=1)[:, :nprobe]
                ids = pdf["vec_id"].to_numpy()
                yield pd.DataFrame(
                    {
                        "vec_id": np.repeat(ids, idx.shape[1]),
                        "cluster": cls[idx].ravel(),
                    }
                )

    return embq.mapInPandas(kernel, schema="vec_id long, cluster long")


@register(
    "km1_kmeans_lloyd",
    oracle=_km_oracle_ctes()
    + f"""
    SELECT vec_id, cl AS cluster FROM a{KM_ITERS}
    """,
)
def km1_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means over the embedding corpus: {KM_K} clusters, {KM_ITERS}
    Lloyd iterations, integer-exact arithmetic (module docstring) so
    the unrolled-CTE oracle hash-matches the per-vector assignment —
    a differential check most engines can't run on float k-means at
    all. The iterative-algorithm pattern beyond an5's PageRank: here
    the per-iteration state (centroids) is driver-small while the
    assignment stays distributed."""
    return kmeans_assignments(spark, sf_dir)


SD_NPROBE = 3  # soft-assignment width for the pruning pass (r5: 2 -> 3
# lifted recall vs the exact cosine drop set from 0.85/0.79 to
# 1.0/0.96 at sf0.01/sf0.1 — cost is linear, nprobe rows per vector)


@register(
    "sd1_semantic_dedup",
    oracle=_km_oracle_ctes()
    + f""", probe AS (
        -- each vector's {SD_NPROBE} nearest final centroids, ranked by
        -- the same packed exact key the hard assignment arg_min uses
        SELECT vec_id, cl FROM (
            SELECT e.vec_id, c.cl,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY ({_DIST}) * {KM_K} + c.cl) AS rnk
            FROM e0 e CROSS JOIN c{KM_ITERS - 1} c
        ) WHERE rnk <= {SD_NPROBE}
    ), v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), pairs AS (
        SELECT a.vec_id AS keep, b.vec_id AS drop_
        FROM probe a JOIN probe b
          ON a.cl = b.cl AND a.vec_id < b.vec_id
        JOIN v va ON va.vec_id = a.vec_id
        JOIN v vb ON vb.vec_id = b.vec_id
        WHERE list_dot_product(va.e, vb.e)
              / (sqrt(list_dot_product(va.e, va.e))
                 * sqrt(list_dot_product(vb.e, vb.e)))
              >= {SD_TAU}
    )
    SELECT drop_ AS vec_id, MIN(keep) AS keeper_id
    FROM pairs GROUP BY drop_
    """,
)
def sd1_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: semantic near-duplicate pruning, clustered first so
    the pairwise cosine pays out only within clusters — the recipe
    that makes embedding dedup tractable on a billion-document corpus
    (Abbas et al.; clusters bound the quadratic). The pruning pass
    scans a {SD_NPROBE}-nearest-centroid SOFT assignment, not the hard
    one: a near-dup pair split by a Voronoi boundary still shares a
    runner-up cell, which lifted measured recall vs the exact cosine
    drop set from 0.41-0.45 (hard assignment, round 3) through
    0.85/0.79 (nprobe=2, round 4) to 1.0/0.96 at sf0.01/sf0.1
    (nprobe=3, the RECALL.json figure); the residual loss is pairs
    separated in ALL probe cells (measured against the exact pair set
    in pytest and tools/measure_recall.py).
    Output: each pruned vector with MIN(keep) over every near-dup pair
    that names it — the lowest vec_id it duplicates, which may itself
    be pruned in a transitive chain (consumers wanting surviving
    keepers follow the chain; dd7's CC resolution is the engine's
    canonical-root form). Ids only — dd6's rule, so cross-engine ulp
    noise can't perturb the hash; threshold {SD_TAU} sits 1e-5 clear
    of any pair in the corpus.

    Plan: km1's integer-exact Lloyd state, a linear nprobe-wide
    assignment ({SD_NPROBE} rows/vector), then one numpy GEMM per cluster inside
    applyInPandas — dd6's kernel with the cluster id as the bucket
    column, the 100 TB shape (groups parallelize across executors, no
    global pair space; duplicate pairs from a shared second cell
    collapse in the MIN aggregate)."""
    assign = kmeans_probe_assignments(spark, sf_dir, SD_NPROBE)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    clustered = emb.join(assign, "vec_id")

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        m = np.vstack(pdf["e"].to_numpy()[order])
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sim = m @ m.T
        ia, ib = np.nonzero(np.triu(sim >= SD_TAU, k=1))
        return pd.DataFrame({"keep": ids[ia], "drop_": ids[ib]})

    return (
        clustered.groupBy("cluster")
        .applyInPandas(pairs, "keep long, drop_ long")
        .groupBy("drop_")
        .agg(F.min("keep").alias("keeper_id"))
        .select(F.col("drop_").alias("vec_id"), "keeper_id")
    )


X11_PLANES = 4  # 2^4 = 16 sign-LSH clusters for the eval contingency


def _x11_oracle() -> str:
    from etl_project_spark.operators.similarity import _rademacher

    bits = ", ".join(
        f"CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), "
        f"{_rademacher(p)}::DOUBLE[]) > 0 THEN '1' ELSE '0' END"
        for p in range(X11_PLANES)
    )
    return f"""
    WITH asg AS (
        SELECT CONCAT({bits}) AS cluster, label FROM embeddings
    ), ct AS (
        SELECT cluster, label, COUNT(*) AS n_cl
        FROM asg GROUP BY cluster, label
    ), mb AS (
        SELECT cluster, SUM(n_cl) AS n_c, MAX(n_cl) AS n_max
        FROM ct GROUP BY cluster
    ), ml AS (
        SELECT label, SUM(n_cl) AS n_l FROM ct GROUP BY label
    ), tot AS (
        SELECT SUM(n_cl) AS n, COUNT(DISTINCT cluster) AS kc,
               COUNT(DISTINCT label) AS kl
        FROM ct
    ), ent AS (
        SELECT
            (SELECT LN(CAST(MAX(n) AS DOUBLE))
                 - SUM(CAST(n_c AS DOUBLE) * LN(CAST(n_c AS DOUBLE)))
                   / MAX(CAST(n AS DOUBLE))
             FROM mb CROSS JOIN tot) AS h_c,
            (SELECT LN(CAST(MAX(n) AS DOUBLE))
                 - SUM(CAST(n_l AS DOUBLE) * LN(CAST(n_l AS DOUBLE)))
                   / MAX(CAST(n AS DOUBLE))
             FROM ml CROSS JOIN tot) AS h_l,
            (SELECT SUM((CAST(n_cl AS DOUBLE) / n)
                        * LN(CAST(n_cl AS DOUBLE) * n
                             / (CAST(n_c AS DOUBLE) * n_l)))
             FROM ct JOIN mb USING (cluster) JOIN ml USING (label)
             CROSS JOIN tot) AS mi,
            (SELECT CAST(SUM(n_max) AS DOUBLE) / MAX(n)
             FROM mb CROSS JOIN tot) AS purity
    )
    SELECT CAST(tot.n AS BIGINT) AS n_points,
           CAST(tot.kc AS BIGINT) AS n_clusters,
           CAST(tot.kl AS BIGINT) AS n_labels,
           ROUND(ent.purity, 6) AS purity,
           ROUND(ent.mi, 6) AS mi_nats,
           ROUND(ent.mi / sqrt(ent.h_c * ent.h_l), 6) AS nmi
    FROM tot CROSS JOIN ent
    """


@register("x11_cluster_eval", oracle=_x11_oracle())
def x11_cluster_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering EVALUATION metrics — purity and normalized mutual
    information of a cluster assignment against ground-truth labels,
    the rk5/rk6 analog for the clustering stack (how sd1/km1 cluster
    quality gets a number before anyone trusts downstream dedup or
    mixture decisions on it). The assignment evaluated here is the
    {X11_PLANES}-plane sign-LSH partition (x6's plan-time Rademacher
    hyperplanes — deterministic and engine-neutral, so the WHOLE
    metric, assignment included, hash-checks cross-engine; km1's
    centroids would evaluate identically but its memoized Lloyd state
    is engine-side only).

    Shape: one scan computes each vector's cluster (sequential-fold
    projections), ONE (cluster, label) count aggregate — the only
    corpus-wide exchange, map-side combined to the contingency-table
    size — and every metric derives from the checkpointed contingency
    relation: marginals by re-aggregation, entropies via the
    ln(n) − Σc·ln(c)/n identity (the sk3 rule — no per-row share
    window), MI from a contingency⋈marginals join that is
    O(clusters × labels), purity from per-cluster maxima. Output is
    ONE row at any corpus size. Engine parity: counts exact; ln-term
    sums round at 6dp (lm2/dq3 rule)."""
    from etl_project_spark.functions.vectors import dot
    from etl_project_spark.operators.similarity import _rademacher

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("e"), "label"
    )
    cluster = F.concat(
        *[
            F.when(
                dot(
                    F.col("e"),
                    F.array(*[F.lit(float(x)) for x in _rademacher(p)]),
                )
                > 0,
                F.lit("1"),
            ).otherwise(F.lit("0"))
            for p in range(X11_PLANES)
        ]
    )
    ct = (
        emb.select(cluster.alias("cluster"), "label")
        .groupBy("cluster", "label")
        .agg(F.count(F.lit(1)).alias("n_cl"))
        .localCheckpoint(eager=True)
    )
    mb = ct.groupBy("cluster").agg(
        F.sum("n_cl").alias("n_c"), F.max("n_cl").alias("n_max")
    )
    ml = ct.groupBy("label").agg(F.sum("n_cl").alias("n_l"))
    tot = ct.agg(
        F.sum("n_cl").alias("n"),
        F.countDistinct("cluster").alias("kc"),
        F.countDistinct("label").alias("kl"),
    )

    def entropy(marg: DataFrame, cnt: str):
        return marg.crossJoin(F.broadcast(tot)).agg(
            (
                F.log(F.max("n").cast("double"))
                - F.sum(
                    F.col(cnt).cast("double")
                    * F.log(F.col(cnt).cast("double"))
                )
                / F.max(F.col("n").cast("double"))
            ).alias("h")
        )

    h_c = entropy(mb, "n_c").select(F.col("h").alias("h_c"))
    h_l = entropy(ml, "n_l").select(F.col("h").alias("h_l"))
    mi = (
        ct.join(mb.select("cluster", "n_c"), "cluster")
        .join(F.broadcast(ml), "label")
        .crossJoin(F.broadcast(tot.select("n")))
        .agg(
            F.sum(
                (F.col("n_cl").cast("double") / F.col("n"))
                * F.log(
                    F.col("n_cl").cast("double")
                    * F.col("n")
                    / (F.col("n_c").cast("double") * F.col("n_l"))
                )
            ).alias("mi")
        )
    )
    purity = mb.crossJoin(F.broadcast(tot.select("n"))).agg(
        (F.sum("n_max").cast("double") / F.max("n")).alias("purity")
    )
    return (
        tot.crossJoin(F.broadcast(purity))
        .crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(h_c))
        .crossJoin(F.broadcast(h_l))
        .select(
            F.col("n").cast("long").alias("n_points"),
            F.col("kc").cast("long").alias("n_clusters"),
            F.col("kl").cast("long").alias("n_labels"),
            F.round(F.col("purity"), 6).alias("purity"),
            F.round(F.col("mi"), 6).alias("mi_nats"),
            F.round(
                F.col("mi") / F.sqrt(F.col("h_c") * F.col("h_l")), 6
            ).alias("nmi"),
        )
    )


@register(
    "km2_simplified_silhouette",
    oracle=_km_oracle_ctes()
    + f""", dist AS (
        SELECT e.vec_id, c.cl, {_DIST} AS d
        FROM e0 e CROSS JOIN c{KM_ITERS - 1} c
    ), ab AS (
        -- membership = the assignment that BUILT the final centroids
        -- (a{KM_ITERS - 1}); a = distance to that cluster's UPDATED
        -- centroid, which need not be the nearest one
        SELECT d.vec_id, m.cl AS cluster, d.d AS a
        FROM dist d JOIN a{KM_ITERS - 1} m
          ON d.vec_id = m.vec_id AND d.cl = m.cl
    ), bm AS (
        SELECT dist.vec_id, MIN(dist.d) AS b
        FROM dist JOIN ab USING (vec_id)
        WHERE dist.cl <> ab.cluster
        GROUP BY dist.vec_id
    ), sil AS (
        SELECT ab.cluster, ab.a, bm.b,
               CASE WHEN GREATEST(ab.a, bm.b) = 0 THEN 0.0
                    ELSE CAST(bm.b - ab.a AS DOUBLE)
                         / GREATEST(ab.a, bm.b) END AS s
        FROM ab JOIN bm USING (vec_id)
    )
    SELECT cluster,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           ROUND(AVG(s), 6) AS mean_silhouette,
           ROUND(MIN(s), 6) AS min_silhouette,
           CAST(SUM(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_misfit
    FROM sil GROUP BY cluster
    """,
)
def km2_simplified_silhouette(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SIMPLIFIED SILHOUETTE per km1 cluster — the clustering-quality
    gate a curation pipeline reads before trusting cluster-level
    decisions (sd1's dedup scope, cluster-balanced sampling). The
    membership it scores is the assignment that BUILT the final
    centroids (Lloyd iteration KM_ITERS-1): for each vector, a =
    distance to its member cluster's UPDATED (final) centroid, b =
    distance to the nearest OTHER final centroid, s = (b - a) /
    max(a, b) in [-1, 1]. Scoring the final re-assignment instead
    would make s >= 0 a tautology (own = argmin of the same distance
    row), so this is the only form in which n_misfit — members the
    final centroid update left closer to a FOREIGN centroid (s < 0)
    — carries information. The centroid-based form (Hruschka et al.)
    replaces full silhouette's O(n^2) neighbor scan with O(n * k) —
    the only version that exists at corpus scale. Per cluster:
    member count, mean and worst silhouette, n_misfit.

    Shape: one Arrow kernel pass computes every vector's membership
    (argmin vs the broadcast PENULTIMATE centroid matrix — the
    km1-trace state, memoized, no re-iteration) and its full distance
    row against the broadcast FINAL matrix, emitting (cluster, a, b)
    per vector; ONE hash aggregate reduces to KM_K rows. Engine
    parity: a and b are exact int64 sums (the km1 quantization rule),
    the membership reuses the packed dist*K + cl tie-break, and s is
    a single IEEE division of exact integers — only the per-cluster
    means need ROUND(6) (sum-order drift ~1e-14). The oracle replays
    the identical Lloyd trace via the unrolled CTEs (membership =
    a{KM_ITERS-1}, distances vs c{KM_ITERS-1}). Reference parity:
    extension scope (SURVEY §2h X3)."""
    trace = _kmeans_state_trace(spark, sf_dir)
    clusters_p, C_p = trace[-2]
    clusters_f, C_f = trace[-1]
    embq = _quantized(spark, sf_dir)
    bC = embq.sparkSession.sparkContext.broadcast(
        (clusters_p, C_p, clusters_f, C_f)
    )

    def kernel(batches):
        cls_p, cen_p, cls_f, cen_f = bC.value
        cls_p = np.array(cls_p, dtype=np.int64)
        cls_f = np.array(cls_f, dtype=np.int64)
        # member cluster id -> row in the final matrix (every cluster
        # with >=1 member in a{KM_ITERS-1} survives the update, so the
        # lookup is total)
        col_f = {int(c): i for i, c in enumerate(cls_f)}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.vstack(pdf["q"].to_numpy()).astype(np.int64)
            diff_p = M[:, None, :] - cen_p[None, :, :]
            d_p = (diff_p * diff_p).sum(axis=2)
            own_cl = cls_p[
                np.argmin(d_p * KM_K + cls_p[None, :], axis=1)
            ]
            diff_f = M[:, None, :] - cen_f[None, :, :]
            d_f = (diff_f * diff_f).sum(axis=2)
            own_ix = np.array(
                [col_f[int(c)] for c in own_cl], dtype=np.int64
            )
            rows = np.arange(len(M))
            a = d_f[rows, own_ix]
            masked = d_f.copy()
            masked[rows, own_ix] = np.iinfo(np.int64).max
            b = masked.min(axis=1)
            yield pd.DataFrame(
                {
                    "cluster": own_cl,
                    "a": a,
                    "b": b,
                }
            )

    ab = embq.mapInPandas(
        kernel, schema="cluster long, a long, b long"
    )
    s = F.when(F.greatest("a", "b") == 0, F.lit(0.0)).otherwise(
        (F.col("b") - F.col("a"))
        / F.greatest("a", "b").cast("double")
    )
    return (
        ab.select("cluster", s.alias("s"))
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.round(F.avg("s"), 6).alias("mean_silhouette"),
            F.round(F.min("s"), 6).alias("min_silhouette"),
            F.sum((F.col("s") < 0).cast("int"))
            .cast("long")
            .alias("n_misfit"),
        )
    )
