"""tx12 heavy hitters: the Misra-Gries kernel's superset guarantee on
adversarial streams, and the end-to-end exactness of the two-pass
sketch-then-verify plan."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_project_spark.operators.text import (
    HH_K,
    misra_gries_kernel,
    tx12_heavy_hitters,
)


@given(
    st.lists(st.integers(min_value=0, max_value=40), max_size=600),
    st.integers(min_value=2, max_value=30),
)
@settings(max_examples=200, deadline=None)
def test_misra_gries_superset_guarantee(xs, k):
    """Every item with frequency >= n/k survives the k-counter sketch
    (the MG guarantee the distributed candidate union relies on)."""
    stream = [str(x) for x in xs]
    kept = set(misra_gries_kernel(stream, k))
    n = len(stream)
    for w, c in Counter(stream).items():
        if c * k >= n and c > 0:
            assert w in kept, (w, c, n, k)


def test_heavy_hitters_exact_end_to_end(spark, sf_dir):
    """tx12's output equals the exact brute-force heavy-hitter set with
    exact counts (the sketch only prunes; the recount restores
    exactness)."""
    got = {
        (r["w"], r["cnt"])
        for r in tx12_heavy_hitters(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    counts = Counter(
        w for d in docs for w in d["text"].lower().split(" ")
    )
    n = sum(counts.values())
    expect = {
        (w, c) for w, c in counts.items() if c * HH_K >= n
    }
    assert got == expect and got, f"{len(got)} vs {len(expect)}"


def test_rrf_fusion_properties(spark, sf_dir):
    """rk4: exactly RRF_K rows per query; a doc at rank 1 in BOTH
    rankers must be fused rank 1 (RRF dominance); every fused doc came
    from at least one ranker's top-DEPTH list."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from etl_project_spark.operators.ranking import (
        RRF_K,
        RRF_QUERIES,
        rk4_reciprocal_rank_fusion,
    )
    from etl_project_spark.functions.vectors import cosine_sim
    from etl_project_spark.catalog import load_table

    out = rk4_reciprocal_rank_fusion(spark, sf_dir).collect()
    by_q: dict[int, dict[int, int]] = {}
    for r in out:
        by_q.setdefault(r["query_id"], {})[r["fused_rank"]] = r["doc_id"]
    assert set(by_q) == set(range(RRF_QUERIES))
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, RRF_K + 1))

    # recompute both rankers' rank-1 docs driver-side
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(F.split(F.lower("text"), " ")).alias("t")
    )
    ql = docs.filter(F.col("doc_id") < RRF_QUERIES).select(
        F.col("doc_id").alias("query_id"), F.col("t").alias("qt")
    )
    cl = docs.filter(F.col("doc_id") >= RRF_QUERIES)
    inter = F.size(F.array_intersect(F.col("qt"), F.col("t")))
    jac = inter.cast("double") / (F.size("qt") + F.size("t") - inter)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("s"), F.asc("doc_id")
    )
    lex1 = {
        r["query_id"]: r["doc_id"]
        for r in F.broadcast(ql)
        .crossJoin(cl)
        .select("query_id", "doc_id", jac.alias("s"))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .collect()
    }
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    qe = emb.filter(F.col("vec_id") < RRF_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    ce = emb.filter(F.col("vec_id") >= RRF_QUERIES).select(
        F.col("vec_id").alias("doc_id"), F.col("e").alias("ce")
    )
    sem1 = {
        r["query_id"]: r["doc_id"]
        for r in F.broadcast(qe)
        .crossJoin(ce)
        .select(
            "query_id", "doc_id", cosine_sim("qe", "ce").alias("s")
        )
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .collect()
    }
    for q in range(RRF_QUERIES):
        if lex1[q] == sem1[q]:
            # 2/(C+1) beats any other doc's possible max of 2/(C+2)
            assert by_q[q][1] == lex1[q], q
