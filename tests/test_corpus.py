"""Clean-corpus end-to-end job: stage counts agree with the standalone
operators, packing respects the budget, output table is partitioned."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_project_spark.registry import all_queries


def test_clean_corpus_matches_stage_operators(spark, sf_dir):
    """Survivor count == pp3's n_survive total; every doc's text is
    PII-clean; shard token sums respect the budget (+1 straddling doc);
    the landed table partitions by shard_group."""
    from etl_project_spark.ingest.corpus import materialize_corpus

    budget = 512
    stats = materialize_corpus(
        spark, sf_dir, table="clean_corpus_test", shard_tokens=budget
    )
    funnel = (
        all_queries()["pp3_quality_funnel"](spark, sf_dir)
        .agg(F.sum("n_survive").alias("s"))
        .collect()[0]["s"]
    )
    assert stats["n_docs"] == funnel
    out = spark.table("clean_corpus_test")
    assert stats["n_docs"] == out.count()
    # PII scrub applied: no emails survive
    assert out.filter(F.col("text").rlike("@")).count() == 0
    # budget: every shard's token sum <= budget + its largest doc
    per_shard = (
        out.groupBy("shard_id")
        .agg(F.sum("n_tokens").alias("t"), F.max("n_tokens").alias("m"))
        .collect()
    )
    for r in per_shard:
        assert r["t"] <= budget + r["m"], r
    # physical layout: shard_group is a partition directory
    files = spark.table("clean_corpus_test").inputFiles()
    assert any("shard_group=" in f for f in files), files[:3]
