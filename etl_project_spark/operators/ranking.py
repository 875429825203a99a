"""Retrieval/ranking operators over ``documents`` — the keyword-search
side of a training-data pipeline (dataset curation by relevance,
retrieval-based decontamination, quality-by-query audits): BM25 term
scoring and TF-IDF document vectors.

All JVM-side built-ins: one token explode feeding term statistics, the
corpus-level constants broadcast back as a 1-row cross join. Scores are
exact cross-engine arithmetic over integer term counts — the only
transcendental (ln in idf) is rounded to 4 decimals, far wider than the
worst-case 1-ulp divergence between the engines' log implementations,
so the oracle hash-matches bit for bit.

Reference parity: extension scope (SURVEY §2h X4 text analysis) — the
reference has no retrieval surface; semantics follow the standard
Robertson/Sparck-Jones BM25 formulation (k1=1.2, b=0.75).

Driver-window placement rotates per round via registry._FRONT_QUERIES;
the local checker covers all of these every round regardless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_project_spark.catalog import load_table
from etl_project_spark.registry import register

BM25_K1 = 1.2
BM25_B = 0.75
# plan-time literal query terms (present throughout the test corpus);
# a real run would parameterize these per query
BM25_TERMS = ("hash", "join", "window", "customer", "stream", "spark")

_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)


@register(
    "rk1_bm25_score",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, toks, LEN(toks) AS dl
        FROM (SELECT doc_id, str_split(lower(text), ' ') AS toks
              FROM documents)
    ), stats AS (
        SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM d
    ), tf AS (
        SELECT term, doc_id, dl, COUNT(*) AS tf
        FROM d, UNNEST(toks) AS u(term)
        WHERE term IN ({_TERMS_SQL})
        GROUP BY term, doc_id, dl
    ), df AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    )
    SELECT tf.term, tf.doc_id, tf.tf, df.df,
           ROUND(
               LN((n_docs - df + 0.5) / (df + 0.5) + 1.0)
               * ((tf * {BM25_K1 + 1.0})
                  / (tf + {BM25_K1}
                     * ({1.0 - BM25_B} + {BM25_B}
                        * (dl / (sum_dl / n_docs))))),
               4) AS score
    FROM tf JOIN df USING (term) CROSS JOIN stats
    """,
)
def rk1_bm25_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document against a fixed query-term set:
    (term, doc_id, tf, df, score) for each document containing the
    term. The standard keyword-retrieval scorer (k1={BM25_K1},
    b={BM25_B}), used in corpus curation to pull topic-relevant slices
    and in decontamination to rank suspect documents.

    Shape: one token explode filtered to the query terms (the filter
    kills ~all rows before the shuffle), one (term, doc_id) hash
    aggregation for tf, a tiny per-term df aggregate and a 1-row corpus
    stats aggregate both broadcast back — the corpus is scanned once,
    document length comes from size(toks) BELOW the explode (computed
    per document, not per exploded row — the tx10 trap). At 100 TB the
    term filter is the whole point: the shuffle carries only matching
    (term, doc) rows, df/avgdl stay O(|terms|)/O(1), and the same plan
    serves an inverted-index build by dropping the term filter."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower("text"), " ").alias("toks")
    )
    d = docs.select("doc_id", "toks", F.size("toks").alias("dl"))
    stats = d.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        d.select("doc_id", "dl", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(*BM25_TERMS))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    avgdl = F.col("sum_dl") / F.col("n_docs")
    denom = F.col("tf") + F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B) + F.lit(BM25_B) * (F.col("dl") / avgdl)
    )
    score = idf * ((F.col("tf") * F.lit(BM25_K1 + 1.0)) / denom)
    return (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            "doc_id",
            "tf",
            "df",
            F.round(score, 4).alias("score"),
        )
    )


EVAL_REL_TF = 2  # pseudo-qrel: a doc is relevant to a term iff tf >= 2
EVAL_K = 10  # recall cutoff


@register(
    "rk5_retrieval_eval",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, toks, LEN(toks) AS dl
        FROM (SELECT doc_id, str_split(lower(text), ' ') AS toks
              FROM documents)
    ), stats AS (
        SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM d
    ), tf AS (
        SELECT term, doc_id, dl, COUNT(*) AS tf
        FROM d, UNNEST(toks) AS u(term)
        WHERE term IN ({_TERMS_SQL})
        GROUP BY term, doc_id, dl
    ), df AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), scored AS (
        SELECT tf.term, tf.doc_id, tf.tf,
               ROUND(
                   LN((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                   * ((tf * {BM25_K1 + 1.0})
                      / (tf + {BM25_K1}
                         * ({1.0 - BM25_B} + {BM25_B}
                            * (dl / (sum_dl / n_docs))))),
                   4) AS s
        FROM tf JOIN df USING (term) CROSS JOIN stats
    ), ranked AS (
        SELECT term, doc_id, s,
               ROW_NUMBER() OVER (PARTITION BY term
                                  ORDER BY s DESC, doc_id) AS rnk,
               CASE WHEN tf >= {EVAL_REL_TF} THEN 1 ELSE 0 END AS rel
        FROM scored
    ), c AS (
        SELECT term, rnk, rel,
               SUM(rel) OVER (PARTITION BY term ORDER BY rnk
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cumrel
        FROM ranked
    )
    SELECT term,
           CAST(SUM(rel) AS BIGINT) AS n_rel,
           ROUND(1.0 / MIN(CASE WHEN rel = 1 THEN rnk END), 6) AS rr,
           ROUND(CAST(SUM(CASE WHEN rel = 1 AND rnk <= {EVAL_K}
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / SUM(rel), 6) AS recall_at_k,
           ROUND(SUM(CASE WHEN rel = 1
                          THEN CAST(cumrel AS DOUBLE) / rnk END)
                 / SUM(rel), 6) AS avg_precision
    FROM c GROUP BY term HAVING SUM(rel) > 0
    """,
)
def rk5_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IR evaluation of the rk1 BM25 ranking — per query term:
    reciprocal rank of the first relevant doc, recall@{EVAL_K}, and
    average precision, against a deterministic pseudo-qrel (relevant
    iff tf >= {EVAL_REL_TF}; real qrels are a labels table joined the
    same way). The metrics job every retrieval-curation pipeline runs
    to regression-test its ranker — rank math identical cross-engine
    because ranking orders by the ROUND(score, 4) rk1 publishes (ties
    broken by doc_id).

    Shape: rk1's relation (term-filtered explode — the shuffle carries
    only matching rows), one per-term window over the matching docs
    (bounded by docs-matching-a-term, never the corpus), one per-term
    aggregate. At 100 TB with big query sets the window becomes the
    per-query top-k heap merge (t2's shape) — per-term state stays
    k-bounded."""
    r = rk1_bm25_score(spark, sf_dir).select(
        "term", "doc_id", "tf", F.round("score", 4).alias("s")
    )
    w = Window.partitionBy("term").orderBy(F.desc("s"), F.asc("doc_id"))
    ranked = (
        r.withColumn("rnk", F.row_number().over(w))
        .withColumn(
            "rel", (F.col("tf") >= EVAL_REL_TF).cast("int")
        )
        .withColumn(
            "cumrel",
            F.sum("rel").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return (
        ranked.groupBy("term")
        .agg(
            F.sum("rel").alias("n_rel"),
            F.min(F.when(F.col("rel") == 1, F.col("rnk"))).alias("_fr"),
            F.sum(
                F.when(
                    (F.col("rel") == 1) & (F.col("rnk") <= EVAL_K), 1
                ).otherwise(0)
            ).alias("_r_at_k"),
            F.sum(
                F.when(
                    F.col("rel") == 1,
                    F.col("cumrel").cast("double") / F.col("rnk"),
                )
            ).alias("_ap_num"),
        )
        .filter(F.col("n_rel") > 0)
        .select(
            "term",
            F.col("n_rel").cast("long").alias("n_rel"),
            F.round(F.lit(1.0) / F.col("_fr"), 6).alias("rr"),
            F.round(
                F.col("_r_at_k").cast("double") / F.col("n_rel"), 6
            ).alias("recall_at_k"),
            F.round(F.col("_ap_num") / F.col("n_rel"), 6).alias(
                "avg_precision"
            ),
        )
    )


@register(
    "rk2_tfidf_postings",
    oracle="""
    WITH d AS (
        SELECT doc_id, str_split(lower(text), ' ') AS toks FROM documents
    ), stats AS (
        SELECT COUNT(*) AS n_docs FROM d
    ), tf AS (
        SELECT term, doc_id, COUNT(*) AS tf
        FROM d, UNNEST(toks) AS u(term)
        GROUP BY term, doc_id
    ), df AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    )
    SELECT tf.term, tf.doc_id, tf.tf, df.df,
           ROUND(tf * LN(n_docs / df), 4) AS tfidf
    FROM tf JOIN df USING (term) CROSS JOIN stats
    """,
)
def rk2_tfidf_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full inverted index with TF-IDF weights: one posting row per
    (term, document) pair across the whole vocabulary — what a sparse
    retrieval system materializes once and serves lookups from. tfidf =
    tf * ln(N/df), rounded 4 (see module docstring on ln parity).

    Shape: the same single explode + (term, doc_id) aggregation as BM25
    but unfiltered — posting count is the corpus token-type total, the
    natural output size of an index build. df is vocabulary-sized
    (bounded, broadcast); at 100 TB the postings would land partitioned
    by term-hash range so a term lookup prunes to one partition."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower("text"), " ").alias("toks")
    )
    tf = (
        docs.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = docs.agg(F.count("*").alias("n_docs"))
    tfidf = F.col("tf") * F.log(F.col("n_docs") / F.col("df"))
    return (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "term", "doc_id", "tf", "df", F.round(tfidf, 4).alias("tfidf")
        )
    )


@register(
    "lm1_bigram_model",
    oracle="""
    WITH d AS (
        SELECT doc_id, str_split(lower(text), ' ') AS t FROM documents
    ), p AS (
        -- lateral index unnest: i = 1..len-1, pair = (t[i], t[i+1])
        SELECT t[i] AS w1, t[i + 1] AS w2
        FROM d, UNNEST(range(1, len(t))) AS u(i)
    ), bg AS (
        SELECT w1, w2, COUNT(*) AS bigram_count
        FROM p GROUP BY w1, w2
    ), un AS (
        -- CAST: SUM(int) -> HUGEINT in DuckDB -> pandas float64; Spark int64
        SELECT w1, CAST(SUM(bigram_count) AS BIGINT) AS w1_count
        FROM bg GROUP BY w1
    )
    SELECT bg.w1, bg.w2, bg.bigram_count, un.w1_count,
           ROUND(bigram_count / w1_count, 4) AS cond_prob
    FROM bg JOIN un USING (w1)
    """,
)
def lm1_bigram_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide bigram language-model statistics: every adjacent
    token pair with its count, the left-token continuation total, and
    the maximum-likelihood conditional probability P(w2|w1) — the
    KenLM-style counting pass behind n-gram LMs, perplexity-based
    quality filters, and contamination n-gram scans.

    Shape: bigrams are formed ARRAY-SIDE (``arrays_zip`` of the token
    array against itself shifted by one) before a single explode — no
    per-document window, no join on token position, so documents never
    need co-located token rows and the corpus is scanned exactly once.
    The denominator is a window sum over the already-aggregated
    (vocabulary-sized) bigram rows — cheaper than a join formulation,
    which would re-scan and re-explode the corpus for the second
    aggregate. At 100 TB this is the canonical map-side-combine
    job: partial counts collapse each partition's millions of token
    pairs to its distinct-bigram set before the exchange; extending to
    n-grams is the same zip with n-1 shifts. The oracle forms the same
    pairs by lateral position unnest — same semantics, expressed
    relationally."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.split(F.lower("text"), " ").alias("t")
    )
    # slice(t,1,n-1) zip slice(t,2,n-1): [(t1,t2),(t2,t3),...] per doc
    pairs = docs.select(
        F.explode(
            F.arrays_zip(
                F.expr("slice(t, 1, size(t) - 1)").alias("w1"),
                F.expr("slice(t, 2, size(t) - 1)").alias("w2"),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    bg = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("bigram_count"))
    # denominator as a window sum over the ALREADY-AGGREGATED bigram
    # rows (vocabulary-sized), not a second aggregate branch — a join
    # formulation re-scans and re-explodes the whole corpus (Catalyst
    # does not reuse the bigram exchange across the self-join)
    w1_count = F.sum("bigram_count").over(Window.partitionBy("w1"))
    return bg.select(
        "w1",
        "w2",
        "bigram_count",
        w1_count.alias("w1_count"),
        F.round(F.col("bigram_count") / w1_count, 4).alias("cond_prob"),
    )


CHUNK_SIZE = 200  # characters per retrieval chunk
CHUNK_STRIDE = 150  # 50-char overlap between neighbors


@register(
    "rk3_doc_chunking",
    oracle=f"""
    SELECT doc_id,
           (start - 1) // {CHUNK_STRIDE} AS chunk_id,
           substr(text, CAST(start AS INT), {CHUNK_SIZE}) AS chunk_text
    FROM documents,
         UNNEST(range(1, GREATEST(LEN(text), 1) + 1, {CHUNK_STRIDE}))
             AS u(start)
    """,
)
def rk3_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking for retrieval indexing: split
    every document into {CHUNK_SIZE}-char chunks at {CHUNK_STRIDE}-char
    stride (50-char overlap so no boundary-spanning passage is lost) —
    the chunk table a RAG pipeline embeds (x-family) and indexes
    (rk1/rk2) instead of whole documents.

    Shape: chunk starts come from ``sequence(1, len, stride)`` exploded
    positionally, then one substring projection — scan-local, no
    shuffle, no UDF; chunk_id is the explode position, so ordering is
    positional, not re-derived. The full text is never duplicated
    downstream: the substring projection runs in the same stage as the
    explode, so shuffle/output rows carry only the chunk. At 100 TB
    this writes chunk-partitioned parquet feeding the embedding UDF
    batch job."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            "text",
            F.posexplode(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.length("text"), F.lit(1)),
                    F.lit(CHUNK_STRIDE),
                )
            ).alias("chunk_id", "start"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.expr(f"substring(text, start, {CHUNK_SIZE})").alias(
                "chunk_text"
            ),
        )
    )


@register(
    "lm2_perplexity_score",
    oracle="""
    WITH d AS (
        SELECT doc_id, str_split(lower(text), ' ') AS t FROM documents
    ), p AS (
        SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
        FROM d, UNNEST(range(1, len(t))) AS u(i)
    ), bg AS (
        SELECT w1, w2, COUNT(*) AS c FROM p GROUP BY w1, w2
    ), un AS (
        SELECT w1, SUM(c) AS wc FROM bg GROUP BY w1
    ), m AS (
        SELECT w1, w2, CAST(c AS DOUBLE) / wc AS cp
        FROM bg JOIN un USING (w1)
    )
    SELECT p.doc_id, COUNT(*) AS n_bigrams,
           ROUND(AVG(LN(cp)), 6) AS avg_logp,
           ROUND(EXP(-AVG(LN(cp))), 6) AS perplexity
    FROM p JOIN m USING (w1, w2)
    GROUP BY p.doc_id
    """,
)
def lm2_perplexity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram perplexity under the corpus's own LM (the
    lm1 model applied back to its training corpus) — the classic
    pretraining quality signal: boilerplate and templated text scores
    low-perplexity, noise scores high, and a CCNet-style filter keeps
    the middle. Self-scoring means every bigram is in-vocabulary;
    held-out scoring adds smoothing to the same plan.

    Shape: bigrams form array-side (lm1's zip trick) and explode once
    with doc_id retained, then the exploded relation is MATERIALIZED
    (eager localCheckpoint) — it feeds both the model aggregate and the
    scoring join, and the explode subtree's higher-order-function
    lambdas carry lambda-variable ExprIds that plan canonicalization
    cannot normalize, so ReuseExchange would otherwise re-scan and
    re-explode the corpus for each consumer (the dd8 lesson, SURVEY
    §12.1; measured 2.1x before the checkpoint). The model aggregates
    the checkpointed pairs to vocabulary size (map-side partial agg
    collapses heavy words before the shuffle) and BROADCASTS back onto
    them — the scoring join moves zero corpus rows; one doc-level
    aggregate ends the plan. At 100 TB: the checkpoint becomes a
    persisted parquet temp table, and a bigram model too big to
    broadcast degrades to a shuffle hash join on (w1, w2). Engine
    parity: cond-prob is an exact integer ratio; LN/AVG/EXP round(6)
    absorbs libm-ulp and sum-order drift (~1e-13 relative, far below
    the 1e-6 grid)."""
    return _doc_perplexity(spark, sf_dir)


def _doc_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lm2's core: (doc_id, n_bigrams, avg_logp, perplexity) — shared
    by lm2 (published directly) and lm3 (bucketed per language)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower("text"), " ").alias("t")
    )
    pairs = (
        docs.select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.expr("slice(t, 1, size(t) - 1)").alias("w1"),
                    F.expr("slice(t, 2, size(t) - 1)").alias("w2"),
                )
            ).alias("p"),
        )
        .select(
            "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
        )
        .localCheckpoint()
    )
    bg = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    wc = F.sum("c").over(Window.partitionBy("w1"))
    model = bg.select(
        "w1", "w2", (F.col("c").cast("double") / wc).alias("cp")
    )
    return (
        pairs.join(F.broadcast(model), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(F.log("cp")), 6).alias("avg_logp"),
            F.round(F.exp(-F.avg(F.log("cp"))), 6).alias("perplexity"),
        )
    )


# lm2's bigram-perplexity CTE chain, shared verbatim by lm3's oracle so
# both engines score documents identically before bucketing.
_PPL_SQL = """
        SELECT doc_id, perplexity FROM (
            WITH d AS (
                SELECT doc_id, str_split(lower(text), ' ') AS t FROM documents
            ), p AS (
                SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
                FROM d, UNNEST(range(1, len(t))) AS u(i)
            ), bg AS (
                SELECT w1, w2, COUNT(*) AS c FROM p GROUP BY w1, w2
            ), un AS (
                SELECT w1, SUM(c) AS wc FROM bg GROUP BY w1
            ), m AS (
                SELECT w1, w2, CAST(c AS DOUBLE) / wc AS cp
                FROM bg JOIN un USING (w1)
            )
            SELECT p.doc_id, ROUND(EXP(-AVG(LN(cp))), 6) AS perplexity
            FROM p JOIN m USING (w1, w2)
            GROUP BY p.doc_id
        )
"""


@register(
    "lm3_perplexity_buckets",
    oracle=f"""
    WITH ppl AS (
        SELECT doc_id, lang, perplexity
        FROM ({_PPL_SQL}) JOIN documents USING (doc_id)
    ), cut AS (
        SELECT lang,
               ROUND(quantile_cont(perplexity, 1.0 / 3), 6) AS p33,
               ROUND(quantile_cont(perplexity, 2.0 / 3), 6) AS p66
        FROM ppl GROUP BY lang
    )
    SELECT doc_id, lang, perplexity,
           CASE WHEN perplexity <= p33 THEN 'head'
                WHEN perplexity <= p66 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM ppl JOIN cut USING (lang)
    """,
)
def lm3_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): every
    document labeled head / middle / tail within its LANGUAGE by
    corpus-LM perplexity terciles — the standard pretraining quality
    split (head = fluent/boilerplate-like, tail = noise; CCNet trains
    on head+middle). Scores come from lm2's bigram LM (shared
    `_doc_perplexity`, identical 6dp rounding both engines).

    Plan shape: NOT a per-language NTILE window — at 100 TB one
    language is most of the corpus, so a rank window over
    partitionBy(lang) is a single-reducer scale-killer. Instead the
    per-language tercile CUTOFFS are computed as one exact interpolated
    percentile aggregate (O(#langs) rows out; Spark `percentile` ==
    DuckDB `quantile_cont`, the dq4 precedent, rounded 6dp so the
    boundary compare is grid-exact cross-engine) and broadcast back
    onto the doc-level relation — bucketing becomes a codegen CASE, no
    second shuffle of corpus rows. The doc-level perplexity relation
    feeds both the cutoff aggregate and the final join, so it is
    localCheckpointed (the lm2/dd8 reuse lesson; at 100 TB a persisted
    temp table). Exact percentiles keep the oracle hashable; a real
    100 TB run would swap approx_percentile in at the same plan shape.
    Reference parity: extension scope (SURVEY §2h, quality scoring)."""
    ppl = (
        _doc_perplexity(spark, sf_dir)
        .select("doc_id", "perplexity")
        .join(
            load_table(spark, sf_dir, "documents").select("doc_id", "lang"),
            "doc_id",
        )
        .localCheckpoint()
    )
    cut = ppl.groupBy("lang").agg(
        F.round(F.expr("percentile(perplexity, 1.0D / 3)"), 6).alias("p33"),
        F.round(F.expr("percentile(perplexity, 2.0D / 3)"), 6).alias("p66"),
    )
    return (
        ppl.join(F.broadcast(cut), "lang")
        .select(
            "doc_id",
            "lang",
            "perplexity",
            F.when(F.col("perplexity") <= F.col("p33"), "head")
            .when(F.col("perplexity") <= F.col("p66"), "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
    )


RRF_QUERIES = 10  # doc_id < 10 are the query docs (x1's convention)
RRF_DEPTH = 20  # per-ranker candidate depth feeding the fusion
RRF_C = 60  # the standard RRF dampening constant
RRF_K = 5  # fused results returned per query

_RRF_SEM_RANK = f"""
        SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_dot_product(q.e, c.e)
                            / (sqrt(list_dot_product(q.e, q.e))
                               * sqrt(list_dot_product(c.e, c.e))) DESC,
                            c.vec_id
               ) AS r
        FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
              FROM embeddings WHERE vec_id < {RRF_QUERIES}) q
        CROSS JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                    FROM embeddings WHERE vec_id >= {RRF_QUERIES}) c
"""


@register(
    "rk4_reciprocal_rank_fusion",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, list_distinct(str_split(lower(text), ' ')) AS t
        FROM documents
    ), lex AS (
        SELECT query_id, doc_id, r FROM (
            SELECT q.doc_id AS query_id, c.doc_id AS doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.doc_id
                       ORDER BY CAST(LEN(list_intersect(q.t, c.t)) AS DOUBLE)
                                / (LEN(q.t) + LEN(c.t)
                                   - LEN(list_intersect(q.t, c.t))) DESC,
                                c.doc_id
                   ) AS r
            FROM toks q CROSS JOIN toks c
            WHERE q.doc_id < {RRF_QUERIES} AND c.doc_id >= {RRF_QUERIES}
        ) WHERE r <= {RRF_DEPTH}
    ), sem AS (
        SELECT query_id, doc_id, r FROM ({_RRF_SEM_RANK})
        WHERE r <= {RRF_DEPTH}
    ), fused AS (
        SELECT COALESCE(l.query_id, s.query_id) AS query_id,
               COALESCE(l.doc_id, s.doc_id) AS doc_id,
               COALESCE(1.0 / ({RRF_C} + l.r), 0)
                   + COALESCE(1.0 / ({RRF_C} + s.r), 0) AS score
        FROM lex l FULL OUTER JOIN sem s
          ON l.query_id = s.query_id AND l.doc_id = s.doc_id
    )
    SELECT query_id, doc_id, fused_rank FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY score DESC, doc_id
               ) AS fused_rank
        FROM fused
    ) WHERE fused_rank <= {RRF_K}
    """,
)
def rk4_reciprocal_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal rank fusion (Cormack et al.
    2009): a lexical ranker (distinct-token-set Jaccard, the sparse/
    keyword side) and a semantic ranker (exact cosine over the aligned
    embedding, x1's rule) each contribute 1/({RRF_C}+rank) for their
    top-{RRF_DEPTH}; fused score sorts the final top-{RRF_K} per query.
    RRF is the standard way production search fuses BM25-family and
    vector retrieval without score calibration — only RANKS cross the
    ranker boundary, so the two sides' incomparable score scales never
    meet.

    Engine parity: each fused score is two exact divisions and one add
    over identical operands, so ordering (and the deterministic doc_id
    tie-break) agrees bit-for-bit; ids + rank are the only outputs
    (x1's hash rule). Scale: both rankers broadcast the bounded query
    set and scan the corpus once — linear per query, never corpus x
    corpus; at depth {RRF_DEPTH} the fusion join touches <= 2 x
    {RRF_DEPTH} x |queries| rows. Production swaps the lexical side
    for rk1's BM25 postings and the semantic side for the x4/IVF
    probe — the fusion stage is unchanged."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_distinct(F.split(F.lower("text"), " ")).alias("t"),
    )
    ql = docs.filter(F.col("doc_id") < RRF_QUERIES).select(
        F.col("doc_id").alias("query_id"), F.col("t").alias("qt")
    )
    cl = docs.filter(F.col("doc_id") >= RRF_QUERIES)
    inter = F.size(F.array_intersect(F.col("qt"), F.col("t")))
    jac = inter.cast("double") / (
        F.size("qt") + F.size("t") - inter
    )
    wq = Window.partitionBy("query_id")
    lex = (
        F.broadcast(ql)
        .crossJoin(cl)
        .select("query_id", "doc_id", jac.alias("s"))
        .withColumn(
            "r",
            F.row_number().over(wq.orderBy(F.desc("s"), F.asc("doc_id"))),
        )
        .filter(F.col("r") <= RRF_DEPTH)
        .select("query_id", "doc_id", "r")
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    # r12: the semantic ranker scores through x1's `_query_cosine_scores`
    # Arrow kernel (each candidate crosses the Python boundary once and
    # is scored against the bounded query set; bit-identical to the
    # crossJoin + sequential cosine fold it replaces — see the kernel's
    # docstring and tests)
    from etl_project_spark.operators.similarity import _query_cosine_scores

    sem = (
        _query_cosine_scores(
            emb.filter(F.col("vec_id") >= RRF_QUERIES),
            emb.filter(F.col("vec_id") < RRF_QUERIES),
        )
        .select(
            "query_id",
            F.col("neighbor_id").alias("doc_id"),
            F.col("sim").alias("s"),
        )
        .withColumn(
            "r",
            F.row_number().over(wq.orderBy(F.desc("s"), F.asc("doc_id"))),
        )
        .filter(F.col("r") <= RRF_DEPTH)
        .select("query_id", "doc_id", "r")
    )
    contrib = lambda r: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(RRF_C) + r), F.lit(0.0)
    )
    fused = (
        lex.withColumnRenamed("r", "rl")
        .join(
            sem.withColumnRenamed("r", "rs"),
            ["query_id", "doc_id"],
            "full_outer",
        )
        .select(
            "query_id",
            "doc_id",
            (contrib(F.col("rl")) + contrib(F.col("rs"))).alias("score"),
        )
    )
    return (
        fused.withColumn(
            "fused_rank",
            F.row_number().over(
                wq.orderBy(F.desc("score"), F.asc("doc_id"))
            ),
        )
        .filter(F.col("fused_rank") <= RRF_K)
        .select("query_id", "doc_id", "fused_rank")
    )


NDCG_GRADE_CAP = 4  # graded relevance = min(tf, 4): caps 2^grade gain


@register(
    "rk6_ndcg",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, toks, LEN(toks) AS dl
        FROM (SELECT doc_id, str_split(lower(text), ' ') AS toks
              FROM documents)
    ), stats AS (
        SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM d
    ), tf AS (
        SELECT term, doc_id, dl, COUNT(*) AS tf
        FROM d, UNNEST(toks) AS u(term)
        WHERE term IN ({{_TERMS_SQL}})
        GROUP BY term, doc_id, dl
    ), df AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), scored AS (
        SELECT tf.term, tf.doc_id,
               LEAST(tf.tf, {NDCG_GRADE_CAP}) AS grade,
               ROUND(
                   LN((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                   * ((tf * {{BM25_K1_P1}})
                      / (tf + {{BM25_K1_L}}
                         * ({{BM25_B_C}} + {{BM25_B_L}}
                            * (dl / (sum_dl / n_docs))))),
                   4) AS s
        FROM tf JOIN df USING (term) CROSS JOIN stats
    ), ranked AS (
        SELECT term, grade,
               ROW_NUMBER() OVER (PARTITION BY term
                                  ORDER BY s DESC, doc_id) AS rnk,
               ROW_NUMBER() OVER (PARTITION BY term
                                  ORDER BY grade DESC, doc_id) AS irnk
        FROM scored
    )
    SELECT term,
           ROUND(SUM(CASE WHEN rnk <= {{EVAL_K}}
                          THEN (POWER(2, grade) - 1) / LOG2(rnk + 1)
                          ELSE 0 END), 6) AS dcg_at_k,
           ROUND(SUM(CASE WHEN irnk <= {{EVAL_K}}
                          THEN (POWER(2, grade) - 1) / LOG2(irnk + 1)
                          ELSE 0 END), 6) AS idcg_at_k,
           ROUND(SUM(CASE WHEN rnk <= {{EVAL_K}}
                          THEN (POWER(2, grade) - 1) / LOG2(rnk + 1)
                          ELSE 0 END)
                 / SUM(CASE WHEN irnk <= {{EVAL_K}}
                            THEN (POWER(2, grade) - 1) / LOG2(irnk + 1)
                            ELSE 0 END), 6) AS ndcg_at_k
    FROM ranked GROUP BY term
    """.format(
        _TERMS_SQL=_TERMS_SQL,
        BM25_K1_P1=BM25_K1 + 1.0,
        BM25_K1_L=BM25_K1,
        BM25_B_C=1.0 - BM25_B,
        BM25_B_L=BM25_B,
        EVAL_K=EVAL_K,
    ),
)
def rk6_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@{EVAL_K} of the rk1 BM25 ranking — the graded-relevance
    complement to rk5's binary MRR/recall/AP: gain = min(tf,
    {NDCG_GRADE_CAP}) (a labels table in production), DCG over the
    score ranking, IDCG over the grade-ideal ranking, both truncated
    at {EVAL_K}. Completes the standard retrieval-eval metric set.

    Shape: rk1's term-filtered relation, TWO per-term rank windows
    (actual and ideal order — same bounded partition, docs matching a
    term, computed in one shuffle since both windows share the
    partition key), one per-term aggregate. DCG sums ≤{EVAL_K} terms
    of (2^g − 1)/log2(r+1); round(6) absorbs the ≤1-ulp add-order
    drift (rk5's avg_precision precedent). At 100 TB both windows
    become per-query top-k heap merges (t2's shape)."""
    r = rk1_bm25_score(spark, sf_dir).select(
        "term",
        "doc_id",
        F.least(F.col("tf"), F.lit(NDCG_GRADE_CAP)).alias("grade"),
        F.round("score", 4).alias("s"),
    )
    w_actual = Window.partitionBy("term").orderBy(
        F.desc("s"), F.asc("doc_id")
    )
    w_ideal = Window.partitionBy("term").orderBy(
        F.desc("grade"), F.asc("doc_id")
    )
    gain = F.pow(F.lit(2.0), F.col("grade")) - 1
    ranked = r.select(
        "term",
        "grade",
        F.row_number().over(w_actual).alias("rnk"),
        F.row_number().over(w_ideal).alias("irnk"),
    )
    dcg = F.sum(
        F.when(F.col("rnk") <= EVAL_K, gain / F.log2(F.col("rnk") + 1))
        .otherwise(0.0)
    )
    idcg = F.sum(
        F.when(F.col("irnk") <= EVAL_K, gain / F.log2(F.col("irnk") + 1))
        .otherwise(0.0)
    )
    return ranked.groupBy("term").agg(
        F.round(dcg, 6).alias("dcg_at_k"),
        F.round(idcg, 6).alias("idcg_at_k"),
        F.round(dcg / idcg, 6).alias("ndcg_at_k"),
    )


KN_DISCOUNT = 0.75  # absolute discount D (Chen & Goodman's fixed-D KN)


@register(
    "lm4_kneser_ney",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, str_split(lower(text), ' ') AS t FROM documents
    ), p AS (
        SELECT t[i] AS w1, t[i + 1] AS w2
        FROM d, UNNEST(range(1, len(t))) AS u(i)
    ), bg AS (
        SELECT w1, w2, COUNT(*) AS c FROM p GROUP BY w1, w2
    ), s AS (
        SELECT w1, w2, c,
               CAST(SUM(c) OVER (PARTITION BY w1) AS BIGINT) AS c1,
               COUNT(*) OVER (PARTITION BY w1) AS n1f,
               COUNT(*) OVER (PARTITION BY w2) AS n1b,
               COUNT(*) OVER () AS ty
        FROM bg
    )
    SELECT w1, w2, CAST(c AS BIGINT) AS bigram_count,
           ROUND(CAST(n1b AS DOUBLE) / ty, 6) AS p_cont,
           ROUND((c - {KN_DISCOUNT}) / c1
                 + ({KN_DISCOUNT} * n1f / c1)
                   * (CAST(n1b AS DOUBLE) / ty), 6) AS p_kn
    FROM s
    """,
)
def lm4_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (fixed absolute
    discount D={KN_DISCOUNT}) — the smoothing KenLM actually ships and
    the lm1 MLE model's production-grade sibling: P_KN(w2|w1) =
    max(c-D,0)/c(w1.) + D.N1+(w1.)/c(w1.) . P_cont(w2), with the
    continuation probability P_cont(w2) = N1+(.w2) / |bigram types|
    (how many contexts a word FOLLOWS, not how often — the "Francisco
    problem" fix). Emitted per observed bigram type; unseen-bigram
    backoff applies the same lambda to P_cont alone, same relation.

    Reference parity: extension X4 scope (SURVEY §2h); public Chen &
    Goodman 1999 formulation.

    Shape: ONE corpus scan and ONE corpus-mass shuffle (the bigram
    count aggregate, map-side-combined); everything after operates on
    the vocabulary-sized bigram-type relation — two hash-partitioned
    windows (by w1: left total + follow-set size; by w2: precede-set
    size) and one broadcast scalar for the type count (computed from
    the materialized relation, not a corpus re-scan; single-partition
    global windows never touch corpus-sized data). At 100 TB the type
    relation is billions of rows but each window partition is one
    word's continuation set — bounded by vocabulary interactions, and
    both windows shuffle the same narrow (w1, w2, c) rows."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.split(F.lower("text"), " ").alias("t")
    )
    pairs = docs.select(
        F.explode(
            F.arrays_zip(
                F.expr("slice(t, 1, size(t) - 1)").alias("w1"),
                F.expr("slice(t, 2, size(t) - 1)").alias("w2"),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    bg = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()  # two window consumers + the type-count scalar
    )
    w1w = Window.partitionBy("w1")
    w2w = Window.partitionBy("w2")
    ty = bg.agg(F.count(F.lit(1)).alias("ty"))
    enriched = bg.select(
        "w1",
        "w2",
        "c",
        F.sum("c").over(w1w).alias("c1"),
        F.count(F.lit(1)).over(w1w).alias("n1f"),
        F.count(F.lit(1)).over(w2w).alias("n1b"),
    ).crossJoin(F.broadcast(ty))
    p_cont = F.col("n1b").cast("double") / F.col("ty")
    return enriched.select(
        "w1",
        "w2",
        F.col("c").alias("bigram_count"),
        F.round(p_cont, 6).alias("p_cont"),
        F.round(
            (F.col("c") - KN_DISCOUNT) / F.col("c1")
            + (KN_DISCOUNT * F.col("n1f") / F.col("c1")) * p_cont,
            6,
        ).alias("p_kn"),
    )


# --- persisted inverted index: the serving-side scale path -------------------

TEXT_IDX_BUCKETS = 16


def _term_bucket_py(term: str, n_buckets: int = TEXT_IDX_BUCKETS) -> int:
    """Driver-side twin of the engine's md5 term bucket (smp4's
    hex-fold rule): both sides must agree so the querier can turn query
    terms into a static partition filter."""
    import hashlib

    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % n_buckets


def _term_bucket_col(col, n_buckets: int = TEXT_IDX_BUCKETS):
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    ).cast("int")


def build_text_index(
    spark: SparkSession,
    sf_dir: str,
    n_buckets: int = TEXT_IDX_BUCKETS,
    table: str = "text_postings_index",
) -> None:
    """Materialize the inverted index as a managed parquet table
    PARTITIONED BY md5 term bucket — the text twin of build_ivf_index:
    the partition layout IS the index, and a query's terms become a
    static bucket partition filter so serving reads only the touched
    directories (|query terms| / n_buckets of the bytes, pinned in
    tests/test_layout.py). Every term's postings live wholly inside
    ONE bucket, so per-term df is computable bucket-locally at query
    time and incremental corpus appends never rewrite other buckets.
    Corpus-level BM25 stats (n_docs, sum_dl) land in a 1-row side
    table ``<table>_stats``. Build is rk2's single explode +
    (term, doc) count — one corpus-wide exchange — plus the
    partitioned write; rebuilds are idempotent (overwrite).

    Reference parity: the reference has no text surface at all; this
    is the extension-mandate retrieval scale path made durable,
    complementing the in-session rk1/rk2 (SURVEY §2h)."""
    from etl_project_spark.sources.tables import _drop_table_and_location

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower("text"), " ").alias("toks")
    )
    d = docs.select("doc_id", "toks", F.size("toks").alias("dl"))
    postings = (
        d.select("doc_id", "dl", F.explode("toks").alias("term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select(
            "term",
            "doc_id",
            "tf",
            "dl",
            _term_bucket_col(F.col("term"), n_buckets).alias("tbucket"),
        )
    )
    _drop_table_and_location(spark, table)
    _drop_table_and_location(spark, f"{table}_stats")
    (
        postings.repartition("tbucket")
        .write.partitionBy("tbucket")
        .format("parquet")
        .saveAsTable(table)
    )
    d.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    ).write.format("parquet").saveAsTable(f"{table}_stats")


def query_text_index(
    spark: SparkSession,
    terms: list[str],
    k: int = 10,
    n_buckets: int = TEXT_IDX_BUCKETS,
    table: str = "text_postings_index",
) -> DataFrame:
    """Serve BM25 top-k from the persisted index: query terms →
    driver-side md5 buckets → static ``tbucket IN (...)`` partition
    filter (the scan reads ONLY those bucket directories) → term
    filter → bucket-local df → per-(term, doc) BM25 — ROUND(.,4)
    per posting, rk1's published contract — summed per doc, global
    top-k as TakeOrderedAndProject (score desc, doc_id asc
    tie-break). The 1-row stats table broadcasts."""
    buckets = sorted({_term_bucket_py(t, n_buckets) for t in terms})
    idx = (
        spark.table(table)
        .filter(F.col("tbucket").isin(buckets))
        .filter(F.col("term").isin(list(terms)))
    )
    df_rel = idx.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    stats = spark.table(f"{table}_stats")
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    score = idf * (
        (F.col("tf") * (BM25_K1 + 1.0))
        / (
            F.col("tf")
            + BM25_K1 * (1.0 - BM25_B + BM25_B * (F.col("dl") / avgdl))
        )
    )
    return (
        idx.join(F.broadcast(df_rel), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", F.round(score, 4).alias("s"))
        .groupBy("doc_id")
        .agg(F.sum("s").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def append_to_text_index(
    spark: SparkSession,
    new_docs: DataFrame,
    n_buckets: int = TEXT_IDX_BUCKETS,
    table: str = "text_postings_index",
) -> int:
    """Incremental index maintenance: tokenize ONLY the new documents,
    append their postings into the term-bucket partitions they touch,
    and refresh the 1-row corpus stats table (old stats + the append
    delta — never a corpus recount). Existing postings are untouched;
    per-term df stays correct WITHOUT any statistics rewrite because
    query_text_index computes df bucket-locally at query time (the
    design reason df is not stored). The text twin of
    append_to_ivf_index / append_to_bpe_cache; the anti-join guards
    replayed doc_ids so an at-least-once upstream can't double-index
    a document. Returns postings appended (Observation-counted on the
    write job — one lineage execution).

    When the corpus drifts enough that bucket sizes skew (dq3/dq6 are
    the detectors), rebuild with build_text_index — bucket-count
    changes are a full-corpus decision, not an append-path one."""
    from pyspark.sql import Observation

    existing_ids = spark.table(table).select("doc_id").distinct()
    d = (
        new_docs.select(
            "doc_id", F.split(F.lower("text"), " ").alias("toks")
        )
        .join(existing_ids, "doc_id", "left_anti")
        .select("doc_id", "toks", F.size("toks").alias("dl"))
        .localCheckpoint(eager=True)
    )
    postings = (
        d.select("doc_id", "dl", F.explode("toks").alias("term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select(
            "term",
            "doc_id",
            "tf",
            "dl",
            _term_bucket_col(F.col("term"), n_buckets).alias("tbucket"),
        )
    )
    obs = Observation("text_idx_append")
    (
        postings.observe(obs, F.count(F.lit(1)).alias("n"))
        .repartition("tbucket")
        .write.partitionBy("tbucket")
        .format("parquet")
        .mode("append")
        .saveAsTable(table)
    )
    n_appended = int(obs.get["n"])
    delta = d.agg(
        F.count(F.lit(1)).alias("dn"), F.sum("dl").alias("ddl")
    ).collect()[0]
    if delta["dn"]:
        old = spark.table(f"{table}_stats").collect()[0]
        stats = spark.createDataFrame(
            [
                (
                    old["n_docs"] + delta["dn"],
                    old["sum_dl"] + (delta["ddl"] or 0),
                )
            ],
            "n_docs long, sum_dl long",
        )
        stats.write.format("parquet").mode("overwrite").saveAsTable(
            f"{table}_stats"
        )
    return n_appended


LM5_EVAL_MOD = 97  # pp2's held-out convention: doc_id % 97 == 0 -> eval


@register(
    "lm5_bigram_eval",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, str_split(lower(text), ' ') AS t FROM documents
    ), train_p AS (
        SELECT t[i] AS w1, t[i + 1] AS w2
        FROM d, UNNEST(range(1, len(t))) AS u(i)
        WHERE doc_id % {LM5_EVAL_MOD} <> 0
    ), bg AS (
        SELECT w1, w2, COUNT(*) AS c FROM train_p GROUP BY w1, w2
    ), pred AS (
        SELECT w1, w2 AS predicted FROM (
            SELECT w1, w2,
                   ROW_NUMBER() OVER (PARTITION BY w1
                       ORDER BY c DESC, w2 ASC) AS rn
            FROM bg
        ) WHERE rn = 1
    ), eval_p AS (
        SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
        FROM d, UNNEST(range(1, len(t))) AS u(i)
        WHERE doc_id % {LM5_EVAL_MOD} = 0
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(CASE WHEN e.w2 = p.predicted THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           ROUND(SUM(CASE WHEN e.w2 = p.predicted THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS top1_acc
    FROM eval_p e LEFT JOIN pred p USING (w1)
    GROUP BY doc_id
    """,
)
def lm5_bigram_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEXT-TOKEN TOP-1 ACCURACY of the lm1 bigram model on held-out
    documents — the intrinsic LM eval that pairs with lm2's
    perplexity: train bigram counts on the non-eval corpus (pp2's
    doc_id % {LM5_EVAL_MOD} split), derive each context's argmax
    continuation (ties broken lexicographically so both engines pick
    the same word), and score every held-out bigram against it.
    Output per eval doc: bigram count, correct predictions, accuracy.

    Shape: one corpus scan feeds both the train pair aggregate and the
    eval pairs (the lm1 array-zip explode, map-side combined); the
    prediction table is VOCABULARY-sized — its rank window partitions
    by context word (bounded by vocab fan-out) and the scoring join
    broadcasts it (lm2's model-join discipline). Nothing
    vocabulary-sized ever shuffles corpus rows twice; at 100 TB the
    argmax table is exactly the distilled artifact you'd persist."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower("text"), " ").alias("t")
    )
    n = F.size("t")
    pairs = docs.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("t", 1, n - 1).alias("w1"),
                F.slice("t", 2, n - 1).alias("w2"),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    is_eval = F.col("doc_id") % LM5_EVAL_MOD == 0
    bg = (
        pairs.filter(~is_eval)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    by_ctx = Window.partitionBy("w1").orderBy(
        F.col("c").desc(), F.col("w2").asc()
    )
    pred = (
        bg.withColumn("rn", F.row_number().over(by_ctx))
        .filter(F.col("rn") == 1)
        .select("w1", F.col("w2").alias("predicted"))
    )
    ev = pairs.filter(is_eval)
    scored = ev.join(F.broadcast(pred), "w1", "left")
    hit = F.when(F.col("w2") == F.col("predicted"), 1).otherwise(0)
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum(hit).cast("long").alias("n_correct"),
        F.round(F.sum(hit) / F.count(F.lit(1)), 6).alias("top1_acc"),
    )


RK7_FEEDBACK = 3  # pseudo-relevant docs fed back per query
RK7_EXPAND = 2  # expansion terms adopted per query
RK7_K = 5  # final results per query


@register(
    "rk7_prf_expansion",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, list_distinct(str_split(lower(text), ' ')) AS t
        FROM documents
    ), q AS (
        SELECT doc_id AS query_id, t AS qt FROM d
        WHERE doc_id < {RRF_QUERIES}
    ), c AS (
        SELECT doc_id, t FROM d WHERE doc_id >= {RRF_QUERIES}
    ), r1 AS (
        SELECT query_id, doc_id, t,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
                   CAST(LEN(list_intersect(qt, t)) AS DOUBLE)
                   / (LEN(qt) + LEN(t) - LEN(list_intersect(qt, t)))
                   DESC, doc_id ASC) AS r
        FROM q CROSS JOIN c
    ), fb AS (
        SELECT query_id, doc_id, t FROM r1 WHERE r <= {RK7_FEEDBACK}
    ), fb_terms AS (
        SELECT fb.query_id, u.term
        FROM fb, UNNEST(fb.t) AS u(term)
    ), exp_terms AS (
        SELECT query_id, term FROM (
            SELECT ft.query_id, ft.term, COUNT(*) AS n_fb,
                   ROW_NUMBER() OVER (PARTITION BY ft.query_id
                       ORDER BY COUNT(*) DESC, ft.term ASC) AS rn
            FROM fb_terms ft JOIN q ON q.query_id = ft.query_id
            WHERE NOT list_contains(q.qt, ft.term)
            GROUP BY ft.query_id, ft.term
        ) WHERE rn <= {RK7_EXPAND}
    ), eq AS (
        SELECT q.query_id,
               list_distinct(list_concat(
                   q.qt, COALESCE(LIST(e.term), []))) AS xt
        FROM q LEFT JOIN exp_terms e USING (query_id)
        GROUP BY q.query_id, q.qt
    )
    SELECT query_id, doc_id, CAST(r AS BIGINT) AS final_rank FROM (
        SELECT eq.query_id, c.doc_id,
               ROW_NUMBER() OVER (PARTITION BY eq.query_id ORDER BY
                   CAST(LEN(list_intersect(eq.xt, c.t)) AS DOUBLE)
                   / (LEN(eq.xt) + LEN(c.t)
                      - LEN(list_intersect(eq.xt, c.t)))
                   DESC, c.doc_id ASC) AS r
        FROM eq CROSS JOIN c
    ) WHERE r <= {RK7_K}
    """,
)
def rk7_prf_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSEUDO-RELEVANCE-FEEDBACK QUERY EXPANSION (Rocchio's loop, the
    rank-time half): round 1 ranks candidates by exact token-set
    Jaccard against the query doc (rk4's lexical ranker); the top
    {RK7_FEEDBACK} "pseudo-relevant" docs vote expansion terms (most
    feedback docs containing the term, excluding original query
    terms, lexicographic tie-break); the query grows by {RK7_EXPAND}
    terms and round 2 re-ranks the corpus against the expanded set,
    emitting the final top-{RK7_K} ids + rank (x1's hash rule — no
    float crosses the output). Every score is a ratio of exact
    integer set sizes and every tie-break is total, so both engines
    produce identical rankings.

    Shape: two bounded broadcast-query corpus passes (rk4's economics
    — linear per query, never corpus²) with a feedback/expansion
    stage between them that touches {RK7_FEEDBACK}·|queries| rows;
    the per-query rank windows carry only (query, doc) pairs. At
    100 TB round 1 runs over rk1's BM25 postings (term-filtered
    shuffle) and round 2 over the text index's pruned buckets — the
    expansion stage is unchanged."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_distinct(F.split(F.lower("text"), " ")).alias("t"),
    )
    q = docs.filter(F.col("doc_id") < RRF_QUERIES).select(
        F.col("doc_id").alias("query_id"), F.col("t").alias("qt")
    )
    c = docs.filter(F.col("doc_id") >= RRF_QUERIES)

    def jaccard_rank(queries, qcol):
        """(query_id, doc_id, r) — ONLY ids and the score cross the
        rank window's exchange (r12, guide §2.3 project-before-the-
        exchange: the r11 form carried both token ARRAYS per pair
        through the shuffle; the feedback pass below re-attaches the
        arrays to its RK7_FEEDBACK·|queries| surviving rows by two
        small joins instead)."""
        inter = F.size(F.array_intersect(qcol, F.col("t")))
        j = inter / (F.size(qcol) + F.size("t") - inter)
        w = Window.partitionBy("query_id").orderBy(
            F.col("j").desc(), F.col("doc_id").asc()
        )
        return (
            F.broadcast(queries)
            .crossJoin(c)
            .select("query_id", "doc_id", j.alias("j"))
            .withColumn("r", F.row_number().over(w))
        )

    fb = (
        jaccard_rank(q, F.col("qt"))
        .filter(F.col("r") <= RK7_FEEDBACK)
        .select("query_id", "doc_id")
        .join(c, "doc_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "qt", F.explode("t").alias("term"))
    )
    by_q = Window.partitionBy("query_id").orderBy(
        F.col("n_fb").desc(), F.col("term").asc()
    )
    exp_terms = (
        fb.filter(~F.array_contains(F.col("qt"), F.col("term")))
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).alias("n_fb"))
        .withColumn("rn", F.row_number().over(by_q))
        .filter(F.col("rn") <= RK7_EXPAND)
    )
    eq = (
        q.join(
            exp_terms.groupBy("query_id").agg(
                F.collect_list("term").alias("ext")
            ),
            "query_id",
            "left",
        )
        .select(
            "query_id",
            F.array_distinct(
                F.concat(
                    F.col("qt"),
                    F.coalesce("ext", F.array().cast("array<string>")),
                )
            ).alias("xt"),
        )
    )
    return (
        jaccard_rank(eq, F.col("xt"))
        .filter(F.col("r") <= RK7_K)
        .select(
            "query_id",
            "doc_id",
            F.col("r").cast("long").alias("final_rank"),
        )
    )


QL_MU = 2000.0  # Dirichlet smoothing mass (Zhai & Lafferty's standard)


@register(
    "rk8_query_likelihood",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, toks, LEN(toks) AS dl
        FROM (SELECT doc_id, str_split(lower(text), ' ') AS toks
              FROM documents)
    ), stats AS (
        SELECT CAST(SUM(dl) AS BIGINT) AS c_tokens FROM d
    ), posting AS (
        SELECT term, doc_id, dl, COUNT(*) AS tf
        FROM d, UNNEST(toks) AS u(term)
        WHERE term IN ({_TERMS_SQL})
        GROUP BY term, doc_id, dl
    ), cf AS (
        SELECT term, CAST(SUM(tf) AS BIGINT) AS cf
        FROM posting GROUP BY term
    )
    SELECT p.term, p.doc_id, p.tf, cf.cf,
           ROUND(LN((p.tf + {QL_MU!r}::DOUBLE * (1.0 * cf.cf / c_tokens))
                    / (p.dl + {QL_MU!r}::DOUBLE)), 4) AS log_prob
    FROM posting p JOIN cf USING (term) CROSS JOIN stats
    """,
)
def rk8_query_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIRICHLET-SMOOTHED QUERY LIKELIHOOD (Zhai & Lafferty's LMIR.DIR)
    — the language-modeling retrieval scorer completing the classical
    trio with rk1's BM25 and rk2's TF-IDF: per matching (term, doc)
    posting, log P(w|d) = ln((tf + μ·cf_w/|C|) / (dl + μ)) with
    μ = {QL_MU}. Published per-POSTING (rk1's rule) rather than summed
    per document: a float sum over query terms is combine-order-
    dependent, and the per-term relation is also what an inverted
    index stores — consumers fold the bounded per-query term set in a
    fixed order (rk4's fusion shape). cf here is the query terms'
    corpus frequency; a document missing a term contributes the
    background-only score ln(μ·p_c/(dl+μ)), derivable from the same
    published columns.

    Shape: identical to rk1 — one corpus scan, the term filter kills
    ~all rows before the (term, doc) shuffle, corpus-frequency and
    total-token aggregates stay O(|terms|)/O(1) and broadcast back.
    The only float ops are one division chain and one ln over operands
    both engines derive from exact integers — hash-exact."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower("text"), " ").alias("toks")
    )
    d = docs.select("doc_id", "toks", F.size("toks").alias("dl"))
    stats = d.agg(F.sum("dl").alias("c_tokens"))
    posting = (
        d.select("doc_id", "dl", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(*BM25_TERMS))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    cf = posting.groupBy("term").agg(F.sum("tf").alias("cf"))
    log_prob = F.log(
        (
            F.col("tf")
            + F.lit(QL_MU)
            * (F.lit(1.0) * F.col("cf") / F.col("c_tokens"))
        )
        / (F.col("dl") + F.lit(QL_MU))
    )
    return (
        posting.join(F.broadcast(cf), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            "doc_id",
            "tf",
            "cf",
            F.round(log_prob, 4).alias("log_prob"),
        )
    )


@register(
    "lm8_cross_source_entropy",
    oracle="""
    WITH tok AS (
        SELECT source, u.w
        FROM documents, UNNEST(str_split(lower(text), ' ')) AS u(w)
    ), cnt AS (
        SELECT source, w, COUNT(*) AS c FROM tok GROUP BY source, w
    ), tot AS (
        SELECT source, SUM(c) AS n FROM cnt GROUP BY source
    ), vocab AS (
        SELECT COUNT(DISTINCT w) AS v FROM cnt
    ), inter AS (
        SELECT tr.source AS ts, ev.source AS es,
               SUM(ev.c * LN(tr.c + 1)) AS s
        FROM cnt tr JOIN cnt ev USING (w)
        GROUP BY tr.source, ev.source
    )
    SELECT t1.source AS train_source, t2.source AS eval_source,
           CAST(t2.n AS BIGINT) AS n_eval_tokens,
           ROUND(LN(t1.n + v.v) - COALESCE(i.s, 0) / t2.n, 6)
               AS cross_entropy
    FROM tot t1 CROSS JOIN tot t2 CROSS JOIN vocab v
    LEFT JOIN inter i ON i.ts = t1.source AND i.es = t2.source
    """,
)
def lm8_cross_source_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SOURCE-TO-SOURCE CROSS-ENTROPY MATRIX — the domain-similarity
    signal mixture planners (DoReMi / DSIR-style data selection) weight
    by: train an add-one-smoothed unigram LM on each source, score
    every source's token stream under every LM, and emit the S x S
    matrix (diagonal = each source's own entropy; a low off-diagonal
    cell means the train source transfers to the eval domain). With
    add-one smoothing over the shared corpus vocabulary V,
        CE(s, e) = ln(N_s + V) - (1/N_e) * sum_w n_ew * ln(c_sw + 1),
    and the sum runs ONLY over words present in BOTH sources (c_sw = 0
    contributes ln(1) = 0) — so the corpus-sized token stream never
    enters a pairwise stage.

    Shape: ONE corpus scan aggregates (source, word) counts —
    map-side partials collapse the token stream before the single
    vocab-keyed shuffle — and that vocabulary-sized relation is
    MATERIALIZED (lm2's checkpoint discipline: the explode subtree
    would otherwise re-scan the corpus for each of its three
    consumers). The matrix itself is a self-join of that relation on
    word (per-word fan-out bounded by S^2, S = #sources), aggregated
    straight to S x S rows; totals and vocab size are O(S) + scalar
    relations cross-joined back in. At 100 TB nothing beyond the
    (source, word) aggregate ever shuffles, and that relation is
    exactly the distilled per-domain LM you'd persist. Engine parity:
    counts are exact integers; the LN sum is order-independent to
    ~1e-15 relative and ROUND(6) absorbs it (lm2's rule). Reference
    parity: extension scope (SURVEY §2h X4)."""
    tok = load_table(spark, sf_dir, "documents").select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("w")
    )
    cnt = (
        tok.groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    tot = cnt.groupBy("source").agg(F.sum("c").alias("n"))
    vocab = cnt.select(F.countDistinct("w").alias("v"))
    inter = (
        cnt.alias("tr")
        .join(cnt.alias("ev"), "w")
        .groupBy(
            F.col("tr.source").alias("ts"), F.col("ev.source").alias("es")
        )
        .agg(
            F.sum(F.col("ev.c") * F.log(F.col("tr.c") + 1)).alias("s")
        )
    )
    t1 = tot.select(
        F.col("source").alias("train_source"), F.col("n").alias("n_tr")
    )
    t2 = tot.select(
        F.col("source").alias("eval_source"), F.col("n").alias("n_ev")
    )
    ce = F.log(F.col("n_tr") + F.col("v")) - F.coalesce(
        F.col("s"), F.lit(0.0)
    ) / F.col("n_ev")
    return (
        t1.crossJoin(t2)
        .crossJoin(F.broadcast(vocab))
        .join(
            inter,
            (F.col("train_source") == F.col("ts"))
            & (F.col("eval_source") == F.col("es")),
            "left",
        )
        .select(
            "train_source",
            "eval_source",
            F.col("n_ev").cast("long").alias("n_eval_tokens"),
            F.round(ce, 6).alias("cross_entropy"),
        )
    )
