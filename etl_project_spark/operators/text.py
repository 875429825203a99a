"""Text-analysis operators over the ``documents`` table (extension X4 +
the training-data-pipeline text suite: token counting, quality scoring,
language ID, document fingerprinting).

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM,
whole-stage codegen) — no Python UDFs. Language ID is heuristic and
JVM-side too (stopword-hit scoring via array intersections).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_project_spark.catalog import load_table
from etl_project_spark.registry import register


def _tokens(col: str | Column = "text") -> Column:
    """Whitespace tokenization of lowercased text (JVM split)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(c), " ")


@register(
    "tx1_doc_stats",
    oracle="""
    SELECT doc_id,
           LENGTH(text) AS n_chars_measured,
           LEN(str_split(lower(text), ' ')) AS n_tokens,
           LEN(list_distinct(str_split(lower(text), ' '))) AS n_unique_tokens
    FROM documents
    """,
)
def tx1_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document stats: char length, whitespace token count, unique
    token count — the base features of a corpus-quality pass."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_measured"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
    )


@register(
    "tx2_corpus_profile",
    oracle="""
    SELECT lang, source, COUNT(*) AS n_docs,
           AVG(CAST(n_chars AS DOUBLE)) AS avg_chars,
           AVG(CAST(LEN(str_split(lower(text), ' ')) AS DOUBLE)) AS avg_tokens
    FROM documents GROUP BY 1, 2
    """,
)
def tx2_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile by (lang, source): doc counts and mean lengths —
    partial-aggregated, |lang|×|source| output keys."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.avg(F.col("n_chars").cast("double")).alias("avg_chars"),
        F.avg(F.size(_tokens()).cast("double")).alias("avg_tokens"),
    )


@register(
    "tx3_token_topk",
    oracle="""
    SELECT token, COUNT(*) AS freq FROM (
        SELECT UNNEST(str_split(lower(text), ' ')) AS token FROM documents
    ) GROUP BY 1 ORDER BY freq DESC, token LIMIT 50
    """,
)
def tx3_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global token frequency top-50: explode → hash agg → top-k. At scale
    this is the vocabulary-build job; partial aggregation collapses each
    partition's counts before the shuffle, and the final top-k is
    TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(_tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(50)
    )


@register(
    "tx4_quality_filter",
    oracle="""
    SELECT doc_id, lang, n_tokens, uniq_ratio FROM (
        SELECT doc_id, lang,
               LEN(str_split(lower(text), ' ')) AS n_tokens,
               CAST(LEN(list_distinct(str_split(lower(text), ' '))) AS DOUBLE)
                   / LEN(str_split(lower(text), ' ')) AS uniq_ratio
        FROM documents
    ) WHERE n_tokens >= 20 AND uniq_ratio >= 0.30
    """,
)
def tx4_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality filter: keep documents with enough tokens and a healthy
    unique-token ratio (low ratio ⇒ repetitive/boilerplate text). The
    standard pre-training corpus gate, fully JVM-side."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    scored = docs.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        (
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
        ).alias("uniq_ratio"),
    )
    return scored.filter((F.col("n_tokens") >= 20) & (F.col("uniq_ratio") >= 0.30))


@register(
    "tx5_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(str_split(lower(text), ' '))), ' '))
               AS fingerprint
    FROM documents
    """,
)
def tx5_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 over the sorted unique-token set — a
    normalization-invariant key (word order / duplication insensitive) used
    for fuzzy-exact dedup joins at scale."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(_tokens())))
        ).alias("fingerprint"),
    )


# A tiny per-language stopword table for the heuristic language scorer.
# Public common function words; good enough for a coarse corpus router.
_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "es", "los"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "une", "est", "les"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不", "这", "人"],
}


@register(
    "tx6_langid",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang,
               list_distinct(string_split(lower(text), ' ')) AS t
        FROM documents
    ), langs(cand, words) AS (VALUES
        ('de', ['der', 'die', 'das', 'und', 'ist', 'ein', 'eine', 'zu', 'den', 'von']),
        ('en', ['the', 'a', 'of', 'and', 'to', 'in', 'is', 'that', 'it', 'for']),
        ('es', ['el', 'la', 'de', 'y', 'que', 'en', 'un', 'una', 'es', 'los']),
        ('fr', ['le', 'la', 'de', 'et', 'que', 'en', 'un', 'une', 'est', 'les']),
        ('zh', ['的', '是', '了', '在', '和', '有', '我', '不', '这', '人'])
    ), scored AS (
        SELECT doc_id, lang, cand, len(list_intersect(t, words)) AS hits
        FROM toks CROSS JOIN langs
    ), best AS (
        SELECT doc_id, lang, cand, hits,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY hits DESC, cand DESC) AS rk
        FROM scored
    )
    SELECT doc_id, lang,
           CASE WHEN hits > 0 THEN cand ELSE 'und' END AS predicted_lang,
           hits AS stopword_hits
    FROM best WHERE rk = 1
    """,
)  # argmax tie-break == Spark struct compare: hits, then lang DESC
def tx6_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: score each language by stopword hits in the
    token set (JVM array_intersect — no Python UDF), predict the argmax
    with 'und' (undetermined) when nothing matches.

    Scale: the stopword table is a literal array per language — constant
    folded; one pass, no shuffle, no join.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(_tokens())
    scores = F.array(
        *[
            F.struct(
                F.size(
                    F.array_intersect(
                        toks, F.array(*[F.lit(w) for w in words])
                    )
                ).alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang, words in sorted(_STOPWORDS.items())
        ]
    )
    best = F.array_max(scores)
    return docs.select(
        "doc_id",
        "lang",
        F.when(best["hits"] > 0, best["lang"]).otherwise("und").alias(
            "predicted_lang"
        ),
        best["hits"].alias("stopword_hits"),
    )


# BPE-ish pre-tokenizer: the GPT-2-style split of " ?letters | ?digits |
# ?other-symbols" restricted to the ascii corpus — the standard proxy for
# counting trainable tokens without shipping a vocab. Same RE2/Java-regex
# subset so Spark and the DuckDB oracle tokenize identically.
BPE_PATTERN = r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"


@register(
    "tx7_bpe_token_count",
    oracle=f"""
    SELECT doc_id,
           LEN(str_split(lower(text), ' ')) AS n_ws_tokens,
           LEN(regexp_extract_all(lower(text), '{BPE_PATTERN}'))
               AS n_bpe_tokens,
           CAST(LEN(regexp_extract_all(lower(text), '{BPE_PATTERN}'))
                AS DOUBLE)
               / LEN(str_split(lower(text), ' ')) AS bpe_per_ws_token
    FROM documents
    """,
)
def tx7_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, BPE-ish: whitespace tokens vs regex pre-tokenizer
    pieces (letters / digit runs / symbol runs, GPT-2-style) — the cheap
    estimator for 'how many trainable tokens does this corpus hold'.
    Pure JVM regexp (codegen, scan-local, no shuffle); the ratio column
    is the fertility estimate a data-mix planner budgets with."""
    docs = load_table(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    ws = F.size(F.split(low, " "))
    bpe = F.size(F.regexp_extract_all(low, F.lit(BPE_PATTERN), 0))
    return docs.select(
        "doc_id",
        ws.alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
        (bpe.cast("double") / ws).alias("bpe_per_ws_token"),
    )


_GQ_STOPWORDS = _STOPWORDS["en"]


@register(
    "tx8_gopher_quality",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lower(text) AS lt,
               str_split(lower(text), ' ') AS tk
        FROM documents
    )
    SELECT doc_id,
           LEN(tk) AS n_tokens,
           -- sum of token lengths == chars that aren't separators
           CAST(LENGTH(replace(lt, ' ', '')) AS DOUBLE) / LEN(tk)
               AS mean_token_len,
           CAST(LENGTH(regexp_replace(lt, '[^a-z]', '', 'g')) AS DOUBLE)
               / LENGTH(lt) AS alpha_ratio,
           CAST(LEN(list_filter(tk,
                    x -> list_contains({_GQ_STOPWORDS!r}, x))) AS DOUBLE)
               / LEN(tk) AS stopword_ratio,
           1.0 - CAST(LEN(list_distinct(tk)) AS DOUBLE) / LEN(tk)
               AS dup_token_ratio,
           (LEN(tk) >= 10
            AND CAST(LENGTH(replace(lt, ' ', '')) AS DOUBLE) / LEN(tk)
                BETWEEN 2 AND 12
            AND CAST(LENGTH(regexp_replace(lt, '[^a-z]', '', 'g')) AS DOUBLE)
                / LENGTH(lt) >= 0.6
            AND 1.0 - CAST(LEN(list_distinct(tk)) AS DOUBLE) / LEN(tk) <= 0.6)
               AS quality_pass
    FROM t
    """,
)
def tx8_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style corpus-quality signals per document: token count,
    mean token length, alphabetic-character ratio, stopword ratio,
    duplicate-token ratio, and the composite pass/fail gate a
    pre-training pipeline filters on. Every ratio is an exact integer
    sum divided by an exact count, so both engines emit bit-identical
    doubles. One scan, zero shuffles, zero Python."""
    docs = load_table(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    tk = F.split(low, " ")
    n = F.size(tk)
    # sum of token lengths == non-separator chars: stays in whole-stage
    # codegen (an aggregate() HOF lambda would evaluate interpreted
    # per token)
    sum_len = F.length(F.regexp_replace(low, " ", ""))
    mean_len = sum_len.cast("double") / n
    alpha = (
        F.length(F.regexp_replace(low, "[^a-z]", "")).cast("double")
        / F.length(low)
    )
    stop_arr = F.array(*[F.lit(w) for w in _GQ_STOPWORDS])
    stop_ratio = (
        F.size(F.filter(tk, lambda x: F.array_contains(stop_arr, x))).cast(
            "double"
        )
        / n
    )
    dup_ratio = F.lit(1.0) - F.size(F.array_distinct(tk)).cast("double") / n
    gate = (
        (n >= 10)
        & mean_len.between(2, 12)
        & (alpha >= 0.6)
        & (dup_ratio <= 0.6)
    )
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        mean_len.alias("mean_token_len"),
        alpha.alias("alpha_ratio"),
        stop_ratio.alias("stopword_ratio"),
        dup_ratio.alias("dup_token_ratio"),
        gate.alias("quality_pass"),
    )


# PII patterns — identical semantics in Java regex (Spark) and RE2
# (DuckDB): no backrefs, no lookaround.
PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_LONGNUM = r"[0-9]{6,}"


@register(
    "tx9_pii_redact",
    oracle=f"""
    SELECT doc_id,
           regexp_replace(regexp_replace(lower(text),
               '{PII_EMAIL}', '<EMAIL>', 'g'), '{PII_LONGNUM}', '<NUM>', 'g')
               AS redacted,
           LEN(regexp_extract_all(lower(text), '{PII_EMAIL}'))
               + LEN(regexp_extract_all(lower(text), '{PII_LONGNUM}'))
               AS n_redactions
    FROM documents
    """,
)
def tx9_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: replace emails and long digit runs with typed
    placeholder tags, reporting how many spans were redacted — the
    standard pre-release pass over a training corpus. regexp_replace is
    JVM codegen; per-row independent, no shuffle at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    redacted = F.regexp_replace(
        F.regexp_replace(low, PII_EMAIL, "<EMAIL>"), PII_LONGNUM, "<NUM>"
    )
    n_red = F.size(F.regexp_extract_all(low, F.lit(PII_EMAIL), 0)) + F.size(
        F.regexp_extract_all(low, F.lit(PII_LONGNUM), 0)
    )
    return docs.select(
        "doc_id", redacted.alias("redacted"), n_red.alias("n_redactions")
    )


WINNOW_K = 8  # char k-gram width
WINNOW_W = 4  # winnowing window (grams per window)


@register(
    "tx10_winnowing_fingerprint",
    oracle=f"""
    WITH g AS (
        SELECT doc_id, lower(text) AS lt FROM documents
        WHERE LENGTH(text) >= {WINNOW_K + WINNOW_W - 1}
    ), h AS (
        SELECT doc_id,
               [substr(md5(substr(lt, i, {WINNOW_K})), 1, 8)
                FOR i IN generate_series(1, LENGTH(lt) - {WINNOW_K} + 1)]
                   AS hs
        FROM g
    ), w AS (
        SELECT doc_id,
               list_distinct(
                   [list_min(hs[j:j+{WINNOW_W - 1}])
                    FOR j IN generate_series(1, LEN(hs) - {WINNOW_W} + 1)]
               ) AS fps
        FROM h
    )
    SELECT doc_id, f AS fingerprint FROM w, UNNEST(fps) AS t(f)
    """,
)
def tx10_winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprinting by winnowing (the MOSS
    selection rule): hash every {k}-char gram, keep the minimum hash of
    each {w}-gram window, emit the distinct selected hashes. Guarantees
    every match of length >= k+w-1 between two documents shares a
    fingerprint — the classic plagiarism/near-dup index whose size is
    ~2/(w+1) of the gram count.

    Hashes are the first 8 hex chars of md5 (fixed-width lowercase hex:
    lexicographic min == numeric min), identical in both engines.

    Since round 3 the registered query runs the Arrow-batched kernel
    (:func:`winnow_fingerprints_arrow`): winnowing is per-document, so
    the gram-hash/window-min/distinct pipeline runs inside one numpy
    pass per Arrow batch — no explode, no window shuffle, output
    byte-identical to the relational form (equality pinned in
    tests/test_properties.py). The relational twin
    (:func:`winnow_fingerprints`) remains the plan the oracle mirrors
    and the form to use when the corpus arrives pre-exploded. For the
    O(1)-per-position production hash at 100 TB see
    ``tx11_rabin_winnowing``."""
    docs = load_table(spark, sf_dir, "documents")
    return winnow_fingerprints_arrow(spark, docs)


def winnow_fingerprints(
    docs: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """Winnowing core over any ``(doc_id, text)`` DataFrame — see
    :func:`tx10_winnowing_fingerprint` for the algorithm and the two
    O(n^2) plan traps this formulation avoids.

    The md5 runs as a scalar projection ABOVE the position explode
    (whole-stage codegen), not inside an array ``transform`` (interpreted
    per element — measured 2.4x slower at sf0.1). Only gram *positions*
    are generated; each row then hashes its own substring once."""
    from pyspark.sql import Window

    WINNOW_K, WINNOW_W = k, w
    docs = docs.filter(F.length("text") >= WINNOW_K + WINNOW_W - 1)
    grams = (
        docs.select(
            "doc_id",
            F.lower("text").alias("lt"),
            # n_grams = length - K + 1, derived from length(text) NOT
            # size of a hash array: cheap to re-evaluate per exploded row
            (F.length("text") - (WINNOW_K - 1)).alias("n_grams"),
        )
        .select(
            "doc_id",
            "n_grams",
            "lt",
            F.posexplode(F.sequence(F.lit(0), F.col("n_grams") - 1)).alias(
                "_i", "pos"
            ),
        )
        .select(
            "doc_id",
            "n_grams",
            "pos",
            F.substring(
                F.md5(
                    F.expr(
                        f"cast(substring(lt, pos + 1, {WINNOW_K}) as binary)"
                    )
                ),
                1,
                8,
            ).alias("h"),
        )
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(0, WINNOW_W - 1)
    )
    return (
        grams.select(
            "doc_id",
            "n_grams",
            "pos",
            F.min("h").over(win).alias("fingerprint"),
        )
        .filter(F.col("pos") <= F.col("n_grams") - WINNOW_W)
        .select("doc_id", "fingerprint")
        .distinct()
    )


def winnow_fingerprints_arrow(
    spark: SparkSession, docs: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """Arrow-batched winnowing kernel: identical output to
    :func:`winnow_fingerprints`, ~8x faster at sf0.1 (0.5 s vs 3.9 s).

    Winnowing is per-document, so nothing about it needs relational
    machinery: each Arrow batch runs gram-hash -> sliding-window min ->
    unique entirely in numpy/hashlib per document. That deletes the
    1.5M-row posexplode, the doc_id window sort, AND the distinct
    shuffle — the only exchange left is a repartition of the raw docs
    for kernel parallelism (a small file arrives as one split; at real
    corpus scale the scan is already partitioned and the repartition
    can drop out).

    Exact-parity details: md5 input is the UTF-8 encoding of the
    k-CHAR substring of the Python-lowercased text (ASCII fast path
    slices bytes directly; str.lower == JVM/DuckDB lower on ASCII —
    the corpus is ASCII, and the property suite pins kernel==relational
    on random text); the first 8 hex chars of md5 are compared as the
    big-endian uint32 they encode (fixed-width lowercase hex:
    numeric min == lexicographic min), formatted back with %08x."""
    import hashlib

    import numpy as np
    import pandas as pd
    from numpy.lib.stride_tricks import sliding_window_view

    min_len = k + w - 1

    def kernel(batches):
        md5 = hashlib.md5
        for pdf in batches:
            ids: list = []
            fps: list = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                lt = str(text).lower()
                n = len(lt) - k + 1
                if len(lt) < min_len:
                    continue
                if lt.isascii():
                    raw = lt.encode()
                    grams = (raw[i : i + k] for i in range(n))
                else:  # multi-byte chars: slice by chars, then encode
                    grams = (lt[i : i + k].encode() for i in range(n))
                hs = np.fromiter(
                    (
                        int.from_bytes(md5(g).digest()[:4], "big")
                        for g in grams
                    ),
                    dtype=np.uint32,
                    count=n,
                )
                sel = np.unique(sliding_window_view(hs, w).min(axis=1))
                ids.extend([doc_id] * len(sel))
                fps.extend(format(v, "08x") for v in sel)
            yield pd.DataFrame(
                {"doc_id": pd.array(ids, dtype="int64"), "fingerprint": fps}
            )

    par = spark.sparkContext.defaultParallelism
    return docs.select("doc_id", "text").repartition(par).mapInPandas(
        kernel, schema="doc_id long, fingerprint string"
    )


# Rabin polynomial hash parameters (tx11): codepoint polynomial in base
# RABIN_B modulo the Mersenne prime 2^31-1. Every intermediate fits
# int64 exactly in BOTH engines: codepoints < 2^21, weights < 2^31,
# 8-term weighted sum < 2^55.
RABIN_B = 1000003
RABIN_P = 2_147_483_647
_RABIN_W = [pow(RABIN_B, WINNOW_K - 1 - j, RABIN_P) for j in range(WINNOW_K)]


def _rabin_oracle() -> str:
    terms = " + ".join(
        f"cps[i + {j}] * {w}" for j, w in enumerate(_RABIN_W)
    )
    return f"""
    WITH g AS (
        SELECT doc_id, lower(text) AS lt FROM documents
        WHERE LENGTH(text) >= {WINNOW_K + WINNOW_W - 1}
    ), cp AS (
        SELECT doc_id,
               [CAST(unicode(substr(lt, i, 1)) AS BIGINT)
                FOR i IN generate_series(1, LENGTH(lt))] AS cps
        FROM g
    ), h AS (
        SELECT doc_id,
               [({terms}) % {RABIN_P}
                FOR i IN generate_series(1, LEN(cps) - {WINNOW_K} + 1)]
                   AS hs
        FROM cp
    ), w AS (
        SELECT doc_id,
               list_distinct(
                   [list_min(hs[j:j+{WINNOW_W - 1}])
                    FOR j IN generate_series(1, LEN(hs) - {WINNOW_W} + 1)]
               ) AS fps
        FROM h
    )
    SELECT doc_id, f AS fingerprint FROM w, UNNEST(fps) AS t(f)
    """


@register("tx11_rabin_winnowing", oracle=_rabin_oracle())
def tx11_rabin_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing with the production ROLLING hash: the same MOSS
    selection rule as tx10 (k={WINNOW_K} grams, window {WINNOW_W},
    distinct per doc) over a Rabin polynomial hash of the gram's
    codepoints — h(i) = sum cp[i+j] * B^(k-1-j) mod 2^31-1 — instead
    of md5. This is the hash a 100 TB fingerprinting pass wants:
    updatable in O(1) per position (multiply, subtract the outgoing
    term, add the incoming), integer-only, and engine-neutral (the
    DuckDB oracle recomputes identical int64 arithmetic, so this
    carries a full hash-equality differential check — md5-gram tx10's
    selection rule with a cheaper hash).

    The Arrow kernel evaluates the polynomial as an 8-wide integer
    dot product over a sliding codepoint window (numpy SIMD) rather
    than the scalar O(1) recurrence — identical values; the
    vectorized form beats a sequential dependency chain on batch
    hardware, while the recurrence form is what a streaming one-pass
    implementation would use. All intermediates are exact in int64
    (see RABIN_B/RABIN_P note); no shuffle beyond the parallelism
    repartition, same as tx10."""
    import numpy as np
    import pandas as pd
    from numpy.lib.stride_tricks import sliding_window_view

    k, w = WINNOW_K, WINNOW_W
    min_len = k + w - 1
    weights = np.array(_RABIN_W, dtype=np.int64)

    def kernel(batches):
        for pdf in batches:
            ids: list = []
            fps: list = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                lt = str(text).lower()
                if len(lt) < min_len:
                    continue
                if lt.isascii():
                    cps = np.frombuffer(lt.encode(), dtype=np.uint8).astype(
                        np.int64
                    )
                else:
                    cps = np.fromiter(map(ord, lt), np.int64, count=len(lt))
                hs = (sliding_window_view(cps, k) @ weights) % RABIN_P
                sel = np.unique(sliding_window_view(hs, w).min(axis=1))
                ids.extend([doc_id] * len(sel))
                fps.extend(sel.tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "fingerprint": pd.array(fps, dtype="int64"),
                }
            )

    docs = load_table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    return docs.select("doc_id", "text").repartition(par).mapInPandas(
        kernel, schema="doc_id long, fingerprint long"
    )


HH_K = 32  # heavy-hitter support: report tokens with count*K >= total


def misra_gries_kernel(
    tokens, k: int, counters: dict[str, int] | None = None
) -> dict[str, int]:
    """Misra-Gries frequent-items sketch with k counters over one token
    stream: a surviving counter underestimates by at most n/(k+1), so
    every item with stream frequency >= n/k STRICTLY exceeds n/(k+1)
    and is guaranteed to survive (k counters, not the textbook k-1 —
    the one extra counter converts the classic strict ">" guarantee
    into the ">=" threshold the exact recount filters on). Pure Python
    over one partition's tokens — property-tested directly in
    tests/test_text_extra.py against adversarial streams.

    ``counters`` resumes an existing sketch (the streaming twin feeds
    each micro-batch through the same eviction rule,
    streaming/stateful.heavy_hitters_stream)."""
    counters = dict(counters) if counters else {}
    for w in tokens:
        if w in counters:
            counters[w] += 1
        elif len(counters) < k:
            counters[w] = 1
        else:
            dead = [key for key in counters if counters[key] == 1]
            for key in counters:
                counters[key] -= 1
            for key in dead:
                del counters[key]
    return counters


@register(
    "tx12_heavy_hitters",
    oracle=f"""
    WITH tok AS (
        SELECT UNNEST(str_split(lower(text), ' ')) AS w FROM documents
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok
    )
    SELECT w, COUNT(*) AS cnt
    FROM tok CROSS JOIN tot
    GROUP BY w, n
    HAVING COUNT(*) * {HH_K} >= n
    """,
)
def tx12_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT corpus heavy hitters — every token holding >= 1/{HH_K} of
    the total token mass, with its exact count — via the two-pass
    sketch-then-verify pattern that makes frequent-items tractable at
    100 TB: (1) each partition runs a Misra-Gries sketch ({HH_K}
    counters) over its own token stream and emits only its surviving
    candidate words; any GLOBAL heavy hitter must be locally heavy in
    at least one partition (averaging: sum f_i(w) >= sum(n_i)/K forces
    some f_i(w) >= n_i/K > n_i/(K+1), which the K-counter sketch
    guarantees to keep), so the candidate union is a guaranteed
    superset. (2) an exact recount over the candidate set (broadcast
    semi-join filter, then one small groupBy) plus the integer threshold
    cnt*K >= total — exact ints in both engines, no float compare — so
    the final output is EXACT and fully hash-checked, while the only
    all-token aggregation is the 1-row total count (map-side partial).

    Shuffle ledger: candidates are <= partitions x {HH_K} rows (tiny),
    the recount groupBy runs on the candidate-filtered stream, and the
    exact total is a single-row reduce — nothing vocabulary-sized ever
    shuffles, unlike tx3's full token top-k. That is the point: at a
    web-corpus vocabulary (billions of distinct n-grams) the naive
    group-everything plan shuffles the vocabulary; this plan shuffles
    K rows per partition."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(_tokens()).alias("w"))

    def mg(batches):
        counters = misra_gries_kernel(
            (w for pdf in batches for w in pdf["w"]), HH_K
        )
        yield pd.DataFrame({"w": list(counters)})

    candidates = (
        tok.mapInPandas(mg, schema="w string").distinct()
    )
    total = tok.agg(F.count(F.lit(1)).alias("n"))
    return (
        tok.join(F.broadcast(candidates), "w", "left_semi")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * HH_K >= F.col("n"))
        .select("w", "cnt")
    )


def _tx13_oracle() -> str:
    from etl_project_spark.operators.dedup import DD8_TAU

    return f"""
    WITH toks AS (
        SELECT doc_id, str_split(lower(text), ' ') AS t FROM documents
    ), sh AS (
        SELECT doc_id, list_distinct(
            [array_to_string(t[i+1:i+3], ' ')
             FOR i IN generate_series(0, GREATEST(LEN(t)-3, 0))]
        ) AS s
        FROM toks
    ), pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(LEN(list_intersect(a.s, b.s)) AS DOUBLE)
                  / (LEN(a.s) + LEN(b.s) - LEN(list_intersect(a.s, b.s)))
              >= {DD8_TAU}
    ), pos AS (
        SELECT doc_id, i AS pos, array_to_string(t[i+1:i+3], ' ') AS gram
        FROM toks, UNNEST(generate_series(0, LEN(t)-3)) AS u(i)
        WHERE LEN(t) >= 3
    ), first AS (
        SELECT doc_id, gram, CAST(MIN(pos) AS BIGINT) AS pos,
               CAST(COUNT(*) AS BIGINT) AS n_occ
        FROM pos GROUP BY doc_id, gram
    )
    SELECT p.doc_a, p.doc_b, fa.gram,
           fa.pos AS pos_a, fb.pos AS pos_b,
           fa.n_occ AS occ_a, fb.n_occ AS occ_b
    FROM pairs p
    JOIN first fa ON fa.doc_id = p.doc_a
    JOIN first fb ON fb.doc_id = p.doc_b AND fb.gram = fa.gram
    """


@register("tx13_shared_span_index", oracle=_tx13_oracle())
def tx13_shared_span_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level duplicate EVIDENCE: for every exact near-dup pair
    (dd8's Jaccard >= tau set), each shared word 3-gram with its first
    position and occurrence count in BOTH documents — the index a
    boilerplate-trimming pass consumes (dd8 says WHICH docs overlap;
    this says WHERE). Downstream, consecutive positions chain into the
    shared spans to cut.

    Shape: dd8's prefix-filtered pair set (bounded) broadcasts a
    doc-id filter over the corpus, so the positioned-shingle relation
    is built ONLY for documents that appear in some pair — at 100 TB
    with a ~1% dup rate that is a ~100x scan-output cut before the
    (doc, gram) aggregation; the final joins fan the bounded pair set
    against the per-doc first-occurrence relation. Output rows = sum
    over pairs of |shared distinct 3-grams| — duplicate-mass-sized,
    not corpus-sized."""
    from etl_project_spark.operators.dedup import dd8_jaccard_prefix_join

    pairs = dd8_jaccard_prefix_join(spark, sf_dir).select("doc_a", "doc_b")
    pair_docs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    docs = load_table(spark, sf_dir, "documents")
    d = docs.join(F.broadcast(pair_docs), "doc_id").select(
        "doc_id", F.split(F.lower("text"), " ").alias("t")
    )
    ex = d.select(
        "doc_id",
        F.size("t").alias("n"),
        "t",
        F.posexplode("t").alias("pos", "w"),
    ).filter(F.col("pos") <= F.col("n") - 3)
    grams = ex.select(
        "doc_id",
        "pos",
        F.concat_ws(
            " ",
            F.col("w"),
            F.element_at("t", F.col("pos") + 2),
            F.element_at("t", F.col("pos") + 3),
        ).alias("gram"),
    )
    first = grams.groupBy("doc_id", "gram").agg(
        F.min("pos").cast("long").alias("pos"),
        F.count(F.lit(1)).alias("n_occ"),
    )
    fa = first.select(
        F.col("doc_id").alias("doc_a"),
        "gram",
        F.col("pos").alias("pos_a"),
        F.col("n_occ").alias("occ_a"),
    )
    fb = first.select(
        F.col("doc_id").alias("doc_b"),
        "gram",
        F.col("pos").alias("pos_b"),
        F.col("n_occ").alias("occ_b"),
    )
    return (
        F.broadcast(pairs)
        .join(fa, "doc_a")
        .join(fb, ["doc_b", "gram"])
        .select(
            "doc_a", "doc_b", "gram", "pos_a", "pos_b", "occ_a", "occ_b"
        )
    )


# Fixed quality-classifier weights (a stand-in for a trained
# fasttext/logistic quality model's coefficients — production swaps
# these literals for the trained vector; the PLAN is weight-agnostic).
QL_BIAS = -3.8
QL_W_LOGTOK = 0.5  # ln(token count): longer docs score higher
QL_W_MEANLEN = 0.2  # mean token length
QL_W_ALPHA = 2.5  # alphabetic-character ratio
QL_W_STOP = 3.0  # stopword ratio (fluent prose signal)
QL_W_DUP = -2.5  # duplicate-token ratio (boilerplate penalty)


@register(
    "tx14_quality_logit",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lower(text) AS lt,
               str_split(lower(text), ' ') AS tk
        FROM documents
    ), z AS (
        SELECT doc_id,
               {QL_BIAS}
               + {QL_W_LOGTOK} * LN(LEN(tk))
               + {QL_W_MEANLEN} * (CAST(LENGTH(replace(lt, ' ', ''))
                                        AS DOUBLE) / LEN(tk))
               + {QL_W_ALPHA} * (CAST(LENGTH(regexp_replace(
                                     lt, '[^a-z]', '', 'g')) AS DOUBLE)
                                 / LENGTH(lt))
               + {QL_W_STOP} * (CAST(LEN(list_filter(tk,
                                    x -> list_contains(
                                        {_GQ_STOPWORDS!r}, x))) AS DOUBLE)
                                / LEN(tk))
               + {QL_W_DUP} * (1.0 - CAST(LEN(list_distinct(tk))
                                          AS DOUBLE) / LEN(tk))
               AS z
        FROM t
    )
    SELECT doc_id, ROUND(z, 6) AS logit,
           ROUND(1.0 / (1.0 + EXP(-z)), 6) AS prob,
           z >= 0 AS keep
    FROM z
    """,
)
def tx14_quality_logit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring — the fasttext/CCNet-style learned
    quality classifier step that follows tx8's heuristic gates in a
    production corpus pipeline: a logistic score over the same five
    document features (log token count, mean token length, alphabetic
    ratio, stopword ratio, duplicate-token ratio), with the keep
    decision at P >= 0.5 (equivalently logit >= 0, so the boolean is
    decided on exact sign, never on a rounded float).

    Reference parity: extension X4 scope (SURVEY §2h); the weights are
    documented stand-ins — swapping in trained coefficients changes
    literals only, not the plan.

    Shape: pure per-row expression arithmetic — one scan, zero
    shuffles, zero Python, whole-stage codegen end to end; identical
    at any corpus size (the 100 TB plan is this plan). The logistic
    uses exp() from each engine's libm; ROUND(6) absorbs the <=1-ulp
    divergence (rk5 precedent)."""
    docs = load_table(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    tk = F.split(low, " ")
    n = F.size(tk)
    mean_len = F.length(F.regexp_replace(low, " ", "")).cast("double") / n
    alpha = (
        F.length(F.regexp_replace(low, "[^a-z]", "")).cast("double")
        / F.length(low)
    )
    stop_arr = F.array(*[F.lit(w) for w in _GQ_STOPWORDS])
    stop_ratio = (
        F.size(F.filter(tk, lambda x: F.array_contains(stop_arr, x))).cast(
            "double"
        )
        / n
    )
    dup_ratio = F.lit(1.0) - F.size(F.array_distinct(tk)).cast("double") / n
    z = (
        F.lit(QL_BIAS)
        + F.lit(QL_W_LOGTOK) * F.log(n.cast("double"))
        + F.lit(QL_W_MEANLEN) * mean_len
        + F.lit(QL_W_ALPHA) * alpha
        + F.lit(QL_W_STOP) * stop_ratio
        + F.lit(QL_W_DUP) * dup_ratio
    )
    return docs.select(
        "doc_id",
        F.round(z, 6).alias("logit"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("prob"),
        (z >= 0).alias("keep"),
    )


TX15_K = 3  # keywords per document


@register(
    "tx15_tfidf_keywords",
    oracle=f"""
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
    ), scored AS (
        SELECT tf.doc_id, tf.term,
               ROUND(tf * LN(n_docs / df), 4) AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN stats
    )
    SELECT doc_id, kw_rank, term, tfidf FROM (
        SELECT doc_id, term, tfidf,
               ROW_NUMBER() OVER (
                   PARTITION BY doc_id
                   ORDER BY tfidf DESC, term ASC
               ) AS kw_rank
        FROM scored
    ) WHERE kw_rank <= {TX15_K}
    """,
)
def tx15_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document KEYWORD EXTRACTION: each doc's top-{TX15_K} terms by
    TF-IDF — the classic unsupervised tagger (search snippets, topic
    hints, weak labels for classifier bootstrapping) composed directly
    on rk2's posting relation semantics. Ranking happens on the
    PUBLISHED ROUND(tfidf, 4) value with the term string as
    tie-break (the rk5 rule: never rank cross-engine on an unrounded
    float — two engines' ln ulps would disagree exactly at ties, and a
    31-word vocabulary over uniform docs produces plenty of equal
    scores).

    Shape: one explode + (term, doc) count — the only corpus-wide
    exchange, map-side combined — a broadcast vocabulary-sized df
    join, then a top-k window partitioned BY DOC (each frame is the
    doc's distinct-term list, bounded by doc length — never a global
    or vocabulary-wide frame). Output is exactly {TX15_K} rows per
    doc."""
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
    from pyspark.sql import Window

    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.select(
            "doc_id", "term", "tfidf", F.row_number().over(w).alias("kw_rank")
        )
        .filter(F.col("kw_rank") <= TX15_K)
        .select("doc_id", "kw_rank", "term", "tfidf")
    )


# --- tx16: code detection ----------------------------------------------------

# weights documented stand-ins (tx14's rule): a production classifier
# (e.g. the StarCoder/The-Stack filters) is a trained model; the FEATURE
# EXTRACTION is the Spark-side work and is what's pinned here.
CD_SYMBOLS = ["{", "}", "(", ")", ";", "=", "<", ">", "[", "]"]
CD_KEYWORDS = ["def ", "return ", "void ", "import ", "class ", "#include"]
CD_W_SYMBOL = 12.0
CD_W_KEYWORD = 2.0
CD_BIAS = -1.5


def _tx16_oracle() -> str:
    sym = " + ".join(
        "(LENGTH(text) - LENGTH(REPLACE(text, '%s', '')))" % s
        for s in CD_SYMBOLS
    )
    kw = " + ".join(
        f"(LENGTH(lt) - LENGTH(REPLACE(lt, '{k}', ''))) / {len(k)}"
        for k in CD_KEYWORDS
    )
    return f"""
    WITH f AS (
        SELECT doc_id, lower(text) AS lt, LENGTH(text) AS n,
               {sym} AS n_symbols
        FROM documents
    ), g AS (
        SELECT doc_id, n, n_symbols,
               CAST({kw} AS BIGINT) AS n_keywords
        FROM f
    )
    SELECT doc_id, n_symbols, n_keywords,
           ROUND(CASE WHEN n > 0 THEN {CD_BIAS!r}::DOUBLE
                 + {CD_W_SYMBOL!r}::DOUBLE * n_symbols / n
                 + {CD_W_KEYWORD!r}::DOUBLE * n_keywords
                 ELSE 0.0 END, 6) AS code_score,
           (CASE WHEN n > 0 THEN {CD_BIAS!r}::DOUBLE
            + {CD_W_SYMBOL!r}::DOUBLE * n_symbols / n
            + {CD_W_KEYWORD!r}::DOUBLE * n_keywords
            ELSE 0.0 END) > 0.0 AS is_code
    FROM g
    """


@register("tx16_code_detection", oracle=_tx16_oracle())
def tx16_code_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose detection (The-Stack-style corpus routing): exact
    integer counts of code-indicative symbols and keyword occurrences
    (each via the LENGTH-REPLACE identity — scan-local, no
    tokenization), combined by a documented stand-in linear model; the
    keep decision is the exact logit SIGN (tx14's rule — never a
    rounded float). A training pipeline routes is_code docs to the
    code subcorpus / a different quality gate.

    Shape: one scan, zero shuffles, whole-stage codegen string ops —
    identical plan class to tx8/tx14. At 100 TB this runs inside the
    same pass as the other per-doc gates."""
    docs = load_table(spark, sf_dir, "documents")
    lt = F.lower(F.col("text"))
    n_symbols = None
    for s in CD_SYMBOLS:
        term = F.length("text") - F.length(F.replace(F.col("text"), F.lit(s)))
        n_symbols = term if n_symbols is None else n_symbols + term
    n_keywords = None
    for k in CD_KEYWORDS:
        term = (
            (F.length(lt) - F.length(F.replace(lt, F.lit(k)))) / len(k)
        )
        n_keywords = term if n_keywords is None else n_keywords + term
    # empty documents: n=0 would make the logit NaN (and NaN > 0 is
    # true in both Spark and DuckDB, silently classifying empties as
    # code) — gate them to score 0.0 / is_code=false in both engines
    score = F.when(
        F.length("text") > 0,
        F.lit(CD_BIAS)
        + F.lit(CD_W_SYMBOL) * n_symbols / F.length("text")
        + F.lit(CD_W_KEYWORD) * n_keywords.cast("long"),
    ).otherwise(F.lit(0.0))
    return docs.select(
        "doc_id",
        n_symbols.alias("n_symbols"),
        n_keywords.cast("long").alias("n_keywords"),
        F.round(score, 6).alias("code_score"),
        (score > 0.0).alias("is_code"),
    )


@register(
    "lm6_tokenizer_fertility",
    oracle=f"""
    WITH t AS (
        SELECT lang,
               LEN(str_split(lower(text), ' ')) AS ws,
               LEN(regexp_extract_all(lower(text), '{BPE_PATTERN}')) AS bpe,
               LENGTH(replace(lower(text), ' ', '')) AS chars
        FROM documents
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(ws) AS BIGINT) AS n_ws_tokens,
           CAST(SUM(bpe) AS BIGINT) AS n_bpe_tokens,
           ROUND(CAST(SUM(bpe) AS DOUBLE) / SUM(ws), 6) AS fertility,
           ROUND(CAST(SUM(chars) AS DOUBLE) / SUM(bpe), 6)
               AS chars_per_token
    FROM t GROUP BY lang
    """,
)
def lm6_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKENIZER FERTILITY per language (the mT5/XLM-R tokenizer-equity
    audit): BPE-piece count over whitespace-word count and characters
    per BPE piece, aggregated per lang — the numbers that reveal a
    tokenizer taxing some languages 2-4x more pieces per word than
    others, which silently skews any token-budgeted data mix (pp1/pp4
    budgets) against them. Uses tx7's regex pre-tokenizer as the
    engine-neutral stand-in for the trained segmenter (the bpe cache
    variant is `clean_corpus(token_counter='bpe')`'s path).

    Shape: scan-local counting (JVM regexp codegen) into one
    O(languages) aggregate; sums are exact integers, the two ratios
    are single divisions — hash-exact. At 100 TB this shares the pass
    that computes every other per-doc gate."""
    docs = load_table(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    ws = F.size(F.split(low, " "))
    bpe = F.size(F.regexp_extract_all(low, F.lit(BPE_PATTERN), 0))
    chars = F.length(F.replace(low, F.lit(" ")))
    return (
        docs.select("lang", ws.alias("ws"), bpe.alias("bpe"), chars.alias("chars"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws").alias("n_ws_tokens"),
            F.sum("bpe").alias("n_bpe_tokens"),
            F.round(F.sum("bpe") / F.sum("ws"), 6).alias("fertility"),
            F.round(F.sum("chars") / F.sum("bpe"), 6).alias(
                "chars_per_token"
            ),
        )
    )


def _gram_list_sql(n: int) -> str:
    """DuckDB n-gram OCCURRENCE list over tk, replicating the Spark
    zip-trick's short-document edge (a doc with < n tokens yields its
    one partial gram)."""
    return (
        f"list_transform(range(1, GREATEST(LEN(tk)-{n - 1}, 1) + 1), "
        f"i -> array_to_string(tk[i:LEAST(i+{n - 1}, LEN(tk))], ' '))"
    )


@register(
    "tx17_repetition_ratios",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, str_split(lower(text), ' ') AS tk FROM documents
    ), g AS (
        SELECT doc_id, 2 AS n, UNNEST({_gram_list_sql(2)}) AS gram FROM t
        UNION ALL
        SELECT doc_id, 3 AS n, UNNEST({_gram_list_sql(3)}) AS gram FROM t
    ), c AS (
        SELECT doc_id, n, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2, 3
    ), p AS (
        SELECT doc_id, n,
               CAST(SUM(cnt) AS BIGINT) AS total,
               CAST(MAX(cnt) AS BIGINT) AS top,
               CAST(SUM(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS BIGINT)
                   AS dup
        FROM c GROUP BY 1, 2
    )
    SELECT doc_id,
           MAX(CASE WHEN n = 2 THEN total END) AS n_2grams,
           ROUND(1.0 * MAX(CASE WHEN n = 2 THEN top END)
                 / MAX(CASE WHEN n = 2 THEN total END), 6)
               AS top_2gram_share,
           MAX(CASE WHEN n = 3 THEN total END) AS n_3grams,
           ROUND(1.0 * MAX(CASE WHEN n = 3 THEN dup END)
                 / MAX(CASE WHEN n = 3 THEN total END), 6)
               AS dup_3gram_frac
    FROM p GROUP BY doc_id
    """,
)
def tx17_repetition_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GOPHER REPETITION SIGNALS (Rae et al. §A1.1 — the rules tx8's
    length/alpha/stopword heuristics don't cover): per document, the
    share of 2-gram occurrences taken by the single most frequent
    2-gram (top_2gram_share; boilerplate headers blow this up) and the
    fraction of 3-gram occurrences whose 3-gram repeats within the doc
    (dup_3gram_frac; loops and template spam). Gopher gates at
    top-2gram share > 0.20 and dup-3gram fraction > 0.18 — consumers
    apply thresholds downstream; the published relation is the exact
    integer counts plus the two ratios.

    Shape: grams come from dd8's zip-of-shifted-slices trick (NOT
    transform(sequence) — the tx10 O(n²) trap), tagged by gram size,
    one (doc, n, gram) hash aggregate with map-side combine, one
    per-doc conditional rollup. Linear in corpus tokens; no windows,
    no joins."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()

    def grams(n: int):
        width = F.greatest(F.size(toks) - (n - 1), F.lit(1))
        zipped = F.arrays_zip(
            *[F.slice(toks, k + 1, width).alias(f"w{k}") for k in range(n)]
        )
        return F.transform(
            zipped,
            lambda s: F.concat_ws(" ", *[s[f"w{k}"] for k in range(n)]),
        )

    e = docs.select(
        "doc_id", F.lit(2).alias("n"), F.explode(grams(2)).alias("gram")
    ).unionAll(
        docs.select(
            "doc_id", F.lit(3).alias("n"), F.explode(grams(3)).alias("gram")
        )
    )
    c = e.groupBy("doc_id", "n", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    p = c.groupBy("doc_id", "n").agg(
        F.sum("cnt").alias("total"),
        F.max("cnt").alias("top"),
        F.sum(F.when(F.col("cnt") >= 2, F.col("cnt")).otherwise(0)).alias(
            "dup"
        ),
    )

    def pick(n: int, col: str):
        return F.max(F.when(F.col("n") == n, F.col(col)))

    return p.groupBy("doc_id").agg(
        pick(2, "total").alias("n_2grams"),
        F.round(F.lit(1.0) * pick(2, "top") / pick(2, "total"), 6).alias(
            "top_2gram_share"
        ),
        pick(3, "total").alias("n_3grams"),
        F.round(F.lit(1.0) * pick(3, "dup") / pick(3, "total"), 6).alias(
            "dup_3gram_frac"
        ),
    )


# --- tx18: lexical diversity ---------------------------------------------------


@register(
    "tx18_lexical_diversity",
    oracle="""
    WITH t AS (
        SELECT doc_id, list_sort(str_split(lower(text), ' ')) AS s
        FROM documents
    ), m AS (
        SELECT doc_id, LEN(s) AS n_tokens,
               LEN(list_filter(generate_series(1, LEN(s)), i ->
                   i = 1 OR s[i] != s[GREATEST(i - 1, 1)])) AS n_types,
               LEN(list_filter(generate_series(1, LEN(s)), i ->
                   (i = 1 OR s[i] != s[GREATEST(i - 1, 1)])
                   AND (i = LEN(s)
                        OR s[i] != s[LEAST(i + 1, LEN(s))]))) AS n_hapax
        FROM t
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_types AS BIGINT) AS n_types,
           CAST(n_hapax AS BIGINT) AS n_hapax,
           ROUND(1.0 * n_types / n_tokens, 6) AS type_token_ratio,
           ROUND(1.0 * n_hapax / n_types, 6) AS hapax_frac
    FROM m
    """,
)
def tx18_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEXICAL DIVERSITY per document: type-token ratio (distinct
    tokens / tokens) and hapax fraction (share of types occurring
    exactly once) — the vocabulary-richness signals quality pipelines
    use alongside tx8/tx17's repetition gates: machine-generated spam
    and keyword-stuffed SEO pages sit at the extremes of both, while
    the repetition ratios only catch the low-TTR half. Published as
    exact integer counts plus the two ratios (thresholds downstream,
    tx14's rule).

    Shape: ZERO shuffle — the token list is sorted per row
    (sort_array) and types/hapax fall out of counting run boundaries
    in the sorted list (element i starts a run iff s[i] != s[i-1]; a
    run has length 1 iff it starts at i and another starts at i+1),
    all inside one projection over the scan. Neighbor probes clamp
    the index with greatest/least instead of relying on OR
    short-circuit, since element_at(s, 0) raises in Spark and both
    engines evaluate vectorized. At 100 TB this rides the same
    single-pass per-doc gate stage as tx4/tx8/tx16/tx17."""
    docs = load_table(spark, sf_dir, "documents")
    s = F.col("s")
    n = F.size(s)
    idx = F.sequence(F.lit(1), n)  # split() never yields an empty list

    def el(i):
        return F.element_at(s, i.cast("int"))

    def starts_run(i):
        return (i == 1) | (el(i) != el(F.greatest(i - 1, F.lit(1))))

    def ends_run(i):
        return (i == n) | (el(i) != el(F.least(i + 1, n)))

    sorted_docs = docs.select("doc_id", F.sort_array(_tokens()).alias("s"))
    return sorted_docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.size(F.filter(idx, starts_run)).cast("long").alias("n_types"),
        F.size(
            F.filter(idx, lambda i: starts_run(i) & ends_run(i))
        ).cast("long").alias("n_hapax"),
    ).select(
        "doc_id",
        "n_tokens",
        "n_types",
        "n_hapax",
        F.round(F.lit(1.0) * F.col("n_types") / F.col("n_tokens"), 6).alias(
            "type_token_ratio"
        ),
        F.round(F.lit(1.0) * F.col("n_hapax") / F.col("n_types"), 6).alias(
            "hapax_frac"
        ),
    )


# --- lm7: Zipf slope ------------------------------------------------------------

LM7_V = 500  # top-V ranks fitted per language


@register(
    "lm7_zipf_slope",
    oracle=f"""
    WITH tok AS (
        SELECT lang, UNNEST(str_split(lower(text), ' ')) AS w
        FROM documents
    ), freq AS (
        SELECT lang, w, COUNT(*) AS f FROM tok GROUP BY 1, 2
    ), ranked AS (
        SELECT lang, f,
               ROW_NUMBER() OVER (
                   PARTITION BY lang ORDER BY f DESC, w ASC
               ) AS r
        FROM freq
    ), pts AS (
        SELECT lang, LN(CAST(r AS DOUBLE)) AS x, LN(CAST(f AS DOUBLE)) AS y
        FROM ranked WHERE r <= {LM7_V}
    ), s AS (
        SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        FROM pts GROUP BY lang
    )
    SELECT lang, CAST(n AS BIGINT) AS n_ranks,
           CASE WHEN (n * sxx - sx * sx) <> 0 THEN
               ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
           END AS zipf_slope,
           CASE WHEN (n * sxx - sx * sx) <> 0 THEN
               ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                     / n, 6)
           END AS zipf_intercept,
           CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) <> 0 THEN
               ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
                     / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
           END AS r2
    FROM s
    """,
)
def lm7_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIPF-LAW FIT per language: OLS slope/intercept/r² of
    ln(frequency) against ln(rank) over the top-{LM7_V} token ranks —
    the corpus-health diagnostic that separates natural language
    (slope ≈ -1, high r²) from template spam, boilerplate floods and
    synthetic filler, and the sanity check on any source mix change
    (a pp4/smp6 rebalance shouldn't move a language's slope). The
    closed-form OLS keeps it one aggregate — no iterative fitting.

    Shape: explode → (lang, token) hash agg with map-side combine
    (the tx3 vocabulary-build stage), a per-lang rank Spark plans as a
    group-limit (never a corpus sort), then a |langs|-row moment
    aggregate. The ln() points and OLS moments are identical operand
    streams in both engines (smp4/lm2's libm-parity precedent); sums
    reassociate at ulp scale only, absorbed by ROUND(·, 6)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select("lang", F.explode(_tokens()).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    rw = Window.partitionBy("lang").orderBy(F.desc("f"), F.asc("w"))
    pts = (
        freq.select("lang", "f", "w", F.row_number().over(rw).alias("r"))
        .filter(F.col("r") <= LM7_V)
        .select(
            "lang",
            F.log(F.col("r").cast("double")).alias("x"),
            F.log(F.col("f").cast("double")).alias("y"),
        )
    )
    s = pts.groupBy("lang").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    # Degenerate-fit guard (ADVICE r8): a language whose top-V holds a
    # single rank (den_x = 0) or constant frequencies (den_y = 0) has no
    # OLS fit — Spark's double/0 yields NaN/±Infinity while DuckDB may
    # differ, so BOTH engines emit NULL (the CASE in the oracle above).
    den_x = n * sxx - sx * sx
    den_y = n * syy - sy * sy
    # slope is NULL when den_x = 0, and NULL propagates through the
    # intercept arithmetic, matching the oracle's paired CASE arms
    slope = F.when(den_x != 0, (n * sxy - sx * sy) / den_x)
    return s.select(
        "lang",
        n.cast("long").alias("n_ranks"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy - slope * sx) / n, 6).alias("zipf_intercept"),
        F.round(
            F.when(
                den_x * den_y != 0,
                (n * sxy - sx * sy) * (n * sxy - sx * sy) / (den_x * den_y),
            ),
            6,
        ).alias("r2"),
    )
