"""Scalar-function coverage: string / datetime / array / math-conditional
expression surfaces, each as a pure projection (no shuffle) so the whole
query is a single WholeStageCodegen scan→project pipeline.

The reference delegates all scalar evaluation to Postgres/Redshift and
itself uses only pandas dtype coercion + tz-strip + date() (SURVEY.md
§2c, reference dags/airflow_dags.py:45-49); a complete engine needs the
full expression surface, so these queries pin the cross-engine semantics
of ~40 built-ins against the DuckDB oracle. Engine-divergent functions
are normalized in BOTH programs (documented per query) rather than
avoided: ceil/floor→BIGINT, dayofweek origin, float32→double before
arithmetic.

At 100 TB these all stay in codegen on the scan — zero exchanges, and
unused document/event columns are pruned at the parquet reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_project_spark.catalog import load_table
from etl_project_spark.registry import register


@register(
    "fn1_string_funcs",
    oracle="""
    SELECT doc_id,
           LENGTH(text) AS n_len,
           UPPER(lang) AS lang_up,
           SUBSTR(text, 1, 24) AS head24,
           REPLACE(SUBSTR(text, 1, 24), ' ', '_') AS head24_us,
           LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
           STRPOS(text, 'data') AS data_pos,
           LPAD(lang, 5, '*') AS lang_pad,
           REVERSE(source) AS source_rev,
           LEVENSHTEIN(lang, source) AS lev,
           CONCAT_WS('-', lang, source) AS lang_src,
           TRIM(CONCAT('  ', lang, ' ')) AS lang_trim,
           REGEXP_EXTRACT(text, '([a-z]+)', 1) AS first_word,
           MD5(text) AS text_md5
    FROM documents
    """,
)
def fn1_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String expression surface over documents: length/case/substr/
    replace/split/search/pad/reverse/edit-distance/concat/trim/regex/
    hash. Spark instr == DuckDB strpos (1-based, 0 when absent); both
    regexp_extract return group 1 of the first match; md5 is lowercase
    hex in both."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length("text").alias("n_len"),
        F.upper("lang").alias("lang_up"),
        F.substring("text", 1, 24).alias("head24"),
        F.replace(
            F.substring("text", 1, 24), F.lit(" "), F.lit("_")
        ).alias("head24_us"),
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.instr("text", "data").alias("data_pos"),
        F.lpad("lang", 5, "*").alias("lang_pad"),
        F.reverse("source").alias("source_rev"),
        F.levenshtein("lang", "source").alias("lev"),
        F.concat_ws("-", "lang", "source").alias("lang_src"),
        F.trim(F.concat(F.lit("  "), F.col("lang"), F.lit(" "))).alias("lang_trim"),
        F.regexp_extract("text", r"([a-z]+)", 1).alias("first_word"),
        F.md5("text").alias("text_md5"),
    )


@register(
    "fn2_datetime_funcs",
    oracle="""
    SELECT event_id,
           CAST(EXTRACT(year FROM ts) AS INT) AS y,
           CAST(EXTRACT(month FROM ts) AS INT) AS mo,
           CAST(EXTRACT(day FROM ts) AS INT) AS d,
           CAST(EXTRACT(hour FROM ts) AS INT) AS h,
           CAST(EXTRACT(minute FROM ts) AS INT) AS mi,
           CAST(EXTRACT(quarter FROM ts) AS INT) AS q,
           CAST(DAYOFWEEK(ts) + 1 AS INT) AS dow,
           CAST(DAYOFYEAR(ts) AS INT) AS doy,
           DATE_TRUNC('day', ts) AS day_start,
           DATE_TRUNC('week', ts) AS week_start,
           CAST(CAST(ts AS DATE) + 7 AS VARCHAR) AS plus_week,
           CAST(LAST_DAY(CAST(ts AS DATE)) AS VARCHAR) AS month_end,
           CAST(DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT)
               AS days_in,
           STRFTIME(ts, '%Y-%m-%d %H') AS hour_key
    FROM events
    """,
)
def fn2_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime expression surface over events: extract fields, truncate,
    date arithmetic, formatting. Engine-origin differences normalized in
    the oracle: DuckDB dayofweek is 0=Sunday vs Spark 1=Sunday (+1);
    EXTRACT returns BIGINT vs Spark INT (cast); Spark date_format
    pattern 'yyyy-MM-dd HH' == strftime '%Y-%m-%d %H'."""
    e = load_table(spark, sf_dir, "events")
    d = F.to_date("ts")
    return e.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.quarter("ts").alias("q"),
        F.dayofweek("ts").alias("dow"),
        F.dayofyear("ts").alias("doy"),
        F.date_trunc("day", "ts").alias("day_start"),
        F.date_trunc("week", "ts").alias("week_start"),
        F.date_add(d, 7).cast("string").alias("plus_week"),
        F.last_day(d).cast("string").alias("month_end"),
        F.datediff(d, F.lit("2024-01-01").cast("date")).alias("days_in"),
        F.date_format("ts", "yyyy-MM-dd HH").alias("hour_key"),
    )


@register(
    "fn3_array_funcs",
    oracle="""
    SELECT vec_id,
           LEN(embedding) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 4) AS e1,
           ARRAY_TO_STRING(
               LIST_TRANSFORM(embedding[1:4],
                              x -> CAST(CAST(ROUND(CAST(x AS DOUBLE) * 2.0, 4)
                                             AS DECIMAL(14,4)) AS VARCHAR)),
               ',') AS head2x,
           LEN(LIST_FILTER(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)),
                           x -> x > 0.0)) AS n_pos,
           ROUND(LIST_MAX(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))), 4)
               AS mx,
           ROUND(LIST_MIN(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))), 4)
               AS mn,
           ROUND(REDUCE(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)),
                        (a, b) -> a + b), 4) AS s
    FROM embeddings
    """,
)
def fn3_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array / higher-order function surface over embeddings: size,
    element access, slice+transform, filter+count, max/min, fold.
    float32 elements are cast to DOUBLE in BOTH engines before any
    arithmetic so results are bit-identical (left-to-right double
    addition in both folds), then rounded for canonical display.
    DuckDB list slicing arr[1:4] == Spark slice(arr, 1, 4) (1-based,
    4 elements). head2x goes out as a comma-joined string of
    DECIMAL(14,4) renderings — raw array cells crash the driver's
    pandas canonicalizer, and decimal formatting (unlike double→string)
    is digit-identical across engines (no scientific notation)."""
    em = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    return em.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("e1"),
        F.array_join(
            F.transform(
                F.slice("embedding", 1, 4),
                lambda x: F.round(x.cast("double") * 2.0, 4)
                .cast("decimal(14,4)")
                .cast("string"),
            ),
            ",",
        ).alias("head2x"),
        F.size(F.filter(dbl, lambda x: x > 0.0)).alias("n_pos"),
        F.round(F.array_max(dbl), 4).alias("mx"),
        F.round(F.array_min(dbl), 4).alias("mn"),
        F.round(
            F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x), 4
        ).alias("s"),
    )


@register(
    "fn4_math_conditional",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_extendedprice - 30000.0) AS dev,
           ROUND(l_extendedprice / 1000.0, 1) AS price_k,
           CAST(CEIL(l_quantity) AS BIGINT) AS q_ceil,
           CAST(FLOOR(l_quantity) AS BIGINT) AS q_floor,
           ROUND(SQRT(l_extendedprice), 4) AS price_sqrt,
           ROUND(POWER(l_discount, 2), 8) AS disc_sq,
           ROUND(EXP(l_discount), 6) AS disc_exp,
           ROUND(LN(l_extendedprice + 1.0), 6) AS price_ln,
           CAST(SIGN(l_extendedprice - 30000.0) AS DOUBLE) AS dev_sign,
           l_linenumber % 3 AS ln_mod,
           GREATEST(l_tax, l_discount) AS rate_hi,
           LEAST(l_tax, l_discount) AS rate_lo,
           COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none,
           CASE WHEN l_quantity > 25 THEN 'bulk'
                WHEN l_quantity > 10 THEN 'mid'
                ELSE 'small' END AS qty_band
    FROM lineitem
    """,
)
def fn4_math_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + conditional expression surface over lineitem: abs/round/
    ceil/floor/sqrt/power/exp/ln/sign/mod plus greatest/least/coalesce/
    nullif/case. Spark ceil returns LONG while DuckDB returns DOUBLE
    (oracle casts); transcendentals (exp/ln) are rounded to 6 decimals
    — libm implementations may differ in the final ulp."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(price - 30000.0).alias("dev"),
        F.round(price / 1000.0, 1).alias("price_k"),
        F.ceil("l_quantity").alias("q_ceil"),
        F.floor("l_quantity").alias("q_floor"),
        F.round(F.sqrt(price), 4).alias("price_sqrt"),
        F.round(F.pow("l_discount", F.lit(2)), 8).alias("disc_sq"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.round(F.log(price + 1.0), 6).alias("price_ln"),
        F.signum(price - 30000.0).alias("dev_sign"),
        (F.col("l_linenumber") % 3).alias("ln_mod"),
        F.greatest("l_tax", "l_discount").alias("rate_hi"),
        F.least("l_tax", "l_discount").alias("rate_lo"),
        F.coalesce(
            F.nullif("l_returnflag", F.lit("N")), F.lit("none")
        ).alias("flag_or_none"),
        F.when(F.col("l_quantity") > 25, "bulk")
        .when(F.col("l_quantity") > 10, "mid")
        .otherwise("small")
        .alias("qty_band"),
    )


@register(
    "fn5_map_funcs",
    oracle="""
    WITH t AS (
        SELECT doc_id, str_split(lower(text), ' ') AS tk FROM documents
    ), c AS (
        SELECT doc_id, term, COUNT(*) AS cnt
        FROM t, UNNEST(tk) AS u(term)
        GROUP BY doc_id, term
    )
    SELECT doc_id,
           CAST(COUNT(*) AS INT) AS n_distinct,
           CAST(SUM(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS INT)
               AS n_repeated,
           CAST(COALESCE(MAX(CASE WHEN term = 'data' THEN cnt END), 0)
                AS BIGINT) AS data_count,
           CAST(MAX(cnt) AS BIGINT) AS max_count
    FROM c GROUP BY doc_id
    """,
)
def fn5_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType expression surface (the one complex type fn1-fn4 leave
    untouched): each document's token→count MAP is built with
    map_from_entries, then interrogated with size / map_filter /
    element_at / map_values + array_max — the JVM map-expression
    family a feature store leans on for sparse per-entity features.
    Only SCALARS are published (map cells would crash the driver's
    pandas canonicalizer — the round-2 dd5 lesson), and every scalar
    is an exact integer; the oracle re-derives them relationally from
    the token multiset, proving the map semantics rather than echoing
    them.

    Shape: one explode + (doc, term) count (map-side combine), one
    per-doc map_from_entries aggregate — entry ORDER inside the map is
    collection-order-dependent and deliberately never published. All
    map interrogation is scan-local JVM expression work."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    m = F.map_from_entries(
        F.collect_list(F.struct(F.col("term"), F.col("cnt")))
    )
    per_doc = counts.groupBy("doc_id").agg(m.alias("m"))
    return per_doc.select(
        "doc_id",
        F.size("m").alias("n_distinct"),
        F.size(
            F.map_filter(F.col("m"), lambda k, v: v >= 2)
        ).alias("n_repeated"),
        F.coalesce(
            F.element_at(F.col("m"), F.lit("data")), F.lit(0).cast("long")
        ).alias("data_count"),
        F.array_max(F.map_values("m")).alias("max_count"),
    )
