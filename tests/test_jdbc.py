"""Live JDBC round-trip (S3 scan + K1 append sink) against embedded
Derby — the in-process database Spark already ships for its Hive
metastore, so the JDBC code paths run for real instead of being trusted.

Reference legs: dags/airflow_dags.py:52-54 (to_sql append) and :61-66
(pandas read_sql with a WHERE predicate)."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_project_spark.sources.files import read_jdbc, write_jdbc_append

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _url(tmp_path):
    return f"jdbc:derby:{tmp_path}/derbydb;create=true"


def test_jdbc_roundtrip_and_pushdown(spark, tmp_path):
    url = _url(tmp_path)
    src = spark.createDataFrame(
        [(i, f"coin{i % 3}", float(i) * 1.5) for i in range(100)],
        "id bigint, coin string, price double",
    )
    # Derby maps StringType -> CLOB (not comparable/groupable); pin VARCHAR
    write_jdbc_append(
        src, url, "ohlcv", driver=DRIVER,
        createTableColumnTypes="coin VARCHAR(32)",
    )
    # append twice -> rows accumulate (the reference's if_exists='append')
    write_jdbc_append(src.filter(F.col("id") < 10), url, "ohlcv", driver=DRIVER)

    back = read_jdbc(spark, url, "ohlcv", driver=DRIVER)
    assert back.count() == 110
    assert dict(back.dtypes) == {"id": "bigint", "coin": "string", "price": "double"}

    # predicate pushdown: the filter must reach the JDBC scan, not Spark
    filtered = back.filter(F.col("id") >= 90)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "id" in plan.split("PushedFilters")[1][:120]
    assert filtered.count() == 10

    # query-shaped scan (the reference's read_sql SELECT ... WHERE day=...)
    # Derby uppercases unquoted identifiers, so quote the Spark-written
    # lowercase column names inside raw SQL
    q = '(SELECT "coin", COUNT(*) AS "n" FROM ohlcv GROUP BY "coin") t'
    agg = {r["coin"]: r["n"] for r in read_jdbc(spark, url, q, driver=DRIVER).collect()}
    assert agg == {"coin0": 38, "coin1": 36, "coin2": 36}


def test_jdbc_parallel_partitioned_read(spark, tmp_path):
    url = _url(tmp_path)
    src = spark.createDataFrame(
        [(i, float(i)) for i in range(1000)], "id bigint, v double"
    )
    write_jdbc_append(src, url, "wide", driver=DRIVER)
    par = read_jdbc(
        spark,
        url,
        "wide",
        driver=DRIVER,
        partitionColumn="id",
        lowerBound="0",
        upperBound="1000",
        numPartitions="4",
    )
    assert par.rdd.getNumPartitions() == 4
    assert par.agg(F.sum("v")).first()[0] == sum(range(1000))
