"""Shared differential-test helper: Spark result vs DuckDB oracle on the
same parquet corpus (the driver's comparison, in miniature)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from etl_project_spark.catalog import TABLES


def duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "\\N"
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    return sorted(
        tuple(canon_cell(row[c]) for c in cols) for _, row in pdf[cols].iterrows()
    )


def assert_matches_oracle(sdf, oracle_sql: str, sf_dir: str) -> None:
    spdf = sdf.toPandas()
    con = duck(sf_dir)  # must outlive the relation: relations weakly
    opdf = con.sql(oracle_sql).df()  # reference their connection
    con.close()
    assert len(spdf) == len(opdf), f"rowcount {len(spdf)} != {len(opdf)}"
    assert sorted(spdf.columns) == sorted(opdf.columns)
    assert canon(spdf) == canon(opdf)
