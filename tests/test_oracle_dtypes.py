"""Registry-wide oracle dtype sweep — the HUGEINT hazard gate.

DuckDB's ``SUM(<integer>)`` (and integer ``//`` over its result) returns
HUGEINT, which ``duckdb.df()`` lands in pandas as **float64**, while the
Spark side emits int64. The driver's canonicalizer hashes ``6.0`` vs
``6`` differently, so the pair rows-match, schema-match, and still
hash-FAIL (round-3 bpe1/pp1/pp3/pp4/lm1/dq1). This test runs every
registered oracle through ``duckdb.df()`` at sf0.001 and asserts that
integral-ness agrees column-by-column with the Spark result schema:

- Spark integral (byte/short/int/long)  -> oracle dtype must not be float
- Spark float/double                    -> oracle dtype must not be integer

Either direction breaks the driver hash even when every value is equal.
"""

from __future__ import annotations

import duckdb
import pytest

from etl_project_spark import registry
from etl_project_spark.catalog import TABLES

SF_DIR = "/root/testdata/sf0.001"

@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _oracle_specs():
    registry._ensure_loaded()
    out = []
    for name in registry._canonical_names():
        spec = registry.get(name)
        for kind, sql in (("oracle", spec.oracle),
                          ("approx_oracle", spec.approx_oracle)):
            if sql is not None:
                out.append(pytest.param(name, sql, id=f"{name}:{kind}"))
    return out


@pytest.mark.parametrize("name,sql", _oracle_specs())
def test_oracle_integralness_matches_spark(name, sql, duck, spark):
    # Compare PANDAS dtypes on both sides — exactly what the driver
    # hashes. (Comparing the Spark *schema* instead false-positives on
    # nullable int columns: both engines land those as float64, which
    # hashes fine.)
    spec = registry.get(name)
    spdf = spec.fn(spark, SF_DIR).toPandas()
    opdf = duck.sql(sql).df()
    assert sorted(opdf.columns) == sorted(spdf.columns), (
        f"{name}: column sets differ: oracle={sorted(opdf.columns)} "
        f"spark={sorted(spdf.columns)}"
    )
    for col in opdf.columns:
        sk = spdf[col].dtype.kind  # i/u int, f float, O object, b bool...
        ok = opdf[col].dtype.kind
        if sk in "iu":
            assert ok != "f", (
                f"{name}.{col}: Spark lands as {spdf[col].dtype} but the "
                f"oracle lands as float64 in pandas (DuckDB HUGEINT "
                f"hazard) — wrap the oracle expression in "
                f"CAST(... AS BIGINT)"
            )
        elif sk == "f":
            assert ok not in "iu", (
                f"{name}.{col}: Spark lands as {spdf[col].dtype} but the "
                f"oracle lands as {opdf[col].dtype} — the driver hashes "
                f"6.0 vs 6 differently; CAST the oracle column to DOUBLE"
            )
