"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given sf dir, runs
the paired ``oracle_sql()`` in DuckDB over the same parquet, and compares:
row count, column names, and an order-insensitive canonicalized value
comparison (exact for ints/strings/timestamps, float equality both exact
and at 1e-6 relative tolerance so we can see how much headroom we have).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from etl_project_spark.catalog import TABLES  # noqa: E402
from etl_project_spark.session import get_spark  # noqa: E402


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


def canon_frame(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(canon_cell(row[c]) for c in cols)
        for _, row in pdf[cols].iterrows()
    ]
    return sorted(rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            continue
        if name not in oracles:
            ok = len(spdf) >= 0
            print(f"rows-only {name}: {len(spdf)} rows  ({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            opdf = con.sql(oracles[name]).df()
        except Exception:
            print(f"FAIL  {name}: duckdb error")
            traceback.print_exc()
            n_fail += 1
            continue
        problems = []
        if len(spdf) != len(opdf):
            problems.append(f"rowcount spark={len(spdf)} oracle={len(opdf)}")
        if sorted(spdf.columns) != sorted(opdf.columns):
            problems.append(
                f"columns spark={sorted(spdf.columns)} oracle={sorted(opdf.columns)}"
            )
        if not problems:
            s_rows, o_rows = canon_frame(spdf), canon_frame(opdf)
            if s_rows != o_rows:
                ndiff = sum(1 for a, b in zip(s_rows, o_rows) if a != b)
                problems.append(f"values differ in {ndiff}/{len(s_rows)} rows")
                for a, b in list(zip(s_rows, o_rows))[:2000]:
                    if a != b:
                        problems.append(f"  spark={a}")
                        problems.append(f"  orcl ={b}")
                        break
        if problems:
            print(f"FAIL  {name} ({time.time()-t0:.1f}s): " + "; ".join(problems[:4]))
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(spdf)} rows  ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
