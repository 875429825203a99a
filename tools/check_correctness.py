"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given sf dir, runs
the paired ``oracle_sql()`` in DuckDB over the same parquet, and compares:
row count, column names, and an order-insensitive canonicalized value
comparison. Values are compared exactly first (%.9g float canon — the
driver's bar); on mismatch a 1e-6-relative-tolerance pass runs so
engine-rounding drift is reported as ``PASS~`` (tolerant only) instead of
a bare FAIL — the headroom report.

Approximate operators (HLL counts, sampled aggregates) that register an
``approx_oracle`` + ``rtol`` in the registry are checked against the
exact oracle within that relative tolerance (``PASS≈``) instead of being
recorded rows-only.

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
from etl_project_spark import registry  # noqa: E402
from etl_project_spark.catalog import TABLES  # noqa: E402
from etl_project_spark.session import get_spark  # noqa: E402


def canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "\\N"
    if isinstance(v, float):
        # keep integral floats distinct from ints ("6.0" vs "6"): the
        # driver's canonicalizer hashes them differently, so a DuckDB
        # HUGEINT landing as float64 must FAIL here too, not pass
        s = f"{v:.9g}"
        return s if ("." in s or "e" in s or "n" in s) else s + ".0"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray, memoryview)):
        return bytes(v).hex()
    return str(v)


def normalize_binary(pdf: pd.DataFrame) -> pd.DataFrame:
    """DuckDB hands back BLOBs as bytearray (unhashable, != bytes);
    Spark hands back bytes — normalize so values compare and sort."""
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].map(
                lambda v: bytes(v)
                if isinstance(v, (bytearray, memoryview))
                else v
            )
    return pdf


def canon_frame(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(canon_cell(row[c]) for c in cols)
        for _, row in pdf[cols].iterrows()
    ]
    return sorted(rows)


def compare_tolerant(spdf, opdf, rtol) -> list[str]:
    """Order-insensitive compare with numeric cells at relative tolerance.

    Rows are aligned by sorting on the non-numeric columns first (group
    keys), so numeric jitter between engines can't reorder them; numeric
    cells then compare within ``rtol``, everything else exactly.
    Returns a list of problem strings (empty = match).
    """
    cols = sorted(spdf.columns)
    num = [c for c in cols if pd.api.types.is_numeric_dtype(opdf[c])]
    order = [c for c in cols if c not in num] + num

    def ordered(pdf):
        # sort on canonical strings for object columns (lists/arrays/bytes
        # aren't sortable raw) and raw values for numeric ones
        key = pd.DataFrame(index=pdf.index)
        for c in order:
            key[c] = (
                pdf[c]
                if c in num
                else pdf[c].map(canon_cell)
            )
        return pdf.loc[key.sort_values(order).index].reset_index(drop=True)

    s = ordered(spdf[cols])
    o = ordered(opdf[cols])
    for i in range(len(s)):
        for c in cols:
            a, b = s.at[i, c], o.at[i, c]
            a_null = a is None or (isinstance(a, float) and math.isnan(a))
            b_null = b is None or (isinstance(b, float) and math.isnan(b))
            if a_null or b_null:
                if a_null != b_null:
                    return [f"col {c} row {i}: spark={a!r} oracle={b!r}"]
            elif c in num:
                if not math.isclose(float(a), float(b), rel_tol=rtol):
                    return [
                        f"col {c} row {i}: spark={a} oracle={b} "
                        f"(rtol={rtol})"
                    ]
            elif canon_cell(a) != canon_cell(b):
                return [f"col {c} row {i}: spark={a!r} oracle={b!r}"]
    return []


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
    n_pass = n_fail = n_rowsonly = n_approx = n_tol = n_skip = 0
    # optional committed artifact (SPARK_GRAFT_CHECK_JSON=path): the
    # full-sweep evidence for queries outside the driver's ~50 window
    results: dict[str, dict] = {}

    def rec(name: str, status: str, rows, detail: str | None = None):
        results[name] = {"status": status, "rows": rows}
        if detail:
            results[name]["detail"] = detail[:300]
    # Oracle-cost skip list: queries whose DUCKDB side (not Spark) is
    # impractically slow at a given sf. pp15's oracle unrolls the full
    # LSH+connected-components replay and takes ~38 min at sf0.1 while
    # the Spark side runs <1 s — skipping it there is an oracle-cost
    # statement, NOT a Spark timeout; its sf0.1 pass is on record in
    # LOCAL_SWEEP_r09.json and the sf0.01 gate checks it every sweep.
    # Explicitly naming the query on the command line overrides.
    ORACLE_COST_SKIPS = {
        ("pp15_dedup_weighted_mixture", "sf0.1"): (
            "DuckDB oracle ~38 min at sf0.1 (unrolled LSH+CC replay; "
            "Spark side 0.76 s) — sf0.1 pass recorded in "
            "LOCAL_SWEEP_r09.json; gated at sf0.01 every sweep"
        ),
    }
    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    for name, fn in qs.items():
        if only and name not in only:
            continue
        skip_why = ORACLE_COST_SKIPS.get((name, sf_tag))
        if skip_why and not only:
            print(f"SKIP  {name}: {skip_why}")
            rec(name, "oracle_cost_skip", None, skip_why)
            n_skip += 1
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = normalize_binary(sdf.toPandas())
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            rec(name, "fail", None, "spark error")
            n_fail += 1
            continue
        if name not in oracles:
            spec = registry.get(name)
            if spec.approx_oracle is not None:
                try:
                    opdf = normalize_binary(con.sql(spec.approx_oracle).df())
                except Exception:
                    print(f"FAIL  {name}: duckdb error (approx oracle)")
                    traceback.print_exc()
                    rec(name, "fail", None, "duckdb error (approx oracle)")
                    n_fail += 1
                    continue
                problems = []
                if len(spdf) != len(opdf):
                    problems.append(
                        f"rowcount spark={len(spdf)} oracle={len(opdf)}"
                    )
                elif sorted(spdf.columns) != sorted(opdf.columns):
                    problems.append(
                        f"columns spark={sorted(spdf.columns)} "
                        f"oracle={sorted(opdf.columns)}"
                    )
                else:
                    problems = compare_tolerant(spdf, opdf, spec.rtol or 1e-6)
                if problems:
                    print(
                        f"FAIL  {name} ({time.time()-t0:.1f}s): "
                        + "; ".join(problems[:4])
                    )
                    rec(name, "fail", len(spdf), "; ".join(problems[:2]))
                    n_fail += 1
                else:
                    print(
                        f"PASS≈ {name}: {len(spdf)} rows within "
                        f"rtol={spec.rtol}  ({time.time()-t0:.1f}s)"
                    )
                    rec(name, "approx_pass", len(spdf))
                    n_approx += 1
                continue
            print(f"rows-only {name}: {len(spdf)} rows  ({time.time()-t0:.1f}s)")
            rec(name, "rows_only", len(spdf))
            n_rowsonly += 1
            continue
        try:
            opdf = normalize_binary(con.sql(oracles[name]).df())
        except Exception:
            print(f"FAIL  {name}: duckdb error")
            traceback.print_exc()
            rec(name, "fail", None, "duckdb error")
            n_fail += 1
            continue
        problems = []
        if len(spdf) != len(opdf):
            problems.append(f"rowcount spark={len(spdf)} oracle={len(opdf)}")
        if sorted(spdf.columns) != sorted(opdf.columns):
            problems.append(
                f"columns spark={sorted(spdf.columns)} oracle={sorted(opdf.columns)}"
            )
        tolerant_only = False
        if not problems:
            s_rows, o_rows = canon_frame(spdf), canon_frame(opdf)
            if s_rows != o_rows:
                # exact (%.9g) mismatch — is it just float rounding drift?
                if not compare_tolerant(spdf, opdf, 1e-6):
                    tolerant_only = True
                else:
                    ndiff = sum(1 for a, b in zip(s_rows, o_rows) if a != b)
                    problems.append(
                        f"values differ in {ndiff}/{len(s_rows)} rows"
                    )
                    for a, b in list(zip(s_rows, o_rows))[:2000]:
                        if a != b:
                            problems.append(f"  spark={a}")
                            problems.append(f"  orcl ={b}")
                            break
        if problems:
            print(f"FAIL  {name} ({time.time()-t0:.1f}s): " + "; ".join(problems[:4]))
            rec(name, "fail", len(spdf), "; ".join(problems[:2]))
            n_fail += 1
        elif tolerant_only:
            print(
                f"PASS~ {name}: {len(spdf)} rows (1e-6 tolerant only — "
                f"driver's exact hash would mismatch)  ({time.time()-t0:.1f}s)"
            )
            rec(name, "tolerant_only", len(spdf))
            n_tol += 1
        else:
            print(f"PASS  {name}: {len(spdf)} rows  ({time.time()-t0:.1f}s)")
            rec(name, "pass", len(spdf))
            n_pass += 1
    print(
        f"\n{n_pass} pass, {n_approx} approx-pass, {n_tol} tolerant-only, "
        f"{n_rowsonly} rows-only, {n_fail} fail"
        + (f", {n_skip} oracle-cost-skip" if n_skip else "")
    )
    import os

    out_path = os.environ.get("SPARK_GRAFT_CHECK_JSON")
    if out_path:
        import json

        with open(out_path, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "summary": {
                        "pass": n_pass,
                        "approx_pass": n_approx,
                        "tolerant_only": n_tol,
                        "rows_only": n_rowsonly,
                        "fail": n_fail,
                        "oracle_cost_skip": n_skip,
                    },
                    "results": results,
                },
                f,
                indent=1,
            )
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
