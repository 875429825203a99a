"""Statistics operators (dq14/an13/a16): independent recomputation at
sf0.001 — KS by direct numpy ECDF stepping, Kaplan–Meier by a literal
per-user Python replay from raw events, OLS against numpy lstsq — plus
plan-shape pins (no unpartitioned windows anywhere in the family)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest


def _round6(x: float) -> float:
    """Half-away-from-zero 6dp round (Spark/DuckDB ROUND semantics)."""
    return math.floor(abs(x) * 1e6 + 0.5) / 1e6 * (1 if x >= 0 else -1)

from etl_project_spark.plans import assert_scalable
from etl_project_spark.registry import all_queries


def test_dq14_matches_numpy_ecdf(spark, sf_dir):
    from etl_project_spark.operators.stats import KS_GROUP_A, KS_GROUP_B

    con = duckdb.connect()
    df = con.sql(
        f"SELECT l_returnflag f, l_extendedprice v FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet') "
        f"WHERE l_returnflag IN ('{KS_GROUP_A}', '{KS_GROUP_B}')"
    ).df()
    a = np.sort(df[df["f"] == KS_GROUP_A]["v"].to_numpy())
    b = np.sort(df[df["f"] == KS_GROUP_B]["v"].to_numpy())
    n1, n2 = len(a), len(b)
    pool = np.unique(np.concatenate([a, b]))
    ca = np.searchsorted(a, pool, side="right").astype(np.int64)
    cb = np.searchsorted(b, pool, side="right").astype(np.int64)
    d = np.abs(ca * n2 - cb * n1)
    dmax = int(d.max())
    at = float(pool[np.argmax(d == dmax)])  # smallest value attaining
    row = all_queries()["dq14_ks_drift"](spark, sf_dir).collect()[0]
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert row["d_num"] == dmax
    assert row["ks_at"] == pytest.approx(at, abs=0)
    assert row["ks"] == pytest.approx(_round6(dmax / (n1 * n2)), abs=1e-9)


def test_an13_matches_python_replay(spark, sf_dir):
    from etl_project_spark.operators.stats import KM_DAY_US, KM_SCALE

    con = duckdb.connect()
    ev = con.sql(
        f"SELECT user_id u, event_type t, epoch_us(ts) us FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    ).df()
    users: dict[int, dict] = {}
    for u, t, us in zip(ev["u"], ev["t"], ev["us"]):
        rec = users.setdefault(int(u), {"c": None, "p": None, "last": 0})
        us = int(us)
        rec["last"] = max(rec["last"], us)
        if t == "click" and (rec["c"] is None or us < rec["c"]):
            rec["c"] = us
        if t == "purchase" and (rec["p"] is None or us < rec["p"]):
            rec["p"] = us
    cohort = []
    for rec in users.values():
        if rec["c"] is None:
            continue
        if rec["p"] is not None and rec["p"] >= rec["c"]:
            cohort.append(((rec["p"] - rec["c"]) // KM_DAY_US, 1))
        else:
            cohort.append(((rec["last"] - rec["c"]) // KM_DAY_US, 0))
    steps: dict[int, list] = {}
    for day, evt in cohort:
        s = steps.setdefault(day, [0, 0])
        if evt:
            s[0] += 1
        else:
            s[1] += 1
    remaining = len(cohort)
    s = KM_SCALE
    expect = []
    for day in sorted(steps):
        d, cns = steps[day]
        at_risk = remaining
        s = math.floor(s * (at_risk - d) / at_risk + 0.5)
        expect.append((day, at_risk, d, cns, s))
        remaining -= d + cns
    got = [
        (r["day"], r["at_risk"], r["events"], r["censored"], r["surv_e6"])
        for r in sorted(
            all_queries()["an13_kaplan_meier"](spark, sf_dir).collect(),
            key=lambda r: r["day"],
        )
    ]
    assert got == expect
    # survival is non-increasing and starts below 1.0 scale
    survs = [g[4] for g in got]
    assert all(a >= b for a, b in zip(survs, survs[1:]))
    assert survs[0] <= 1_000_000


def test_a16_matches_numpy_lstsq(spark, sf_dir):
    con = duckdb.connect()
    df = con.sql(
        f"SELECT l_returnflag g, "
        f"CAST(FLOOR(l_quantity + 0.5) AS BIGINT) x, "
        f"CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT) y "
        f"FROM read_parquet('{sf_dir}/lineitem.parquet')"
    ).df()
    rows = {
        r["grp"]: r
        for r in all_queries()["a16_grouped_ols"](spark, sf_dir).collect()
    }
    assert set(rows) == set(df["g"].unique())
    for g, sub in df.groupby("g"):
        x = sub["x"].to_numpy(dtype=np.float64)
        y = sub["y"].to_numpy(dtype=np.float64)
        A = np.vstack([x, np.ones_like(x)]).T
        (slope, intercept), res, *_ = np.linalg.lstsq(A, y, rcond=None)
        r = np.corrcoef(x, y)[0, 1]
        got = rows[g]
        assert got["n"] == len(sub)
        assert got["slope"] == pytest.approx(slope, rel=1e-4, abs=1e-4)
        assert got["intercept"] == pytest.approx(
            intercept, rel=1e-4, abs=1e-2
        )
        assert got["r2"] == pytest.approx(r * r, rel=1e-3, abs=1e-5)


def test_stats_plans_are_bounded(spark, sf_dir):
    """No unbounded unpartitioned windows, no quadratic joins, no
    row-Python anywhere in the family. dq14 (r13) carries exactly ONE
    global window — the pp1-style prefix fold over the ~26-row
    price-bucket totals relation (registered in
    tools/audit_plans.BOUNDED_GLOBAL_WINDOW); an13's step fold is
    driver-side over a bounded relation; a16 has none."""
    for name, want_windows in (
        ("dq14_ks_drift", 1),
        ("an13_kaplan_meier", 0),
        ("a16_grouped_ols", 0),
    ):
        df = all_queries()[name](spark, sf_dir)
        stats = assert_scalable(df, allow_quadratic=False)
        assert stats.unpartitioned_windows == want_windows, (
            name,
            stats.plan,
        )


def test_dq15_matches_pairwise_u(spark, sf_dir):
    """Independent cross-check via the PAIRWISE definition of U
    (different formula than the operator's rank-sum): 2*U1 =
    sum over a in A of (2*#{b < a} + #{b = a}) — exact integers."""
    from etl_project_spark.operators.stats import MW_TYPE_A, MW_TYPE_B

    con = duckdb.connect()
    df = con.sql(
        f"SELECT event_type t, value v FROM "
        f"read_parquet('{sf_dir}/events.parquet') "
        f"WHERE event_type IN ('{MW_TYPE_A}', '{MW_TYPE_B}') "
        f"AND value IS NOT NULL"
    ).df()
    a = np.sort(df[df["t"] == MW_TYPE_A]["v"].to_numpy())
    b = np.sort(df[df["t"] == MW_TYPE_B]["v"].to_numpy())
    n1, n2 = len(a), len(b)
    lt = np.searchsorted(b, a, side="left")
    le = np.searchsorted(b, a, side="right")
    u1_2x = int((2 * lt + (le - lt)).sum())
    row = all_queries()["dq15_mannwhitney_u"](spark, sf_dir).collect()[0]
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert row["u1_2x"] == u1_2x
    assert row["u1_2x"] + row["u2_2x"] == 2 * n1 * n2  # identity
    assert row["auc"] == pytest.approx(
        _round6(u1_2x / (2 * n1 * n2)), abs=1e-9
    )
