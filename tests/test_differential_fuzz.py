"""Differential query fuzzer: hypothesis composes random (projection,
predicate, grouping) queries from an engine-parity-safe grammar, runs
the SAME SQL text through Spark SQL and DuckDB over the same parquet,
and compares canonicalized results. Complements the hand-written
per-operator oracles with breadth: any divergence in filter semantics,
null handling, aggregate typing, or timestamp canon shows up here
without anyone having thought to write that exact oracle.

Grammar rules keeping the comparison exact (no tolerance pass):
- only order-independent aggregates (COUNT/MIN/MAX, SUM of integers
  CAST to BIGINT against the DuckDB HUGEINT hazard, and single-division
  integer averages) — no floating SUM, whose addition order differs
  between engines;
- predicates use literals only (no engine-evaluated nondeterminism);
- timestamps compare as their pandas string form (identical canon in
  both engines for microsecond parquet timestamps).
"""

from __future__ import annotations

import math

import pandas as pd

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SF_DIR = "/root/testdata/sf0.001"

AGGS = [
    "COUNT(*) AS cnt",
    "COUNT(o_custkey) AS n_ck",
    "MIN(o_totalprice) AS min_price",
    "MAX(o_totalprice) AS max_price",
    "MIN(o_orderdate) AS min_date",
    "MAX(o_orderdate) AS max_date",
    "MIN(o_orderstatus) AS min_status",
    "CAST(SUM(o_orderkey) AS BIGINT) AS sum_key",
    "ROUND(CAST(SUM(o_custkey) AS DOUBLE) / COUNT(*), 6) AS avg_ck",
]

PREDS = [
    None,
    "o_orderstatus = 'O'",
    "o_orderstatus IN ('F', 'P')",
    "o_totalprice > 150000.0",
    "o_totalprice <= 50000.0",
    "o_orderkey % 7 = 3",
    "o_orderdate < TIMESTAMP '1997-01-01 00:00:00'",
    "o_custkey IS NOT NULL AND o_totalprice BETWEEN 10000.0 AND 200000.0",
    "NOT (o_orderpriority = '1-URGENT')",
]

GROUPS = [None, "o_orderstatus", "o_orderpriority"]


def _canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "\\N"
    if isinstance(v, float):
        s = f"{v:.9g}"
        return s if ("." in s or "e" in s or "n" in s) else s + ".0"
    return str(v)


def _canon(pdf):
    cols = sorted(pdf.columns)
    return sorted(
        tuple(_canon_cell(row[c]) for c in cols)
        for _, row in pdf[cols].iterrows()
    )


@pytest.fixture(scope="module")
def engines(spark):
    spark.read.parquet(f"{SF_DIR}/orders.parquet").createOrReplaceTempView(
        "orders"
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR}/orders.parquet'"
    )
    yield spark, con
    con.close()
    spark.catalog.dropTempView("orders")


@given(
    aggs=st.lists(st.sampled_from(AGGS), min_size=1, max_size=3, unique=True),
    pred=st.sampled_from(PREDS),
    group=st.sampled_from(GROUPS),
)
@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_query_differential(engines, aggs, pred, group):
    spark, con = engines
    select = (f"{group}, " if group else "") + ", ".join(aggs)
    sql = f"SELECT {select} FROM orders"
    if pred:
        sql += f" WHERE {pred}"
    if group:
        sql += f" GROUP BY {group}"
    spdf = spark.sql(sql).toPandas()
    opdf = con.sql(sql).df()
    assert sorted(spdf.columns) == sorted(opdf.columns), sql
    assert _canon(spdf) == _canon(opdf), sql


JOIN_AGGS = [
    "COUNT(*) AS cnt",
    "COUNT(c_custkey) AS n_matched",
    "MIN(c_acctbal) AS min_bal",
    "MAX(o_totalprice) AS max_price",
    "CAST(SUM(c_nationkey) AS BIGINT) AS sum_nat",
    "MIN(c_mktsegment) AS min_seg",
]

JOIN_PREDS = [
    None,
    "o_orderstatus = 'O'",
    "c_acctbal > 0.0",
    "c_mktsegment IN ('BUILDING', 'MACHINERY')",
    "o_totalprice > 100000.0 OR c_nationkey < 5",
]

JOIN_TYPES = ["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"]
JOIN_GROUPS = [None, "o_orderstatus", "c_mktsegment"]


@pytest.fixture(scope="module")
def join_engines(engines):
    spark, con = engines
    spark.read.parquet(f"{SF_DIR}/customer.parquet").createOrReplaceTempView(
        "customer"
    )
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM '{SF_DIR}/customer.parquet'"
    )
    yield spark, con
    spark.catalog.dropTempView("customer")


@given(
    aggs=st.lists(
        st.sampled_from(JOIN_AGGS), min_size=1, max_size=3, unique=True
    ),
    pred=st.sampled_from(JOIN_PREDS),
    jt=st.sampled_from(JOIN_TYPES),
    group=st.sampled_from(JOIN_GROUPS),
)
@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_join_differential(join_engines, aggs, pred, jt, group):
    """Same grammar over a two-table join: inner/left join semantics,
    null propagation through outer rows, and NULL group keys all
    compared exactly between engines."""
    spark, con = join_engines
    select = (f"{group}, " if group else "") + ", ".join(aggs)
    sql = (
        f"SELECT {select} FROM orders "
        f"{jt} customer ON o_custkey = c_custkey"
    )
    if pred:
        sql += f" WHERE {pred}"
    if group:
        sql += f" GROUP BY {group}"
    spdf = spark.sql(sql).toPandas()
    opdf = con.sql(sql).df()
    assert sorted(spdf.columns) == sorted(opdf.columns), sql
    assert _canon(spdf) == _canon(opdf), sql


SCALAR_EXPRS = [
    "UPPER(c_name) AS e_upper",
    "LOWER(c_mktsegment) AS e_lower",
    "LENGTH(c_name) AS e_len",
    "SUBSTR(c_name, 2, 5) AS e_substr",
    "CONCAT(c_name, '_', c_mktsegment) AS e_concat",
    "TRIM(c_name) AS e_trim",
    "REPLACE(c_name, 'a', '@') AS e_replace",
    "ABS(c_acctbal) AS e_abs",
    # CAST: Spark FLOOR/CEIL(double) -> BIGINT, DuckDB -> DOUBLE — the
    # same integral-vs-float canon hazard as DuckDB's HUGEINT SUM
    # (found by this fuzzer; the per-operator oracles CAST for the
    # same reason)
    "CAST(FLOOR(c_acctbal) AS BIGINT) AS e_floor",
    "CAST(CEIL(c_acctbal) AS BIGINT) AS e_ceil",
    "c_custkey % 13 AS e_mod",
    "c_custkey * 3 + c_nationkey AS e_arith",
    "CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END AS e_case",
    "COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '<b>') AS e_coalesce",
]


@given(
    exprs=st.lists(
        st.sampled_from(SCALAR_EXPRS), min_size=1, max_size=4, unique=True
    ),
    pred=st.sampled_from(
        [None, "c_acctbal > 0.0", "c_nationkey % 2 = 0"]
    ),
)
@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_scalar_expression_differential(join_engines, exprs, pred):
    """Row-level scalar expression semantics (string functions, integer
    arithmetic, CASE/COALESCE/NULLIF, floor/ceil) compared exactly over
    the full customer relation. ROUND is deliberately absent: Spark
    rounds half-up, DuckDB half-away-from-zero — a genuine dialect
    divergence the per-operator oracles avoid by construction."""
    spark, con = join_engines
    sql = f"SELECT c_custkey, {', '.join(exprs)} FROM customer"
    if pred:
        sql += f" WHERE {pred}"
    spdf = spark.sql(sql).toPandas()
    opdf = con.sql(sql).df()
    assert sorted(spdf.columns) == sorted(opdf.columns), sql
    assert _canon(spdf) == _canon(opdf), sql


WINDOW_EXPRS = [
    # all windows order by the UNIQUE o_orderkey, so every rank/offset
    # function is deterministic and engine-comparable
    "ROW_NUMBER() OVER "
    "(PARTITION BY o_orderstatus ORDER BY o_orderkey) AS w_rn",
    "RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS w_rk",
    "DENSE_RANK() OVER "
    "(PARTITION BY o_orderstatus ORDER BY o_orderkey) AS w_dr",
    "LAG(o_orderkey, 1) OVER "
    "(PARTITION BY o_orderstatus ORDER BY o_orderkey) AS w_lag",
    "LEAD(o_orderkey, 2) OVER "
    "(PARTITION BY o_orderstatus ORDER BY o_orderkey) AS w_lead",
    "CAST(SUM(o_orderkey) OVER (PARTITION BY o_orderstatus "
    "ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    " AS BIGINT) AS w_cumsum",
    "MIN(o_totalprice) OVER (PARTITION BY o_orderstatus) AS w_minp",
    "NTILE(4) OVER (ORDER BY o_orderkey) AS w_ntile",
]


@given(
    exprs=st.lists(
        st.sampled_from(WINDOW_EXPRS), min_size=1, max_size=3, unique=True
    ),
    pred=st.sampled_from([None, "o_totalprice > 50000.0"]),
)
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_window_differential(engines, exprs, pred):
    """Window-function semantics (ranking, offsets, running frames,
    ntile) compared exactly — every window orders by the unique
    o_orderkey so results are total-order deterministic in both
    engines; the running SUM casts to BIGINT against DuckDB's HUGEINT
    window-sum."""
    spark, con = engines
    sql = f"SELECT o_orderkey, {', '.join(exprs)} FROM orders"
    if pred:
        sql += f" WHERE {pred}"
    spdf = spark.sql(sql).toPandas()
    opdf = con.sql(sql).df()
    assert sorted(spdf.columns) == sorted(opdf.columns), sql
    assert _canon(spdf) == _canon(opdf), sql


SETOP_PROJS = [
    "o_orderstatus",
    "o_orderpriority",
    "o_custkey % 50",
]

SETOPS = ["UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL",
          "EXCEPT", "EXCEPT ALL"]


@given(
    proj=st.sampled_from(SETOP_PROJS),
    op=st.sampled_from(SETOPS),
    p1=st.sampled_from(PREDS),
    p2=st.sampled_from(PREDS),
)
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_setop_differential(engines, proj, op, p1, p2):
    """Set-operation semantics (dedup vs ALL, set-difference) compared
    exactly between engines over matching branch projections."""
    spark, con = engines
    w1 = f" WHERE {p1}" if p1 else ""
    w2 = f" WHERE {p2}" if p2 else ""
    sql = (
        f"SELECT {proj} AS k FROM orders{w1} "
        f"{op} SELECT {proj} AS k FROM orders{w2}"
    )
    spdf = spark.sql(sql).toPandas()
    opdf = con.sql(sql).df()
    assert _canon(spdf) == _canon(opdf), sql


SUBQUERY_SQLS = [
    "SELECT COUNT(*) AS n FROM orders WHERE o_custkey IN "
    "(SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)",
    "SELECT COUNT(*) AS n FROM orders WHERE o_custkey NOT IN "
    "(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')",
    "SELECT COUNT(*) AS n FROM orders o WHERE EXISTS "
    "(SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey "
    "AND c.c_acctbal < 0)",
    "SELECT COUNT(*) AS n FROM orders o WHERE NOT EXISTS "
    "(SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)",
    "SELECT COUNT(*) AS n FROM orders "
    "WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)",
    "SELECT c_mktsegment, COUNT(*) AS n FROM customer "
    "WHERE c_acctbal > (SELECT MIN(c_acctbal) FROM customer) "
    "GROUP BY c_mktsegment",
]


@given(sql=st.sampled_from(SUBQUERY_SQLS))
@settings(
    max_examples=len(SUBQUERY_SQLS),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_subquery_differential(join_engines, sql):
    """Semi/anti-join rewrites (IN/NOT IN/EXISTS/NOT EXISTS) and scalar
    subqueries compared exactly — the decorrelation paths both engines
    optimize differently but must agree on."""
    spark, con = join_engines
    spdf = spark.sql(sql).toPandas()
    opdf = con.sql(sql).df()
    assert _canon(spdf) == _canon(opdf), sql


GROUPING_FORMS = [
    "ROLLUP (o_orderstatus, o_orderpriority)",
    "CUBE (o_orderstatus, o_orderpriority)",
    "GROUPING SETS ((o_orderstatus), (o_orderpriority), ())",
]


@given(
    form=st.sampled_from(GROUPING_FORMS),
    agg=st.sampled_from(
        ["COUNT(*) AS cnt", "CAST(SUM(o_orderkey) AS BIGINT) AS s",
         "MIN(o_totalprice) AS mn"]
    ),
    pred=st.sampled_from([None, "o_totalprice > 100000.0"]),
)
@settings(
    max_examples=18,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_grouping_form_differential(engines, form, agg, pred):
    """ROLLUP/CUBE/GROUPING SETS: the super-aggregate NULL rows and
    their interaction with real NULL-free group keys compared exactly
    between engines."""
    spark, con = engines
    where = f" WHERE {pred}" if pred else ""
    sql = (
        f"SELECT o_orderstatus, o_orderpriority, {agg} "
        f"FROM orders{where} GROUP BY {form}"
    )
    spdf = spark.sql(sql).toPandas()
    opdf = con.sql(sql).df()
    assert _canon(spdf) == _canon(opdf), sql


HAVING_AGGS = [
    "COUNT(*) AS cnt",
    "COUNT(DISTINCT o_custkey) AS n_cust",
    "CAST(SUM(o_orderkey) AS BIGINT) AS sum_key",
    "MIN(o_totalprice) AS mn",
]

HAVINGS = [
    "COUNT(*) > 100",
    "COUNT(DISTINCT o_custkey) >= 10",
    "MIN(o_totalprice) < 50000.0",
    "COUNT(*) * 5 >= COUNT(DISTINCT o_custkey) * 6",
]


@given(
    aggs=st.lists(
        st.sampled_from(HAVING_AGGS), min_size=1, max_size=3, unique=True
    ),
    having=st.sampled_from(HAVINGS),
    group=st.sampled_from(["o_orderstatus", "o_orderpriority"]),
)
@settings(
    max_examples=24,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_having_distinct_differential(engines, aggs, having, group):
    """DISTINCT aggregates and HAVING predicates (including ones over
    aggregates not in the SELECT list) compared exactly."""
    spark, con = engines
    sql = (
        f"SELECT {group}, {', '.join(aggs)} FROM orders "
        f"GROUP BY {group} HAVING {having}"
    )
    spdf = spark.sql(sql).toPandas()
    opdf = con.sql(sql).df()
    assert _canon(spdf) == _canon(opdf), sql


# Recursive integer-expression trees: exercises constant folding,
# CASE simplification, and arithmetic rewrite rules rather than surface
# forms. Leaves are bounded (|leaf| <= 97) so 8-leaf products stay
# ~1e15, far inside int64 in both engines; all arithmetic is integer
# (+, -, *) so results are exact and order-independent.
_LEAVES = st.sampled_from(
    ["(o_orderkey % 97)", "(o_custkey % 89)", "7", "13", "(0 - 5)"]
)
_CONDS = st.sampled_from(
    [
        "o_orderkey % 2 = 0",
        "o_totalprice > 100000.0",
        "o_orderstatus = 'O'",
    ]
)


def _binop(children):
    return st.builds(
        lambda a, op, b: f"({a} {op} {b})",
        children,
        st.sampled_from(["+", "-", "*"]),
        children,
    )


def _case(children):
    return st.builds(
        lambda c, a, b: f"(CASE WHEN {c} THEN {a} ELSE {b} END)",
        _CONDS,
        children,
        children,
    )


_EXPR_TREE = st.recursive(
    _LEAVES, lambda kids: _binop(kids) | _case(kids), max_leaves=8
)


@given(expr=_EXPR_TREE)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_recursive_int_expression_differential(engines, expr):
    """Randomly-shaped nested integer expression trees evaluated
    row-level over orders — each engine's optimizer folds/rewrites the
    tree differently, but results must agree exactly."""
    spark, con = engines
    sql = f"SELECT o_orderkey, CAST({expr} AS BIGINT) AS e FROM orders"
    spdf = spark.sql(sql).toPandas()
    opdf = con.sql(sql).df()
    assert _canon(spdf) == _canon(opdf), sql


# Grammar 11 (r5): WINDOWS OVER JOINS — the prior grammars fuzz window
# functions and joins in isolation; this one composes them, because the
# engines decorrelate/plan the combination differently (outer-join NULL
# rows entering window partitions, partition keys from either side,
# frames over the padded row set). Determinism: every window orders by
# COALESCE(o_orderkey, -c_custkey) — unique and non-NULL on every row
# of any join type (o_orderkey is unique per order row; unmatched
# customers are unique by c_custkey; the negation keeps the ranges
# disjoint) — so ranking/offset results are total-order deterministic.
_WJ_KEY = "COALESCE(o_orderkey, 0 - c_custkey)"

WJ_WINDOWS = [
    f"ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY {_WJ_KEY})"
    " AS wj_rn",
    f"RANK() OVER (PARTITION BY c_mktsegment ORDER BY {_WJ_KEY}) AS wj_rk",
    f"LAG({_WJ_KEY}, 1) OVER (PARTITION BY c_mktsegment ORDER BY {_WJ_KEY})"
    " AS wj_lag",
    f"LEAD({_WJ_KEY}, 2) OVER (PARTITION BY o_orderstatus "
    f"ORDER BY {_WJ_KEY}) AS wj_lead",
    f"CAST(SUM({_WJ_KEY}) OVER (PARTITION BY o_orderstatus ORDER BY "
    f"{_WJ_KEY} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"
    " AS wj_cumsum",
    "MIN(c_acctbal) OVER (PARTITION BY o_orderstatus) AS wj_minbal",
    "COUNT(c_custkey) OVER (PARTITION BY c_mktsegment) AS wj_nmatch",
    f"NTILE(3) OVER (ORDER BY {_WJ_KEY}) AS wj_ntile",
]

WJ_PREDS = [
    None,
    "o_totalprice > 100000.0",
    "c_acctbal > 0.0 OR o_orderstatus = 'O'",
    "c_mktsegment IS NULL OR c_mktsegment = 'BUILDING'",
]


@given(
    exprs=st.lists(
        st.sampled_from(WJ_WINDOWS), min_size=1, max_size=3, unique=True
    ),
    jt=st.sampled_from(JOIN_TYPES),
    pred=st.sampled_from(WJ_PREDS),
)
@settings(
    max_examples=110,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_window_over_join_differential(join_engines, exprs, jt, pred):
    """Window functions evaluated over every join type: NULL-padded
    outer rows entering partitions keyed from either side, frames and
    offsets over the combined row set — compared exactly."""
    spark, con = join_engines
    sql = (
        f"SELECT {_WJ_KEY} AS k, {', '.join(exprs)} FROM orders "
        f"{jt} customer ON o_custkey = c_custkey"
    )
    if pred:
        sql += f" WHERE {pred}"
    spdf = spark.sql(sql).toPandas()
    opdf = con.sql(sql).df()
    assert sorted(spdf.columns) == sorted(opdf.columns), sql
    assert _canon(spdf) == _canon(opdf), sql


# Grammar 12 (r5): CORRELATED SUBQUERIES, composed — correlated scalar
# aggregates in the SELECT list and in predicates, including a window
# RANKED BY a correlated scalar (ties broken by the unique outer key).
# Both engines decorrelate these into joins through entirely different
# rewrite pipelines; the COUNT-over-empty-correlation case (must be 0,
# not NULL) is the classic decorrelation bug this grammar pins.
CORR_SCALARS = [
    "(SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey{ip})"
    " AS n_orders",
    "(SELECT CAST(SUM(o.o_orderkey) AS BIGINT) FROM orders o "
    "WHERE o.o_custkey = c.c_custkey{ip}) AS sum_key",
    "(SELECT MIN(o.o_totalprice) FROM orders o "
    "WHERE o.o_custkey = c.c_custkey{ip}) AS min_price",
    "(SELECT MAX(o.o_orderdate) FROM orders o "
    "WHERE o.o_custkey = c.c_custkey{ip}) AS max_date",
]

CORR_INNER_PREDS = [
    "",
    " AND o.o_orderstatus = 'O'",
    " AND o.o_totalprice > 150000.0",  # often empty -> COUNT must be 0
]

CORR_OUTER_PREDS = [
    None,
    "c_acctbal > 0.0",
    "c_mktsegment IN ('BUILDING', 'MACHINERY')",
]


@given(
    scalar=st.sampled_from(CORR_SCALARS),
    ip=st.sampled_from(CORR_INNER_PREDS),
    outer=st.sampled_from(CORR_OUTER_PREDS),
    ranked=st.booleans(),
)
@settings(
    max_examples=100,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_correlated_subquery_differential(
    join_engines, scalar, ip, outer, ranked
):
    """Correlated scalar subqueries per outer row — alone, and as the
    ordering key of a window over the outer relation (composition the
    isolated grammars never reach). Compared exactly."""
    spark, con = join_engines
    sexpr = scalar.format(ip=ip)
    alias = sexpr.rsplit(" AS ", 1)[1]
    cols = f"c_custkey, {sexpr}"
    if ranked:
        cols += (
            f", RANK() OVER (PARTITION BY c_mktsegment "
            f"ORDER BY {sexpr.rsplit(' AS ', 1)[0]} DESC NULLS LAST, "
            f"c_custkey) AS corr_rank"
        )
    sql = f"SELECT {cols} FROM customer c"
    if outer:
        sql += f" WHERE {outer}"
    spdf = spark.sql(sql).toPandas()
    opdf = con.sql(sql).df()
    assert sorted(spdf.columns) == sorted(opdf.columns), (sql, alias)
    assert _canon(spdf) == _canon(opdf), sql


# Grammar 13 (r5): recursive STRING expression trees — the string
# sibling of the int-expression grammar: random compositions of
# concat/case/substr/replace/pad/trim/reverse exercise each engine's
# string-rewrite rules (constant folding of nested concat, CASE
# pushdown) rather than surface forms. Dialect guardrails: SUBSTR
# start index stays >= 1 (Spark treats 0 like 1, DuckDB like
# PostgreSQL truncates — a real divergence this grammar must not
# trip on deliberately), and no ROUND (half-up vs half-away).
_STR_LEAVES = st.sampled_from(
    ["c_name", "c_mktsegment", "'Xy'", "''", "CAST(c_custkey AS VARCHAR(30))"]
)


def _str_unary(children):
    return st.builds(
        lambda f, a: f.format(a),
        st.sampled_from(
            [
                "UPPER({})",
                "LOWER({})",
                "TRIM({})",
                "REVERSE({})",
                "SUBSTR({}, 2, 5)",
                "REPLACE({}, 'a', '@')",
                "LPAD({}, 12, '_')",
            ]
        ),
        children,
    )


def _str_binary(children):
    return st.builds(
        lambda a, b: f"CONCAT({a}, {b})",
        children,
        children,
    )


def _str_case(children):
    return st.builds(
        lambda c, a, b: f"(CASE WHEN {c} THEN {a} ELSE {b} END)",
        st.sampled_from(
            ["c_acctbal > 0.0", "c_nationkey % 3 = 1", "c_custkey % 2 = 0"]
        ),
        children,
        children,
    )


_STR_TREE = st.recursive(
    _STR_LEAVES,
    lambda kids: _str_unary(kids) | _str_binary(kids) | _str_case(kids),
    max_leaves=6,
)


@given(expr=_STR_TREE)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_recursive_string_expression_differential(join_engines, expr):
    """Randomly-shaped nested string expression trees evaluated
    row-level over customer — exact cross-engine agreement."""
    spark, con = join_engines
    sql = f"SELECT c_custkey, {expr} AS e FROM customer"
    spdf = spark.sql(sql).toPandas()
    opdf = con.sql(sql).df()
    assert _canon(spdf) == _canon(opdf), sql


# Grammar 14 (r5): DATETIME functions — the reference's whole domain is
# timestamp handling (SURVEY §2c P3/P4), so the extraction/truncation/
# interval surface gets its own grammar. Dialect guardrails found by
# probing (kept OUT of the grammar, documented here): DOW numbering is
# off by one (Spark dayofweek/EXTRACT(DOW) counts Sunday=1, DuckDB
# Sunday=0); date_trunc returns TIMESTAMP in Spark but DATE for
# month/week granularity in DuckDB (normalized below by CASTing to
# DATE on both sides); two-arg datediff is Spark-only.
DT_EXPRS = [
    "EXTRACT(YEAR FROM o_orderdate) AS e_year",
    "EXTRACT(MONTH FROM o_orderdate) AS e_month",
    "EXTRACT(DAY FROM o_orderdate) AS e_day",
    "EXTRACT(HOUR FROM o_orderdate) AS e_hour",
    "EXTRACT(DOY FROM o_orderdate) AS e_doy",
    "EXTRACT(QUARTER FROM o_orderdate) AS e_q",
    # DATE-valued outputs are re-CAST to TIMESTAMP: pandas hands back
    # Spark dates as datetime.date but DuckDB dates as datetime64, and
    # the value canon must not depend on the binding layer
    "CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS TIMESTAMP)"
    " AS e_tmonth",
    "CAST(CAST(date_trunc('week', o_orderdate) AS DATE) AS TIMESTAMP)"
    " AS e_tweek",
    "o_orderdate + INTERVAL 3 DAY AS e_plus",
    "o_orderdate - INTERVAL 2 HOUR AS e_minus",
    "CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS e_date",
    "weekofyear(o_orderdate) AS e_woy",
    "CAST(last_day(o_orderdate) AS TIMESTAMP) AS e_lastday",
    "greatest(o_orderdate, TIMESTAMP '1996-01-01 00:00:00') AS e_gt",
    "CASE WHEN EXTRACT(MONTH FROM o_orderdate) <= 6 THEN 'H1' ELSE 'H2' "
    "END AS e_half",
]

DT_PREDS = [
    None,
    "o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'",
    "EXTRACT(YEAR FROM o_orderdate) = 1997",
    "o_orderdate + INTERVAL 30 DAY < TIMESTAMP '1997-06-01 00:00:00'",
]


@given(
    exprs=st.lists(
        st.sampled_from(DT_EXPRS), min_size=1, max_size=4, unique=True
    ),
    pred=st.sampled_from(DT_PREDS),
)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_datetime_differential(engines, exprs, pred):
    """Datetime extraction/truncation/interval semantics compared
    exactly over orders — including interval arithmetic inside
    predicates (pushdown-rewritten differently per engine)."""
    spark, con = engines
    sql = f"SELECT o_orderkey, {', '.join(exprs)} FROM orders"
    if pred:
        sql += f" WHERE {pred}"
    spdf = spark.sql(sql).toPandas()
    opdf = con.sql(sql).df()
    assert sorted(spdf.columns) == sorted(opdf.columns), sql
    assert _canon(spdf) == _canon(opdf), sql


# Grammar 15 (r5): GROUPED TOP-K OVER JOINS — GROUP BY + HAVING +
# ORDER BY <aggregate> LIMIT k in one query, over an inner join. Spark
# plans the tail as TakeOrderedAndProject, DuckDB as its own top-n
# operator; both must agree on the full ordered prefix. Determinism:
# the ORDER BY always ends with the (non-NULL, unique-per-group) group
# key, so the cut line has no ties to disagree on.
TK_AGGS = [
    ("COUNT(*)", "cnt"),
    ("CAST(SUM(o_orderkey) AS BIGINT)", "sk"),
    ("MIN(o_totalprice)", "mn"),
    ("MAX(o_totalprice)", "mx"),
    ("COUNT(DISTINCT o_custkey)", "nc"),
]

TK_GROUPS = ["o_orderstatus", "c_mktsegment", "o_orderpriority"]

TK_HAVINGS = [None, "COUNT(*) > 20", "MIN(o_totalprice) < 150000.0"]


@given(
    agg=st.sampled_from(TK_AGGS),
    group=st.sampled_from(TK_GROUPS),
    having=st.sampled_from(TK_HAVINGS),
    k=st.sampled_from([1, 2, 3, 5]),
    desc=st.booleans(),
)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_grouped_topk_differential(join_engines, agg, group,
                                          having, k, desc):
    """Grouped aggregate → HAVING → ORDER BY aggregate → LIMIT over an
    inner join, compared exactly (the dashboard/top-k query shape the
    reference's own T1 is the 1-row case of)."""
    spark, con = join_engines
    expr, alias = agg
    hv = f" HAVING {having}" if having else ""
    d = "DESC" if desc else "ASC"
    sql = (
        f"SELECT {group} AS g, {expr} AS {alias} FROM orders "
        f"JOIN customer ON o_custkey = c_custkey "
        f"GROUP BY {group}{hv} ORDER BY {alias} {d}, g LIMIT {k}"
    )
    spdf = spark.sql(sql).toPandas()
    opdf = con.sql(sql).df()
    # ordered compare: the LIMIT prefix itself must match row-for-row
    sc = sorted(spdf.columns)
    srows = [tuple(_canon_cell(r[c]) for c in sc)
             for _, r in spdf[sc].iterrows()]
    orows = [tuple(_canon_cell(r[c]) for c in sc)
             for _, r in opdf[sc].iterrows()]
    assert srows == orows, sql


# Grammar 16 (r5): the EVENTS table — the corpus's quirkiest physical
# surface (parquet TIMESTAMP(NANOS) → Spark needs the nanosAsLong
# conversion to TIMESTAMP_NTZ, DuckDB truncates natively to
# microseconds). The fixture registers the ENGINE's own conversion
# path (catalog.load_table) against DuckDB's CAST(ts AS TIMESTAMP), so
# every case differentially exercises the timestamp canon end to end.
# Aggregates stay order-independent (no float SUM — `value` is a
# double).
EV_AGGS = [
    "COUNT(*) AS cnt",
    "COUNT(DISTINCT user_id) AS nu",
    "MIN(value) AS mn_v",
    "MAX(value) AS mx_v",
    "MIN(ts) AS mn_ts",
    "MAX(ts) AS mx_ts",
    "CAST(SUM(event_id % 1000) AS BIGINT) AS sk",
]

EV_GROUPS = [
    None,
    "event_type",
    "user_id % 20",
    "date_trunc('day', ts)",
    "date_trunc('hour', ts)",
]

EV_PREDS = [
    None,
    "ts >= TIMESTAMP '2024-01-10 00:00:00'",
    "ts < TIMESTAMP '2024-01-20 12:34:56'",
    "event_type IN ('click', 'view', 'purchase')",
    "value BETWEEN 10.0 AND 90.0",
    "ts + INTERVAL 6 HOUR >= TIMESTAMP '2024-01-25 00:00:00'",
]


@pytest.fixture(scope="module")
def event_engines(spark):
    from etl_project_spark.catalog import load_table

    load_table(spark, SF_DIR, "events").createOrReplaceTempView("events")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,"
        " user_id, event_type, value FROM "
        f"'{SF_DIR}/events.parquet'"
    )
    yield spark, con
    con.close()
    spark.catalog.dropTempView("events")


@given(
    aggs=st.lists(
        st.sampled_from(EV_AGGS), min_size=1, max_size=3, unique=True
    ),
    group=st.sampled_from(EV_GROUPS),
    pred=st.sampled_from(EV_PREDS),
)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_events_timeseries_differential(event_engines, aggs, group,
                                               pred):
    """Time-filtered, time-bucketed aggregation over events — the
    nanos→microsecond timestamp conversion, interval arithmetic in
    predicates, and date_trunc group keys compared exactly."""
    spark, con = event_engines
    select = (f"{group} AS g, " if group else "") + ", ".join(aggs)
    sql = f"SELECT {select} FROM events"
    if pred:
        sql += f" WHERE {pred}"
    if group:
        sql += f" GROUP BY {group}"
    spdf = spark.sql(sql).toPandas()
    opdf = con.sql(sql).df()
    assert sorted(spdf.columns) == sorted(opdf.columns), sql
    assert _canon(spdf) == _canon(opdf), sql


# Grammar 17 (r5): the DOCUMENTS table — the substrate of every
# LLM-pipeline operator (dedup, text analysis, BPE, DSIR). Row-level
# md5 fingerprints, token counting via str_split length, and metadata
# aggregation, all in shared SQL both engines parse identically.
DOC_AGGS = [
    "COUNT(*) AS cnt",
    "MIN(n_chars) AS mn_c",
    "MAX(n_chars) AS mx_c",
    "COUNT(DISTINCT lang) AS nl",
    "COUNT(DISTINCT md5(lower(text))) AS nfp",
    "CAST(SUM(n_chars) AS BIGINT) AS sum_c",
    "MIN(md5(lower(text))) AS mn_fp",
]

DOC_GROUPS = [None, "lang", "source", "n_chars % 7"]

DOC_PREDS = [
    None,
    "n_chars BETWEEN 150 AND 500",
    "lang = 'en'",
    "source IN ('src0', 'src1')",
    "length(text) = n_chars",
    "doc_id % 97 = 0",
]


@pytest.fixture(scope="module")
def doc_engines(spark):
    spark.read.parquet(f"{SF_DIR}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_DIR}/documents.parquet'"
    )
    yield spark, con
    con.close()
    spark.catalog.dropTempView("documents")


@given(
    aggs=st.lists(
        st.sampled_from(DOC_AGGS), min_size=1, max_size=3, unique=True
    ),
    group=st.sampled_from(DOC_GROUPS),
    pred=st.sampled_from(DOC_PREDS),
)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_documents_differential(doc_engines, aggs, group, pred):
    """Metadata aggregation + row-level md5 fingerprints over the
    documents corpus, compared exactly — the substrate every extension
    operator builds on."""
    spark, con = doc_engines
    select = (f"{group} AS g, " if group else "") + ", ".join(aggs)
    sql = f"SELECT {select} FROM documents"
    if pred:
        sql += f" WHERE {pred}"
    if group:
        sql += f" GROUP BY {group}"
    spdf = spark.sql(sql).toPandas()
    opdf = con.sql(sql).df()
    assert sorted(spdf.columns) == sorted(opdf.columns), sql
    assert _canon(spdf) == _canon(opdf), sql


# Grammar 18 (r5): THREE-WAY JOINS — orders x customer x nation via
# c_nationkey, the join-reordering surface (each engine picks its own
# join order and build sides; results must agree). Inner + one optional
# outer leg; aggregates order-independent as everywhere.
TW_AGGS = [
    "COUNT(*) AS cnt",
    "COUNT(n_name) AS n_nat",
    "MIN(o_totalprice) AS mn_p",
    "MAX(c_acctbal) AS mx_b",
    "CAST(SUM(c_nationkey) AS BIGINT) AS sk",
    "COUNT(DISTINCT n_name) AS nd",
]

TW_JOINS = [
    "JOIN customer ON o_custkey = c_custkey "
    "JOIN nation ON c_nationkey = n_nationkey",
    "JOIN customer ON o_custkey = c_custkey "
    "LEFT JOIN nation ON c_nationkey = n_nationkey AND n_nationkey < 10",
    "LEFT JOIN customer ON o_custkey = c_custkey "
    "LEFT JOIN nation ON c_nationkey = n_nationkey",
]

TW_GROUPS = [None, "n_name", "o_orderstatus", "c_mktsegment"]

TW_PREDS = [
    None,
    "o_totalprice > 100000.0",
    "n_name IS NULL OR n_name >= 'J'",
    "c_acctbal > 0.0 AND o_orderstatus = 'O'",
]


@pytest.fixture(scope="module")
def threeway_engines(join_engines):
    spark, con = join_engines
    spark.read.parquet(f"{SF_DIR}/nation.parquet").createOrReplaceTempView(
        "nation"
    )
    con.execute(
        f"CREATE VIEW nation AS SELECT * FROM '{SF_DIR}/nation.parquet'"
    )
    yield spark, con
    spark.catalog.dropTempView("nation")


@given(
    aggs=st.lists(
        st.sampled_from(TW_AGGS), min_size=1, max_size=3, unique=True
    ),
    joins=st.sampled_from(TW_JOINS),
    group=st.sampled_from(TW_GROUPS),
    pred=st.sampled_from(TW_PREDS),
)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_threeway_join_differential(threeway_engines, aggs, joins,
                                           group, pred):
    """Three-relation joins with mixed inner/outer legs and an ON-clause
    extra predicate — the join-reordering/null-propagation surface,
    compared exactly."""
    spark, con = threeway_engines
    select = (f"{group} AS g, " if group else "") + ", ".join(aggs)
    sql = f"SELECT {select} FROM orders {joins}"
    if pred:
        sql += f" WHERE {pred}"
    if group:
        sql += f" GROUP BY {group}"
    spdf = spark.sql(sql).toPandas()
    opdf = con.sql(sql).df()
    assert sorted(spdf.columns) == sorted(opdf.columns), sql
    assert _canon(spdf) == _canon(opdf), sql


# Grammar 19 (r6): WINDOWS OVER GROUPED SUBQUERIES — the last
# uncomposed grammar pair (SURVEY §14.6): window functions evaluated
# over the OUTPUT of a grouped aggregate subquery. The engines plan the
# two stages through different pipelines (Spark: Aggregate under
# Window with an extra Exchange; DuckDB: hash group-by into streaming
# window), and the aggregate's result types (HUGEINT sums, empty-group
# HAVING elimination) feed straight into frames/offsets/shares.
# Determinism: the inner GROUP BY (g1, g2) makes (g1, g2) unique per
# row, and every window orders by g2 (within a g1 partition) or
# (g1, g2) globally — a total order on every row.
GW_INNER_GROUPS = [
    ("o_orderstatus", "o_orderpriority"),
    ("o_orderstatus", "o_orderkey % 7"),
    ("o_orderpriority", "o_custkey % 10"),
]

GW_WINDOWS = [
    "RANK() OVER (PARTITION BY g1 ORDER BY n DESC, g2) AS w_rk",
    "ROW_NUMBER() OVER (PARTITION BY g1 ORDER BY s, g2) AS w_rn",
    "CAST(SUM(n) OVER (PARTITION BY g1 ORDER BY g2 ROWS BETWEEN "
    "UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS w_cum",
    "LAG(s, 1) OVER (PARTITION BY g1 ORDER BY g2) AS w_lag",
    "LEAD(n, 1) OVER (ORDER BY g1, g2) AS w_lead",
    "CAST(SUM(s) OVER (PARTITION BY g1) AS BIGINT) AS w_tot",
    "ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (), 6) AS w_share",
    "NTILE(4) OVER (ORDER BY g1, g2) AS w_nt",
]

GW_INNER_PREDS = [None, "o_totalprice > 50000.0", "o_orderstatus <> 'P'"]

GW_HAVINGS = [None, "COUNT(*) > 5", "MIN(o_totalprice) < 100000.0"]

GW_OUTER_PREDS = [None, "n > 3"]


@given(
    exprs=st.lists(
        st.sampled_from(GW_WINDOWS), min_size=1, max_size=3, unique=True
    ),
    group=st.sampled_from(GW_INNER_GROUPS),
    ipred=st.sampled_from(GW_INNER_PREDS),
    having=st.sampled_from(GW_HAVINGS),
    opred=st.sampled_from(GW_OUTER_PREDS),
)
@settings(
    max_examples=110,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_window_over_group_differential(
    engines, exprs, group, ipred, having, opred
):
    """Windows over a grouped subquery: ranking/frames/offsets/shares
    computed on aggregate outputs, with inner WHERE + HAVING and an
    outer predicate below the window — compared exactly."""
    spark, con = engines
    g1, g2 = group
    iw = f" WHERE {ipred}" if ipred else ""
    hv = f" HAVING {having}" if having else ""
    ow = f" WHERE {opred}" if opred else ""
    sql = (
        f"SELECT g1, g2, n, s, {', '.join(exprs)} FROM ("
        f"SELECT {g1} AS g1, {g2} AS g2, COUNT(*) AS n, "
        f"CAST(SUM(o_orderkey) AS BIGINT) AS s "
        f"FROM orders{iw} GROUP BY {g1}, {g2}{hv}) t{ow}"
    )
    spdf = spark.sql(sql).toPandas()
    opdf = con.sql(sql).df()
    assert sorted(spdf.columns) == sorted(opdf.columns), sql
    assert _canon(spdf) == _canon(opdf), sql


# Grammar 20 (r6): PLAN-DIVERSITY — not a new SQL surface but a new
# PHYSICAL surface: the same composed queries re-run under runtime
# conf contexts that force different physical plans (no AQE re-plan,
# no broadcast joins → SMJ everywhere, a single shuffle partition →
# one-task exchanges) and compared against DuckDB each time. Results
# must be plan-invariant; a divergence here is a physical-operator
# bug (join-type fallback, partial-agg merge, window over a coalesced
# exchange) that the default-conf grammars can never see.
PD_CONFS = [
    {"spark.sql.adaptive.enabled": "false"},
    {"spark.sql.autoBroadcastJoinThreshold": "-1"},
    {"spark.sql.shuffle.partitions": "1"},
    {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "3",
    },
]

PD_SQLS = [
    # one representative per composed grammar family
    "SELECT o_orderstatus, COUNT(*) AS cnt, CAST(SUM(o_orderkey) AS BIGINT)"
    " AS sk FROM orders WHERE o_totalprice > 50000.0 GROUP BY o_orderstatus",
    "SELECT c_mktsegment AS g, COUNT(*) AS cnt, MIN(o_totalprice) AS mn"
    " FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY g",
    "SELECT c_mktsegment AS g, COUNT(o_orderkey) AS n FROM customer"
    " LEFT JOIN orders ON o_custkey = c_custkey GROUP BY g",
    "SELECT COALESCE(o_orderkey, 0 - c_custkey) AS k,"
    " RANK() OVER (PARTITION BY c_mktsegment"
    " ORDER BY COALESCE(o_orderkey, 0 - c_custkey)) AS rk"
    " FROM orders FULL JOIN customer ON o_custkey = c_custkey",
    "SELECT g1, g2, n, CAST(SUM(n) OVER (PARTITION BY g1 ORDER BY g2"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum"
    " FROM (SELECT o_orderstatus AS g1, o_orderkey % 7 AS g2,"
    " COUNT(*) AS n FROM orders GROUP BY g1, g2) t",
    "SELECT o_orderpriority AS g, COUNT(*) AS cnt FROM orders"
    " JOIN customer ON o_custkey = c_custkey"
    " GROUP BY g HAVING COUNT(*) > 5 ORDER BY cnt DESC, g LIMIT 3",
]


def test_plan_diversity_differential(join_engines):
    """Every representative query equals DuckDB under every physical
    conf context; confs restored even on failure."""
    spark, con = join_engines
    originals = {
        k: spark.conf.get(k)
        for ctx in PD_CONFS
        for k in ctx
    }
    try:
        for ctx in PD_CONFS:
            for k, v in originals.items():
                spark.conf.set(k, v)
            for k, v in ctx.items():
                spark.conf.set(k, v)
            for sql in PD_SQLS:
                spdf = spark.sql(sql).toPandas()
                opdf = con.sql(sql).df()
                assert sorted(spdf.columns) == sorted(opdf.columns), (ctx, sql)
                assert _canon(spdf) == _canon(opdf), (ctx, sql)
    finally:
        for k, v in originals.items():
            spark.conf.set(k, v)


# Grammar 21 (r6): RANDOMIZED PLAN DIVERSITY — grammar 20 compares six
# fixed queries under four fixed conf contexts; this draws the conf
# context and the query JOINTLY from hypothesis, so physical-surface
# combinations nobody enumerated (e.g. codegen off + SMJ forced + a
# FULL JOIN with a NULL group key, or shuffled-hash-join preference +
# 1-partition exchanges) get compared against DuckDB too. Every axis
# value is a supported runtime conf; results must be plan-invariant.
PD_CONF_AXES = {
    "spark.sql.adaptive.enabled": ["true", "false"],
    "spark.sql.autoBroadcastJoinThreshold": ["10485760", "-1"],
    "spark.sql.shuffle.partitions": ["1", "3", "32"],
    "spark.sql.codegen.wholeStage": ["true", "false"],
    "spark.sql.join.preferSortMergeJoin": ["true", "false"],
}


@given(
    aggs=st.lists(
        st.sampled_from(JOIN_AGGS), min_size=1, max_size=2, unique=True
    ),
    pred=st.sampled_from(JOIN_PREDS),
    jt=st.sampled_from(JOIN_TYPES),
    group=st.sampled_from(JOIN_GROUPS),
    conf=st.fixed_dictionaries(
        {},
        optional={
            k: st.sampled_from(v) for k, v in sorted(PD_CONF_AXES.items())
        },
    ),
)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_plan_diversity_differential(
    join_engines, aggs, pred, jt, group, conf
):
    """A random join-grammar query under a random physical conf context
    equals DuckDB; session confs restored even on failure."""
    spark, con = join_engines
    select = (f"{group}, " if group else "") + ", ".join(aggs)
    sql = (
        f"SELECT {select} FROM orders "
        f"{jt} customer ON o_custkey = c_custkey"
    )
    if pred:
        sql += f" WHERE {pred}"
    if group:
        sql += f" GROUP BY {group}"
    originals = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        spdf = spark.sql(sql).toPandas()
    finally:
        for k, v in originals.items():
            spark.conf.set(k, v)
    opdf = con.sql(sql).df()
    assert sorted(spdf.columns) == sorted(opdf.columns), (conf, sql)
    assert _canon(spdf) == _canon(opdf), (conf, sql)


# --- grammar 22: PIVOT (engine-specific syntax, same spec) -------------------
# Spark's SQL PIVOT clause has no DuckDB twin the fuzzer can share
# verbatim, so the grammar pairs each drawn spec (pivot values subset ×
# aggregate × optional predicate) with a DuckDB conditional-aggregation
# formulation of the SAME relation. Aggregates are chosen
# order-independent (COUNT / MIN / MAX — never a float SUM) so the
# comparison is exact. COUNT over an empty cell is 0 in both
# formulations (Spark pivot-count and the CASE-filtered count agree).

PIVOT_VALUES = [
    ["click", "view"],
    ["click", "error", "purchase"],
    ["click", "error", "purchase", "signup", "view"],
]
# Spark PIVOT leaves an ABSENT (day, type) cell NULL even for COUNT
# (the pivot is an aggregate-of-aggregates, not a filtered count), while
# the conditional-aggregation form counts an empty set as 0 — so the
# COUNT spec wraps Spark's pivot columns in COALESCE(…, 0). MIN/MAX
# agree on NULL for empty cells in both formulations.
PIVOT_AGGS = [
    (
        "COUNT(value)",
        "COUNT(CASE WHEN event_type = '{v}' THEN value END)",
        "CAST(COALESCE({v}, 0) AS BIGINT) AS {v}",
    ),
    (
        "MIN(value)",
        "MIN(CASE WHEN event_type = '{v}' THEN value END)",
        "{v}",
    ),
    (
        "MAX(value)",
        "MAX(CASE WHEN event_type = '{v}' THEN value END)",
        "{v}",
    ),
]
PIVOT_PREDS = [None, "value > 0.0", "user_id % 3 = 0"]


@given(
    values=st.sampled_from(PIVOT_VALUES),
    agg=st.sampled_from(PIVOT_AGGS),
    pred=st.sampled_from(PIVOT_PREDS),
)
@settings(
    max_examples=18,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_pivot_differential(event_engines, values, agg, pred):
    spark, con = event_engines
    spark_agg, duck_tpl, outer_tpl = agg
    where = f" WHERE {pred}" if pred else ""
    in_list = ", ".join(f"'{v}' AS {v}" for v in values)
    outer = ", ".join(outer_tpl.format(v=v) for v in values)
    spark_sql = (
        f"SELECT day, {outer} FROM ("
        f"SELECT * FROM (SELECT CAST(ts AS DATE) AS day, event_type,"
        f" value FROM events{where})"
        f" PIVOT ({spark_agg} FOR event_type IN ({in_list})))"
    )
    duck_cols = ", ".join(
        duck_tpl.format(v=v) + f" AS {v}" for v in values
    )
    duck_sql = (
        f"SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, {duck_cols}"
        f" FROM events{where} GROUP BY 1"
    )
    spdf = spark.sql(spark_sql).toPandas()
    # Spark DATE → object date; align on timestamps like an4/an10
    spdf["day"] = pd.to_datetime(spdf["day"])
    opdf = con.sql(duck_sql).df()
    assert _canon(spdf) == _canon(opdf), (spark_sql, duck_sql)


# Grammar 23 (r8): PIVOT over ORDERS — widens grammar 22 (events
# PIVOT, above) to a second table, two pivot-column domains (status and
# priority, incl. values with spaces/dashes as column names), SUM and
# date-typed aggregates, and the shared PRED pool. Same oracle
# strategy: Spark's PIVOT clause vs the DuckDB conditional-aggregation
# formulation of the SAME spec. Dialect guardrails: COUNT is excluded
# here (grammar 22 covers it with the COALESCE pinning of Spark's
# NULL-for-absent-cell semantics); SUM is CAST on the DuckDB side
# against the HUGEINT hazard.
_PIVOT_SPECS = [
    # (pivot col, its complete value domain, group col)
    ("o_orderstatus", ["O", "F", "P"], "o_orderpriority"),
    (
        "o_orderpriority",
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        "o_orderstatus",
    ),
]

_PIVOT_AGGS = [
    # (spark PIVOT aggregate, duckdb conditional-agg template)
    ("MIN(o_totalprice)", "MIN(CASE WHEN {c} THEN o_totalprice END)"),
    ("MAX(o_totalprice)", "MAX(CASE WHEN {c} THEN o_totalprice END)"),
    (
        "SUM(o_orderkey)",
        "CAST(SUM(CASE WHEN {c} THEN o_orderkey END) AS BIGINT)",
    ),
    ("MAX(o_orderdate)", "MAX(CASE WHEN {c} THEN o_orderdate END)"),
]


@given(
    spec=st.sampled_from(_PIVOT_SPECS),
    agg=st.sampled_from(_PIVOT_AGGS),
    vals=st.data(),
    pred=st.sampled_from(PREDS),
)
@settings(
    max_examples=24,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_pivot_orders_differential(engines, spec, agg, vals, pred):
    """Spark SQL PIVOT vs the equivalent DuckDB conditional
    aggregation: random pivot column / value subset / aggregate /
    predicate, compared exactly (column names included — Spark names
    pivoted columns by their IN-list literal)."""
    spark, con = engines
    pivot_col, domain, group_col = spec
    chosen = vals.draw(
        st.lists(
            st.sampled_from(domain), min_size=1, max_size=3, unique=True
        )
    )
    spark_agg, duck_tpl = agg
    where = f" WHERE {pred}" if pred else ""
    val_col = (
        "o_totalprice" if "totalprice" in spark_agg
        else "o_orderdate" if "orderdate" in spark_agg
        else "o_orderkey"
    )
    spark_sql = (
        f"SELECT * FROM (SELECT {group_col}, {pivot_col}, {val_col} "
        f"FROM orders{where}) "
        f"PIVOT ({spark_agg} FOR {pivot_col} IN "
        f"({', '.join(repr(v) for v in chosen)}))"
    )
    duck_cols = ", ".join(
        duck_tpl.format(c=f"{pivot_col} = {v!r}") + f' AS "{v}"'
        for v in chosen
    )
    duck_sql = (
        f"SELECT {group_col}, {duck_cols} FROM orders{where} "
        f"GROUP BY {group_col}"
    )
    spdf = spark.sql(spark_sql).toPandas()
    opdf = con.sql(duck_sql).df()
    assert _canon(spdf) == _canon(opdf), (spark_sql, duck_sql)


# Grammar 24 (r8): UNPIVOT — the inverse reshape of grammars 22/23.
# Spark's SQL UNPIVOT clause vs the UNION-ALL formulation of the same
# relation. Dialect guardrails: Spark UNPIVOT drops NULL measure
# values by default, so the UNION-ALL side filters val IS NOT NULL
# (lineitem measures are non-null, but the rule is load-bearing for
# any nullable column); measures must share one type (all four
# lineitem measures are DOUBLE).
_UNPIVOT_MEASURES = [
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
]
_UNPIVOT_PREDS = [
    None,
    "l_orderkey % 5 = 0",
    "l_quantity > 25.0",
    "l_returnflag = 'R'",
]


@pytest.fixture(scope="module")
def lineitem_engines(engines):
    spark, con = engines
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").createOrReplaceTempView(
        "lineitem"
    )
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF_DIR}/lineitem.parquet'"
    )
    yield spark, con
    spark.catalog.dropTempView("lineitem")


@given(
    measures=st.lists(
        st.sampled_from(_UNPIVOT_MEASURES),
        min_size=1,
        max_size=4,
        unique=True,
    ),
    pred=st.sampled_from(_UNPIVOT_PREDS),
    grouped=st.booleans(),
)
@settings(
    max_examples=24,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_unpivot_differential(
    lineitem_engines, measures, pred, grouped
):
    """Spark SQL UNPIVOT vs the equivalent UNION ALL: random measure
    subset / predicate, compared exactly both as the raw long relation
    and re-aggregated per metric."""
    spark, con = lineitem_engines
    where = f" WHERE {pred}" if pred else ""
    spark_sql = (
        f"SELECT l_orderkey, l_linenumber, metric, val "
        f"FROM (SELECT * FROM lineitem{where}) "
        f"UNPIVOT (val FOR metric IN ({', '.join(measures)}))"
    )
    duck_sql = " UNION ALL ".join(
        f"SELECT l_orderkey, l_linenumber, '{m}' AS metric, {m} AS val "
        f"FROM lineitem{where} AND {m} IS NOT NULL"
        if pred
        else f"SELECT l_orderkey, l_linenumber, '{m}' AS metric, {m} AS val "
        f"FROM lineitem WHERE {m} IS NOT NULL"
        for m in measures
    )
    if grouped:
        spark_sql = (
            f"SELECT metric, COUNT(*) AS n, MIN(val) AS mn, MAX(val) AS mx "
            f"FROM ({spark_sql}) GROUP BY metric"
        )
        duck_sql = (
            f"SELECT metric, COUNT(*) AS n, MIN(val) AS mn, MAX(val) AS mx "
            f"FROM ({duck_sql}) GROUP BY metric"
        )
    spdf = spark.sql(spark_sql).toPandas()
    opdf = con.sql(duck_sql).df()
    assert _canon(spdf) == _canon(opdf), (spark_sql, duck_sql)


# Grammar 25 (r8): EXPLODE / UNNEST — the reshape every text operator
# rides (tx3's vocabulary build, tx12's heavy hitters, lm1's bigrams).
# Spark's LATERAL VIEW explode vs DuckDB's UNNEST over the same
# str_split, raw and re-aggregated. Dialect guardrails: the token
# expression is shared verbatim (split semantics already pinned by the
# documents grammar); COUNT/MIN/MAX only, SUM of LENGTH CAST BIGINT.
_EXPLODE_PREDS = [
    None,
    "lang = 'en'",
    "n_chars > 200",
    "doc_id % 3 = 1",
]
_EXPLODE_AGGS = [
    ("COUNT(*) AS n", "COUNT(*) AS n"),
    ("COUNT(DISTINCT tok) AS n_types", "COUNT(DISTINCT tok) AS n_types"),
    ("MIN(tok) AS mn_tok", "MIN(tok) AS mn_tok"),
    ("MAX(tok) AS mx_tok", "MAX(tok) AS mx_tok"),
    (
        "CAST(SUM(LENGTH(tok)) AS BIGINT) AS n_tok_chars",
        "CAST(SUM(LENGTH(tok)) AS BIGINT) AS n_tok_chars",
    ),
]


@given(
    aggs=st.lists(
        st.sampled_from(_EXPLODE_AGGS), min_size=1, max_size=3, unique=True
    ),
    pred=st.sampled_from(_EXPLODE_PREDS),
    group=st.sampled_from([None, "doc_id", "lang"]),
)
@settings(
    max_examples=24,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_explode_unnest_differential(doc_engines, aggs, pred, group):
    """Spark LATERAL VIEW explode vs DuckDB UNNEST over the same
    tokenization, compared exactly after aggregation (the raw long
    relation is corpus-token-sized; the aggregate pins the same rows
    without a 100k-row pandas compare per example)."""
    spark, con = doc_engines
    where = f" WHERE {pred}" if pred else ""
    gcols = f"{group}, " if group else ""
    gby = f" GROUP BY {group}" if group else ""
    sel = ", ".join(a[0] for a in aggs)
    spark_sql = (
        f"SELECT {gcols}{sel} FROM (SELECT doc_id, lang, tok FROM "
        f"(SELECT * FROM documents{where}) "
        f"LATERAL VIEW explode(split(lower(text), ' ')) t AS tok)"
        f"{gby}"
    )
    duck_sel = ", ".join(a[1] for a in aggs)
    duck_sql = (
        f"SELECT {gcols}{duck_sel} FROM (SELECT doc_id, lang, "
        f"UNNEST(str_split(lower(text), ' ')) AS tok "
        f"FROM documents{where}){gby}"
    )
    spdf = spark.sql(spark_sql).toPandas()
    opdf = con.sql(duck_sql).df()
    assert _canon(spdf) == _canon(opdf), (spark_sql, duck_sql)

# Grammar 26 (r9): LATERAL VIEW OUTER / posexplode — the null-padding
# and position semantics grammar 25 can't see (its explode is inner and
# positionless). A filter() lambda over the token array makes EMPTY
# arrays genuinely common (every token shorter than the drawn cutoff),
# so the OUTER branch actually pads: Spark's LATERAL VIEW OUTER
# posexplode emits one (NULL pos, NULL tok) row per empty array, which
# DuckDB reproduces as LEFT JOIN LATERAL over the lockstep
# UNNEST + generate_subscripts pair (verified: pads NULL/NULL the same
# way; CROSS JOIN LATERAL is the inner twin). Dialect guardrails:
# position aggregates are CAST AS BIGINT in the shared text (Spark pos
# is INT, DuckDB's subscripts are BIGINT, and DuckDB SUM would go
# HUGEINT); COUNT(tok) vs COUNT(*) is deliberately in the pool — the
# pad rows make them differ, which is exactly the OUTER semantics
# under test.
_G26_ARRS = [
    # (spark array expr, duckdb array expr) — same semantics
    (
        "split(lower(text), ' ')",
        "str_split(lower(text), ' ')",
    ),
] + [
    (
        f"filter(split(lower(text), ' '), x -> length(x) > {k})",
        f"list_filter(str_split(lower(text), ' '), x -> length(x) > {k})",
    )
    for k in (3, 5, 7)
]
_G26_COMMON_AGGS = [
    "COUNT(*) AS n_rows",
    "COUNT(tok) AS n_toks",
    "COUNT(DISTINCT tok) AS n_types",
    "MIN(tok) AS mn_tok",
    "MAX(tok) AS mx_tok",
]
_G26_POS_AGGS = [
    "CAST(MAX(pos) AS BIGINT) AS mx_pos",
    "CAST(SUM(pos) AS BIGINT) AS sum_pos",
    "COUNT(pos) AS n_pos",
]


@given(
    arr=st.sampled_from(_G26_ARRS),
    outer=st.booleans(),
    use_pos=st.booleans(),
    aggs=st.data(),
    pred=st.sampled_from(_EXPLODE_PREDS),
    group=st.sampled_from([None, "lang", "doc_id"]),
)
@settings(
    max_examples=32,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_lateral_outer_posexplode_differential(
    doc_engines, arr, outer, use_pos, aggs, pred, group
):
    """Spark LATERAL VIEW [OUTER] explode/posexplode vs DuckDB
    [LEFT|CROSS] JOIN LATERAL UNNEST with lockstep subscripts: random
    array expression (incl. lambda filters that empty out), outer-ness,
    position-ness, aggregate subset, predicate and grouping — compared
    exactly after aggregation."""
    spark, con = doc_engines
    arr_s, arr_d = arr
    pool = _G26_COMMON_AGGS + (_G26_POS_AGGS if use_pos else [])
    sel = ", ".join(
        aggs.draw(
            st.lists(st.sampled_from(pool), min_size=1, max_size=3,
                     unique=True)
        )
    )
    where = f" WHERE {pred}" if pred else ""
    gcols = f"{group}, " if group else ""
    gby = f" GROUP BY {group}" if group else ""
    lv = "LATERAL VIEW OUTER" if outer else "LATERAL VIEW"
    gen = (
        f"posexplode(arr) t AS pos, tok" if use_pos
        else "explode(arr) t AS tok"
    )
    inner_cols = "doc_id, lang, pos, tok" if use_pos else "doc_id, lang, tok"
    spark_sql = (
        f"SELECT {gcols}{sel} FROM (SELECT {inner_cols} FROM "
        f"(SELECT doc_id, lang, {arr_s} AS arr FROM documents{where}) "
        f"{lv} {gen}){gby}"
    )
    join = (
        "LEFT JOIN LATERAL" if outer else "CROSS JOIN LATERAL"
    )
    on = " ON true" if outer else ""
    duck_sql = (
        f"SELECT {gcols}{sel} FROM (SELECT d.doc_id, d.lang, u.pos, u.tok "
        f"FROM (SELECT doc_id, lang, {arr_d} AS arr FROM documents{where}) d "
        f"{join} (SELECT UNNEST(d.arr) AS tok, "
        f"generate_subscripts(d.arr, 1) - 1 AS pos) u{on}){gby}"
    )
    spdf = spark.sql(spark_sql).toPandas()
    opdf = con.sql(duck_sql).df()
    assert _canon(spdf) == _canon(opdf), (spark_sql, duck_sql)


# ---- grammar 27: random window FRAMES (ROWS / RANGE bounds) ----------------
# w8 introduced the RANGE-frame surface; this grammar fuzzes the whole
# frame-specification lattice — ROWS vs RANGE, every start/end bound
# combination, random offsets, random partitioning — with integer-exact
# aggregates over a quantized value so no engine's windowed-sum
# evaluation order (DuckDB segment tree vs Spark frame scan) can drift
# the comparison. ORDER BY event_id is unique, so RANGE peers are
# singletons and both frame types are total-order deterministic.

_G27_PARTS = ["", "PARTITION BY user_id % 7 ", "PARTITION BY event_type "]
_G27_AGGS = [
    "CAST(SUM(vq) OVER w AS BIGINT) AS w_sum",
    "COUNT(*) OVER w AS w_cnt",
    "MIN(vq) OVER w AS w_min",
    "MAX(vq) OVER w AS w_max",
    "COUNT(vq) OVER w AS w_nnull",
]


@given(
    mode=st.sampled_from(["ROWS", "RANGE"]),
    start=st.sampled_from(["UNBOUNDED PRECEDING", "PRECEDING", "CURRENT ROW"]),
    end=st.sampled_from(["CURRENT ROW", "FOLLOWING", "UNBOUNDED FOLLOWING"]),
    n1=st.integers(min_value=0, max_value=25),
    n2=st.integers(min_value=0, max_value=25),
    part=st.sampled_from(_G27_PARTS),
    aggs=st.lists(
        st.sampled_from(_G27_AGGS), min_size=1, max_size=3, unique=True
    ),
)
@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_window_frame_differential(
    event_engines, mode, start, end, n1, n2, part, aggs
):
    """Frame-specification lattice compared exactly: ROWS and RANGE
    with every bound combination and random integer offsets (RANGE
    offsets are in ORDER-BY units over the unique event_id). One SQL
    string runs on both engines; aggregates are integer-exact."""
    spark, con = event_engines
    # RANGE offsets in event_id units scale by 40 so frames actually
    # straddle a varying number of rows within each partition
    k1, k2 = (n1 * 40, n2 * 40) if mode == "RANGE" else (n1, n2)
    lo = f"{k1} PRECEDING" if start == "PRECEDING" else start
    hi = f"{k2} FOLLOWING" if end == "FOLLOWING" else end
    sql = (
        "SELECT event_id, "
        + ", ".join(aggs)
        + " FROM (SELECT event_id, user_id, event_type,"
        " CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vq FROM events)"
        f" WINDOW w AS ({part}ORDER BY event_id"
        f" {mode} BETWEEN {lo} AND {hi})"
    )
    spdf = spark.sql(sql).toPandas()
    opdf = con.sql(sql).df()
    assert sorted(spdf.columns) == sorted(opdf.columns), sql
    assert _canon(spdf) == _canon(opdf), sql


# ---- grammar 28: GROUPING SETS x window composition -------------------------
# Grammar 10 checks the grouping forms alone; this composes them with a
# window OVER the super-aggregate result — ranking rows WITHIN each
# grouping set (partition by the portable grouping-id expression
# GROUPING(a) + 2*GROUPING(b)). The trap being fuzzed: the two engines
# disagree on default NULL ordering (Spark ASC = NULLS FIRST, DuckDB
# ASC = NULLS LAST) and super-aggregate rows are FULL of NULL keys, so
# every ORDER BY in the window spells its NULLS placement explicitly.

_G28_FORMS = [
    "ROLLUP (o_orderstatus, o_orderpriority)",
    "CUBE (o_orderstatus, o_orderpriority)",
    "GROUPING SETS ((o_orderstatus), (o_orderpriority), ())",
    "GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus))",
]
_G28_AGGS = [
    "COUNT(*)",
    "CAST(SUM(o_orderkey) AS BIGINT)",
    "MIN(o_orderkey)",
    "COUNT(DISTINCT o_custkey)",
]
_G28_RANKS = ["RANK()", "DENSE_RANK()", "ROW_NUMBER()"]


@given(
    form=st.sampled_from(_G28_FORMS),
    agg=st.sampled_from(_G28_AGGS),
    rank=st.sampled_from(_G28_RANKS),
    pred=st.sampled_from(
        [None, "o_totalprice > 50000.0", "o_orderstatus <> 'F'"]
    ),
)
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_grouping_sets_window_differential(engines, form, agg, rank, pred):
    """Rank super-aggregate rows within their grouping set — one SQL
    string through both engines, integer-exact measure, explicit NULLS
    FIRST on every null-bearing order key, ROW_NUMBER tie-broken to a
    total order."""
    spark, con = engines
    where = f" WHERE {pred}" if pred else ""
    gid = "GROUPING(o_orderstatus) + 2 * GROUPING(o_orderpriority)"
    sql = (
        f"SELECT g_id, o_orderstatus, o_orderpriority, m, "
        f"{rank} OVER (PARTITION BY g_id ORDER BY m DESC,"
        f" o_orderstatus ASC NULLS FIRST,"
        f" o_orderpriority ASC NULLS FIRST) AS rnk "
        f"FROM (SELECT {gid} AS g_id, o_orderstatus, o_orderpriority,"
        f" {agg} AS m FROM orders{where} GROUP BY {form})"
    )
    spdf = spark.sql(sql).toPandas()
    opdf = con.sql(sql).df()
    assert sorted(spdf.columns) == sorted(opdf.columns), sql
    assert _canon(spdf) == _canon(opdf), sql


# ---- grammar 29: QUALIFY / filter-over-window ------------------------------
# DuckDB has native QUALIFY; Spark 4 does not — the portable form is a
# subquery filter on the window column, which is what every registry
# top-n-per-key operator (w1, t1) actually compiles to. The grammar
# draws one window function, partition/order keys, and a qualify
# predicate, then runs DuckDB's native QUALIFY against Spark's
# desugared subquery — same spec, dialect-specific syntax (the pivot
# grammars' convention). Ranking functions get a ROW_NUMBER-style
# unique tie-break via event_id so predicates over ties are total-order
# deterministic; value-typed functions (lag/sum) are quantized to
# BIGINT so the qualify comparison is integer-exact.

_G29_FNS = [
    # (window expression, qualify predicates that fit its type)
    ("ROW_NUMBER()", ["w <= 3", "w = 1", "w BETWEEN 2 AND 5"]),
    ("RANK()", ["w <= 3", "w = 1"]),
    ("DENSE_RANK()", ["w <= 4", "w = 2"]),
    (
        "CAST(COALESCE(LAG(vq) OVER w_ord, -1) AS BIGINT)",
        ["w < vq", "w = -1", "w >= vq"],
    ),
    (
        "CAST(SUM(vq) OVER w_run AS BIGINT)",
        ["w <= 5000", "w > 20000"],
    ),
]
_G29_PARTS = ["user_id % 5", "event_type"]
_G29_ORDS = ["event_id", "vq DESC, event_id"]


@given(
    fn_i=st.integers(0, len(_G29_FNS) - 1),
    pred_i=st.integers(0, 9),
    part=st.sampled_from(_G29_PARTS),
    ordk=st.sampled_from(_G29_ORDS),
    pre=st.sampled_from([None, "value > 0.1", "event_type <> 'view'"]),
)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_qualify_window_filter_differential(
    event_engines, fn_i, pred_i, part, ordk, pre
):
    """One drawn spec, two dialects: DuckDB `... QUALIFY p(w)` vs
    Spark `SELECT * FROM (...) WHERE p(w)` — results must canonize
    identically. Catches desugaring traps: QUALIFY evaluating before
    vs after SELECT-list projection, and predicate pushdown through
    the window (illegal — a filtered row changes its peers' frames)."""
    spark, con = event_engines
    fn, preds = _G29_FNS[fn_i]
    qual = preds[pred_i % len(preds)]
    base = (
        "SELECT event_id, user_id, event_type,"
        " CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vq"
        f" FROM events WHERE value IS NOT NULL{' AND ' + pre if pre else ''}"
    )
    win = fn.replace("OVER w_ord", "OVER w").replace("OVER w_run", "OVER w")
    if "OVER" not in win:
        win = f"{win} OVER w"
    if "ROW_NUMBER" in fn or "RANK" in fn:
        w_def = f"PARTITION BY {part} ORDER BY {ordk}"
    elif "LAG" in fn:
        w_def = f"PARTITION BY {part} ORDER BY event_id"
    else:  # running sum
        w_def = (
            f"PARTITION BY {part} ORDER BY event_id"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
        )
    inner = (
        f"SELECT event_id, vq, {win} AS w FROM ({base})"
        f" WINDOW w AS ({w_def})"
    )
    sql_duck = f"{inner} QUALIFY {qual}"
    sql_spark = f"SELECT * FROM ({inner}) WHERE {qual}"
    spdf = spark.sql(sql_spark).toPandas()
    opdf = con.sql(sql_duck).df()
    assert sorted(spdf.columns) == sorted(opdf.columns), sql_duck
    assert _canon(spdf) == _canon(opdf), sql_duck


# ---- grammar 30: stateful-twin state machines under random slicing ---------
# The engine-level streaming replays (tests/test_ingest_streaming.py)
# pin each applyInPandasWithState twin against its batch operator at
# ONE or a few slicings — a real Structured Streaming run per example
# is too slow to fuzz. This grammar fuzzes the part slicing can break:
# the UPDATE FUNCTION's state machine. A FakeGroupState drives the
# twin's actual update callable (the very function the stream runs)
# through hypothesis-drawn micro-batch partitions, and the accumulated
# emissions must equal a closed-form single-pass recomputation — for
# EVERY drawn slicing. attribution/copurchase/shard_packer were the
# hand-sliced-only twins (VERDICT r9 #6); running-totals/hourly already
# have engine-level hypothesis fuzz.

import datetime as _dt

import numpy as _np
import pandas as _pd


class _FakeGroupState:
    """State double exposing the GroupState surface the twins use."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        if self._v is None:
            raise ValueError("state does not exist")
        return self._v

    def update(self, v):
        self._v = tuple(v)


def _drive(update, key, batches):
    """Feed pandas micro-batches through a twin's update callable with
    one persistent fake state, collecting every emission."""
    state = _FakeGroupState()
    out = []
    for pdf in batches:
        out.extend(update(key, iter([pdf]), state))
    return out


def _cut(df, cuts):
    """Contiguous micro-batches: split an ordered frame at the drawn
    row positions (the time-ordered file-replay shape)."""
    bounds = sorted({min(c, len(df)) for c in cuts})
    pieces, lo = [], 0
    for b in bounds + [len(df)]:
        pieces.append(df.iloc[lo:b].reset_index(drop=True))
        lo = b
    return pieces


@pytest.fixture(scope="module")
def twin_events(spark):
    from etl_project_spark.catalog import load_table

    ev = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .toPandas()
    )
    return ev


@given(
    user_pick=st.integers(0, 10_000),
    cuts=st.lists(st.integers(0, 500), min_size=1, max_size=6),
)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_attribution_state_machine_under_random_slicing(
    twin_events, user_pick, cuts
):
    """attribution_stream's update fn over a random user's time-ordered
    events, cut at random positions: emitted rows must equal the
    closed-form last-touch walk (touch carried ACROSS batch boundaries
    included), independent of the slicing."""
    from etl_project_spark.streaming.stateful import (
        AN9_WINDOW_US,
        attribution_update,
    )

    ev = twin_events
    users = sorted(ev["user_id"].unique())
    uid = users[user_pick % len(users)]
    mine = (
        ev[ev["user_id"] == uid]
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    update = attribution_update
    got = _drive(update, (uid,), _cut(mine, cuts))
    got_rows = sorted(
        (
            int(r["conv_event_id"]),
            r["touch_event_id"],
            r["touch_type"],
            r["gap_sec"],
        )
        for pdf in got
        for r in pdf.to_dict("records")
    )
    # closed form: single pass, last click/view before each purchase
    expect, touch = [], None
    for _, row in mine.iterrows():
        ts_us = int(_pd.Timestamp(row["ts"]).value // 1000)
        if row["event_type"] == "purchase":
            rec = (int(row["event_id"]), None, None, None)
            if touch is not None and ts_us - touch[1] <= AN9_WINDOW_US:
                rec = (
                    int(row["event_id"]),
                    touch[0],
                    touch[2],
                    (ts_us - touch[1]) // 1_000_000,
                )
            expect.append(rec)
        elif row["event_type"] in ("click", "view"):
            touch = (int(row["event_id"]), ts_us, row["event_type"])
    assert got_rows == sorted(expect)


@pytest.fixture(scope="module")
def twin_lineitem(spark):
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .toPandas()
    )
    return li


@given(
    order_pick=st.integers(0, 10_000),
    salt=st.integers(0, 7),
    n_slices=st.integers(1, 5),
)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_copurchase_state_machine_under_random_slicing(
    twin_lineitem, order_pick, salt, n_slices
):
    """copurchase_pairs_stream's update fn with one order's items
    scattered across ARBITRARY (hash-drawn, order-shuffling) batches:
    the emitted pair multiset must be exactly the unordered distinct
    pairs, each ONCE — pairs(S ∪ N) − pairs(S) walked item-at-a-time
    cannot double-emit under any slicing."""
    from collections import Counter

    from etl_project_spark.streaming.stateful import copurchase_update

    li = twin_lineitem
    orders = sorted(li["l_orderkey"].unique())
    okey = orders[order_pick % len(orders)]
    items = li[li["l_orderkey"] == okey].reset_index(drop=True)
    # arbitrary partition AND arbitrary order: hash-bucket by salt
    h = (items["l_partkey"] * 2654435761 + salt) % 2**31
    batches = [
        items[h % n_slices == i]
        .sort_values("l_partkey", ascending=bool((salt + i) % 2))
        .reset_index(drop=True)
        for i in range(n_slices)
    ]
    update = copurchase_update
    got = Counter(
        (int(r["part_a"]), int(r["part_b"]))
        for pdf in _drive(update, (okey,), batches)
        for r in pdf.to_dict("records")
    )
    import itertools

    distinct = sorted(set(items["l_partkey"].astype(int)))
    expect = Counter(
        (a, b) for a, b in itertools.combinations(distinct, 2)
    )
    assert got == expect


@given(
    source_pick=st.integers(0, 100),
    cuts=st.lists(st.integers(0, 400), min_size=1, max_size=6),
    budget=st.sampled_from([512, 2048, 8192]),
)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_shard_packer_state_machine_under_random_slicing(
    spark, source_pick, cuts, budget
):
    """shard_packer's update fn over one source's doc stream cut at
    random positions: the (doc -> shard) assignment must equal a
    single-pass greedy replay with the same budget — the open-shard
    (id, fill) state carried across batch boundaries is the whole
    invariant."""
    from etl_project_spark.streaming.stateful import shard_packer_update

    global _G30_DOCS
    try:
        docs = _G30_DOCS
    except NameError:
        docs = _G30_DOCS = (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .selectExpr(
                "source",
                "doc_id",
                "greatest(1, cast(length(text) / 4 as long)) as n_tokens",
            )
            .toPandas()
        )
    sources = sorted(docs["source"].unique())
    srcname = sources[source_pick % len(sources)]
    mine = (
        docs[docs["source"] == srcname]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    update = shard_packer_update(budget)
    got = {}
    for pdf in _drive(update, (srcname,), _cut(mine, cuts)):
        for r in pdf.to_dict("records"):
            got[int(r["doc_id"])] = int(r["shard_id"])
    shard, filled, expect = 0, 0, {}
    for _, row in mine.iterrows():
        n = int(row["n_tokens"])
        if filled > 0 and filled + n > budget:
            shard, filled = shard + 1, 0
        expect[int(row["doc_id"])] = shard
        filled += n
    assert got == expect


# ---- grammar 31: MERGE upsert (cdc4) under random batch mixes --------------
# cdc4's fixture exercises whatever action mix the events table happens
# to contain; this grammar DRAWS the mix — random live snapshots,
# random batches with tombstones / multi-version keys / duplicate
# timestamps (the (ts, event_id) tie-break), brand-new keys and
# tombstones for absent keys — and runs merge_snapshot against the
# same full-outer-join CASE in DuckDB over the identical relations.


@given(
    n_keys=st.integers(3, 25),
    seed=st.integers(0, 2**31 - 1),
)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_merge_upsert_differential(spark, n_keys, seed):
    """merge_snapshot vs DuckDB's full-outer CASE over hypothesis-built
    snapshot/batch relations: every action arm, duplicate-ts
    tie-breaks, and multi-version batches compared exactly."""
    import random as _random

    rng = _random.Random(seed)
    base = _dt.datetime(2024, 1, 1)
    tgt_rows, batch_rows, eid = [], [], 0
    for k in range(n_keys):
        et = rng.choice(["click", "view", "buy"])
        live = rng.random() < 0.7
        if live:
            tgt_rows.append(
                (k, et, base + _dt.timedelta(hours=k), float(k) + 0.5)
            )
        n_changes = rng.randint(0, 3)
        # duplicate timestamps with probability: same offset drawn twice
        offs = [rng.randint(0, 5) for _ in range(n_changes)]
        for o in offs:
            eid += 1
            val = (
                None
                if rng.random() < 0.25
                else round(rng.uniform(-5, 5), 3)
            )
            batch_rows.append(
                (
                    eid,
                    base + _dt.timedelta(days=40, hours=o),
                    k,
                    et,
                    val,
                )
            )
    tgt = spark.createDataFrame(
        tgt_rows or [(999999, "click", base, 0.0)],
        "user_id long, event_type string, ts timestamp, value double",
    )
    batch = spark.createDataFrame(
        batch_rows or [(1, base + _dt.timedelta(days=40), 999998, "view", 1.0)],
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double",
    )
    from etl_project_spark.operators.cdc import merge_snapshot

    spdf = merge_snapshot(tgt, batch).toPandas()

    con = duckdb.connect()
    con.register("tgt_pdf", tgt.toPandas())
    con.register("batch_pdf", batch.toPandas())
    opdf = con.sql(
        """
        WITH src AS (
            SELECT user_id, event_type, ts, value FROM (
                SELECT user_id, event_type, ts, value,
                       ROW_NUMBER() OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY ts DESC, event_id DESC) AS rn
                FROM batch_pdf
            ) WHERE rn = 1
        )
        SELECT user_id, event_type, last_ts, value, action FROM (
            SELECT user_id, event_type,
                   COALESCE(s.ts, t.ts) AS last_ts,
                   CASE WHEN s.ts IS NULL THEN t.value
                        ELSE s.value END AS value,
                   CASE WHEN s.ts IS NULL THEN 'keep'
                        WHEN s.value IS NULL THEN 'delete'
                        WHEN t.ts IS NULL THEN 'insert'
                        ELSE 'update' END AS action
            FROM tgt_pdf t FULL OUTER JOIN src s
                USING (user_id, event_type)
        ) WHERE action <> 'delete'
        """
    ).df()
    con.close()
    assert sorted(spdf.columns) == sorted(opdf.columns)
    assert _canon(spdf) == _canon(opdf), (n_keys, seed)


# ---- grammar 32: incremental SCD2 merge under drawn watermarks -------------
# cdc5's invariant is that the INCREMENTAL plan (close open rows +
# append the batch's chain) equals a FULL cdc2 rebuild for any cut
# position. The registered query fixes one watermark; this grammar
# draws the stream AND the cut — multi-version keys, duplicate
# timestamps (tie-broken by event_id), keys entirely pre- or
# post-watermark — and compares scd2_merge against the watermark-tagged
# full rebuild evaluated by DuckDB over the identical relation.


@given(
    n_keys=st.integers(2, 15),
    wm_day=st.integers(1, 9),
    seed=st.integers(0, 2**31 - 1),
)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_scd2_merge_differential_under_drawn_watermark(
    spark, n_keys, wm_day, seed
):
    import random as _random

    rng = _random.Random(seed)
    base = _dt.datetime(2024, 3, 1)
    rows, eid = [], 0
    for k in range(n_keys):
        et = rng.choice(["click", "view"])
        n_versions = rng.randint(1, 6)
        days = [rng.randint(0, 10) for _ in range(n_versions)]
        for d in days:  # duplicate days exercise the event_id tie-break
            eid += 1
            rows.append(
                (
                    eid,
                    base + _dt.timedelta(days=d, hours=k % 3),
                    k,
                    et,
                    round(rng.uniform(-3, 3), 3),
                )
            )
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double",
    )
    wm = (base + _dt.timedelta(days=wm_day)).strftime(
        "%Y-%m-%d %H:%M:%S"
    )
    from etl_project_spark.operators.cdc import scd2_merge

    spdf = scd2_merge(ev, wm).toPandas()
    con = duckdb.connect()
    con.register("ev_pdf", ev.toPandas())
    opdf = con.sql(
        f"""
        WITH v AS (
            SELECT user_id, event_type, value, ts AS valid_from,
                   LEAD(ts) OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts ASC, event_id ASC) AS valid_to
            FROM ev_pdf
        )
        SELECT user_id, event_type, value, valid_from, valid_to,
               (valid_to IS NULL) AS is_current,
               CASE WHEN valid_from >= TIMESTAMP '{wm}' THEN 'appended'
                    WHEN valid_to IS NOT NULL
                         AND valid_to >= TIMESTAMP '{wm}' THEN 'closed'
                    ELSE 'history' END AS origin
        FROM v
        """
    ).df()
    con.close()
    assert sorted(spdf.columns) == sorted(opdf.columns)
    assert _canon(spdf) == _canon(opdf), (n_keys, wm_day, seed)


# ---- grammar 33: QUALIFY over grouped input + named-window reuse -----------
# Grammar 29 draws over the raw events relation with a single window;
# this composes the same dialect pair (DuckDB native QUALIFY vs
# Spark's subquery-filter desugaring) with (a) a GROUP BY underneath —
# the window runs over the AGGREGATED relation — and (b) TWO named
# windows where the qualify predicate references both (e.g. rank
# within group vs global running share). Integer-exact measures.

_G33_GROUPS = [
    ("user_id % 11", "grp"),
    ("event_type", "grp"),
    ("CAST(EXTRACT(hour FROM ts) AS BIGINT)", "grp"),
]
_G33_PREDS = [
    "r <= 2",
    "r = 1 AND c > 1",
    "c >= r",
    "r < c",
]


@given(
    g_i=st.integers(0, len(_G33_GROUPS) - 1),
    pred=st.sampled_from(_G33_PREDS),
    desc=st.booleans(),
    pre=st.sampled_from([None, "value > 0.0", "event_id % 3 = 0"]),
)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_qualify_over_group_named_windows_differential(
    event_engines, g_i, pred, desc, pre
):
    """QUALIFY predicates referencing TWO named windows over a grouped
    relation — rank by aggregate within a secondary key vs a global
    cumulative count — one spec, two dialects, exact compare."""
    spark, con = event_engines
    expr, alias = _G33_GROUPS[g_i]
    where = f" WHERE {pre}" if pre else ""
    direction = "DESC" if desc else "ASC"
    grouped = (
        f"SELECT {expr} AS {alias}, event_type AS et,"
        " CAST(COUNT(*) AS BIGINT) AS n,"
        " CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)"
        " AS sq"
        f" FROM events{where}"
        f" GROUP BY {expr}, event_type"
    )
    inner = (
        f"SELECT {alias}, et, n,"
        " ROW_NUMBER() OVER w1 AS r,"
        " CAST(COUNT(*) OVER w2 AS BIGINT) AS c"
        f" FROM ({grouped})"
        f" WINDOW w1 AS (PARTITION BY et ORDER BY n {direction},"
        f" sq {direction} NULLS FIRST, {alias}),"
        f" w2 AS (ORDER BY n {direction}, sq {direction} NULLS FIRST,"
        f" et, {alias} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    sql_duck = f"{inner} QUALIFY {pred}"
    sql_spark = f"SELECT * FROM ({inner}) WHERE {pred}"
    spdf = spark.sql(sql_spark).toPandas()
    opdf = con.sql(sql_duck).df()
    assert sorted(spdf.columns) == sorted(opdf.columns), sql_duck
    assert _canon(spdf) == _canon(opdf), sql_duck


# ---- grammar 34: LATERAL correlated subquery joins (VERDICT r10 #7) ---------
# The join grammars (2, 11) only compose uncorrelated relations; the
# subquery grammar (12) correlates in WHERE/SELECT position. LATERAL
# correlates in FROM position — per outer row the inner subquery
# re-evaluates — and is the declarative form of j6/t1-style
# top-k-per-key. Both engines accept the identical text for the
# comma-lateral and LEFT JOIN LATERAL forms; the inner query is either
# a fully-tie-broken ORDER BY ... LIMIT k (deterministic set) or an
# exact-integer aggregate. Outer side bounded (c_custkey % 31 = r) so
# 60 examples stay fast at sf0.001.

_G34_INNER_PREDS = [
    "TRUE",
    "o.o_orderstatus = 'O'",
    "o.o_totalprice > 100000.0",
    "o.o_orderkey % 2 = 0",
]


@given(
    r=st.integers(0, 30),
    k=st.integers(1, 3),
    desc=st.booleans(),
    ipred=st.sampled_from(_G34_INNER_PREDS),
    left=st.booleans(),
    agg_form=st.booleans(),
)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_lateral_join_differential(
    join_engines, r, k, desc, ipred, left, agg_form
):
    """One LATERAL spec, one SQL text, two engines: per-customer
    top-k orders (tie-broken to a deterministic set) or a per-customer
    exact-integer aggregate, under comma-LATERAL (inner semantics:
    customers with no qualifying order vanish) and LEFT JOIN LATERAL
    (they survive with NULLs)."""
    spark, con = join_engines
    direction = "DESC" if desc else "ASC"
    if agg_form:
        inner = (
            "SELECT CAST(COUNT(*) AS BIGINT) AS n,"
            " CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))"
            " AS BIGINT) AS cents,"
            " MIN(o.o_orderkey) AS first_key"
            " FROM orders o"
            f" WHERE o.o_custkey = c.c_custkey AND {ipred}"
        )
        proj = "t.n, t.cents, t.first_key"
    else:
        inner = (
            "SELECT o.o_orderkey AS okey,"
            " CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents"
            " FROM orders o"
            f" WHERE o.o_custkey = c.c_custkey AND {ipred}"
            f" ORDER BY o.o_totalprice {direction}, o.o_orderkey"
            f" LIMIT {k}"
        )
        proj = "t.okey, t.cents"
    outer = "customer c"
    if left:
        sql = (
            f"SELECT c.c_custkey, {proj} FROM {outer}"
            f" LEFT JOIN LATERAL ({inner}) t ON TRUE"
            f" WHERE c.c_custkey % 31 = {r}"
        )
    else:
        sql = (
            f"SELECT c.c_custkey, {proj} FROM {outer},"
            f" LATERAL ({inner}) t"
            f" WHERE c.c_custkey % 31 = {r}"
        )
    spdf = spark.sql(sql).toPandas()
    opdf = con.sql(sql).df()
    assert sorted(spdf.columns) == sorted(opdf.columns), sql
    assert _canon(spdf) == _canon(opdf), sql


# ---- grammar 35: windowed DISTINCT aggregates (dialect pair) ----------------
# Spark rejects DISTINCT inside window aggregates outright
# ("Distinct window functions are not supported"); DuckDB runs them
# natively. The SPEC — per-frame distinct count — is expressible in
# both: DuckDB COUNT(DISTINCT x) OVER w vs Spark
# SIZE(collect_set(x) OVER w) (collect_set drops NULLs exactly like
# COUNT DISTINCT). ROWS frames are only deterministic when the ORDER
# BY is a total order, so every ordered spec ends in the unique
# event_id.

_G35_KEYS = ["user_id % 7", "event_type", "user_id % 23"]
_G35_PARTS = ["event_type", "user_id % 5", None]


@given(
    key=st.sampled_from(_G35_KEYS),
    part=st.sampled_from(_G35_PARTS),
    mode=st.sampled_from(["whole", "rows", "range"]),
    desc=st.booleans(),
    pre=st.sampled_from([None, "value > 0.0", "user_id % 2 = 0"]),
)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_windowed_distinct_dialect_pair_differential(
    event_engines, key, part, mode, desc, pre
):
    """Distinct-count-over-window: one spec, per-dialect rendering,
    exact compare. Whole-partition, running ROWS-frame (total order —
    ties broken by event_id) and trailing RANGE-frame variants (value
    ranges make tied rows share a frame, so no tie-break is needed —
    the r11 handoff's missing case), with and without partitioning
    (the unpartitioned cases stay bounded — sf0.001 fuzz corpus
    only)."""
    spark, con = event_engines
    where = f" WHERE {pre}" if pre else ""
    by = f"PARTITION BY {part} " if part else ""
    if mode == "rows":
        direction = "DESC" if desc else "ASC"
        spec = (
            f"({by}ORDER BY ts {direction}, event_id"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )
        proj = "event_id"
    elif mode == "range":
        # ascending only: a trailing interval frame over event time
        spec = (
            f"({by}ORDER BY ts RANGE BETWEEN INTERVAL '1' HOUR"
            " PRECEDING AND CURRENT ROW)"
        )
        proj = "event_id"
    else:
        spec = f"({by.strip()})" if by else "()"
        proj = part if part else "1 AS grp"
    duck = (
        f"SELECT {proj}, CAST(COUNT(DISTINCT {key}) OVER {spec} AS BIGINT)"
        f" AS dc FROM events{where}"
    )
    sp = (
        f"SELECT {proj}, CAST(SIZE(collect_set({key}) OVER {spec})"
        f" AS BIGINT) AS dc FROM events{where}"
    )
    spdf = spark.sql(sp).toPandas()
    opdf = con.sql(duck).df()
    assert sorted(spdf.columns) == sorted(opdf.columns), duck
    assert _canon(spdf) == _canon(opdf), duck


# ---- grammar 36: set ops over grouped + windowed arms -----------------------
# Grammar 5 fuzzes set ops over raw projections; this composes each
# arm from GROUP BY + a ranking window (the registry's a3g/t2 shape)
# before the set op, so the engines must agree on the INTERACTION:
# aggregate typing x window tie-break x bag-vs-set semantics of
# UNION/INTERSECT/EXCEPT [ALL]. Arms differ only in predicate, making
# INTERSECT/EXCEPT nontrivial (overlap = rows whose group survives
# both filters with equal stats).

_G36_OPS = [
    "UNION",
    "UNION ALL",
    "INTERSECT",
    "INTERSECT ALL",
    "EXCEPT",
    "EXCEPT ALL",
]
_G36_PREDS = [
    "TRUE",
    "o_orderstatus <> 'P'",
    "o_totalprice < 150000.0",
    "o_orderkey % 3 <> 1",
    "o_orderpriority IN ('1-URGENT', '2-HIGH')",
]


def _g36_arm(pred: str, desc: bool) -> str:
    direction = "DESC" if desc else "ASC"
    return (
        "SELECT grp, n, CAST(ROW_NUMBER() OVER (ORDER BY n"
        f" {direction}, grp) AS BIGINT) AS r FROM ("
        "SELECT o_orderpriority AS grp, CAST(COUNT(*) AS BIGINT) AS n"
        f" FROM orders WHERE {pred} GROUP BY o_orderpriority)"
    )


@given(
    op=st.sampled_from(_G36_OPS),
    p1=st.sampled_from(_G36_PREDS),
    p2=st.sampled_from(_G36_PREDS),
    d1=st.booleans(),
    d2=st.booleans(),
)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_setop_grouped_windowed_differential(engines, op, p1, p2, d1, d2):
    """UNION/INTERSECT/EXCEPT [ALL] where each arm is a grouped +
    ranked relation — identical SQL text through both engines, exact
    compare (all columns BIGINT/VARCHAR)."""
    spark, con = engines
    sql = f"({_g36_arm(p1, d1)}) {op} ({_g36_arm(p2, d2)})"
    spdf = spark.sql(sql).toPandas()
    opdf = con.sql(sql).df()
    assert sorted(spdf.columns) == sorted(opdf.columns), sql
    assert _canon(spdf) == _canon(opdf), sql


# ---- grammar 37: SCD2 changelog state machine under drawn slicings ----------
# scd2_history_stream claims its changelog reproduces the batch SCD2
# rebuild under ANY micro-batch slicing INCLUDING out-of-order arrival
# (the retro-insert case the batch watermark contract excludes). The
# engine-level replay pins one slicing; this grammar draws (a) a user,
# (b) a permutation seed that SHUFFLES the key's events before
# slicing, (c) random cut positions — so versions genuinely arrive
# late — and applies the changelog against a closed-form rebuild.


@given(
    user_pick=st.integers(0, 10_000),
    seed=st.integers(0, 2**31 - 1),
    cuts=st.lists(st.integers(0, 500), min_size=1, max_size=6),
)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_scd2_changelog_under_random_slicing(
    twin_events, user_pick, seed, cuts
):
    """Apply scd2_update's accumulated changelog (last emission per
    version identity wins) over a shuffled, randomly-sliced event
    stream for one (user, event_type) key — must equal the sorted
    closed-form SCD2 spine regardless of arrival order."""
    from etl_project_spark.streaming.stateful import scd2_update

    users = sorted(twin_events["user_id"].unique())
    uid = int(users[user_pick % len(users)])
    sub = twin_events[twin_events["user_id"] == uid]
    et = sorted(sub["event_type"].unique())[0]
    sub = (
        sub[sub["event_type"] == et]
        .sample(frac=1.0, random_state=seed)
        .reset_index(drop=True)
    )
    batches = _cut(sub, cuts)
    applied = {}
    for pdf in _drive(scd2_update, (uid, et), batches):
        for _, r in pdf.iterrows():
            applied[(int(r["event_id"]),)] = (
                r["valid_from"].value,
                None if pd.isna(r["valid_to"]) else r["valid_to"].value,
                round(float(r["value"]), 9),
                bool(r["is_current"]),
            )
    got = {
        (eid[0],) + v for eid, v in applied.items()
    }
    spine = sorted(
        (int(t), int(e), float(v))
        for t, e, v in zip(
            sub["ts"].astype("int64"), sub["event_id"], sub["value"]
        )
    )
    expected = set()
    for i, (t, e, v) in enumerate(spine):
        nxt = spine[i + 1][0] if i + 1 < len(spine) else None
        expected.add((e, t, nxt, round(v, 9), i + 1 == len(spine)))
    assert got == expected


# ---- grammar 38: recursive CTEs (new in Spark 4) ---------------------------
# WITH RECURSIVE is new engine surface in Spark 4 (DuckDB has had it
# for years) — exactly the kind of young codepath a differential
# grammar should hammer. Two drawn shapes, identical SQL text through
# both engines: (a) integer linear-congruential recurrences folded to
# an aggregate (pure-integer state, no float drift possible), and (b)
# bounded-depth transitive closure over a small orders-derived edge
# relation with a depth counter (UNION ALL + depth guard — the
# termination form both dialects agree on).


@given(
    a=st.integers(1, 7),
    b=st.integers(0, 96),
    m=st.sampled_from([97, 101, 1009]),
    n=st.integers(5, 60),
    seed=st.integers(0, 95),
)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_recursive_cte_recurrence_differential(engines, a, b, m, n, seed):
    """Drawn LCG recurrence via WITH RECURSIVE: both engines must
    produce the identical integer trajectory and fold."""
    spark, con = engines
    sql = f"""
    WITH RECURSIVE t(i, x) AS (
        SELECT 1, CAST({seed} AS BIGINT)
        UNION ALL
        SELECT i + 1, (x * {a} + {b}) % {m} FROM t WHERE i < {n}
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS steps,
           CAST(SUM(x) AS BIGINT) AS total,
           CAST(MIN(x) AS BIGINT) AS lo,
           CAST(MAX(x) AS BIGINT) AS hi
    FROM t
    """
    spdf = spark.sql(sql).toPandas()
    opdf = con.sql(sql).df()
    assert _canon(spdf) == _canon(opdf), sql


@given(
    r=st.integers(0, 96),
    depth=st.integers(2, 5),
    mod=st.sampled_from([23, 37, 50]),
)
@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_recursive_cte_closure_differential(engines, r, depth, mod):
    """Bounded-depth reachability over a drawn orders-derived edge set
    (distinct (custkey%mod -> orderkey%mod) edges from a 1-in-97
    order slice): node frontier counts per depth must match."""
    spark, con = engines
    sql = f"""
    WITH RECURSIVE e AS (
        SELECT DISTINCT o_custkey % {mod} AS src,
               o_orderkey % {mod} AS dst
        FROM orders WHERE o_orderkey % 97 = {r}
    ), walk(node, d) AS (
        SELECT src, 0 FROM e
        UNION ALL
        SELECT e.dst, w.d + 1
        FROM walk w JOIN e ON e.src = w.node
        WHERE w.d < {depth}
    )
    SELECT d, CAST(COUNT(*) AS BIGINT) AS paths,
           CAST(COUNT(DISTINCT node) AS BIGINT) AS nodes
    FROM walk GROUP BY d
    """
    spdf = spark.sql(sql).toPandas()
    opdf = con.sql(sql).df()
    assert _canon(spdf) == _canon(opdf), sql


# ---- grammar 39: GROUP BY ALL / ORDER BY ALL dialect probes ----------------
# Both engines accept the ALL shorthand; the differential risk is how
# each infers "all non-aggregate columns" once expressions, aliases
# and HAVING enter. Identical SQL text, drawn projections.

_G39_DIMS = [
    "o_orderstatus",
    "o_orderpriority",
    "o_orderkey % 5 AS bucket",
    "CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr",
]
_G39_AGGS = [
    "CAST(COUNT(*) AS BIGINT) AS cnt",
    "CAST(SUM(o_orderkey) AS BIGINT) AS sk",
    "MIN(o_totalprice) AS mn",
    "ROUND(CAST(SUM(o_custkey) AS DOUBLE) / COUNT(*), 6) AS avg_ck",
]


@given(
    dims=st.lists(st.sampled_from(_G39_DIMS), min_size=1, max_size=3,
                  unique=True),
    aggs=st.lists(st.sampled_from(_G39_AGGS), min_size=1, max_size=2,
                  unique=True),
    pred=st.sampled_from(PREDS),
    having=st.sampled_from([None, "COUNT(*) > 3", "COUNT(*) >= 1"]),
)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_group_by_all_differential(engines, dims, aggs, pred, having):
    """GROUP BY ALL with drawn dimension expressions (including
    aliased computed columns), aggregates, WHERE and HAVING — the ALL
    inference must resolve identically in both engines."""
    spark, con = engines
    where = f" WHERE {pred}" if pred else ""
    hav = f" HAVING {having}" if having else ""
    sql = (
        f"SELECT {', '.join(dims + aggs)} FROM orders{where}"
        f" GROUP BY ALL{hav}"
    )
    spdf = spark.sql(sql).toPandas()
    opdf = con.sql(sql).df()
    assert sorted(spdf.columns) == sorted(opdf.columns), sql
    assert _canon(spdf) == _canon(opdf), sql


# ---- grammar 40: LATERAL aggregates correlated to TWO outer tables ---------
# Grammar 34's inner subqueries correlate to ONE outer table; the
# decorrelation rewrite both engines must perform gets strictly harder
# when the inner references columns of TWO distinct FROM items (the
# aggregate then depends on a join of outer attributes, so pulling it
# up must preserve both correlations). Outer = customer x nation on
# nationkey; the inner aggregate/top-k correlates on c.c_custkey AND
# folds n.n_nationkey into a predicate or an exact-integer expression.
# One SQL text, both engines (VERDICT r11 #6).
#
# Dialect finding (probed building this grammar): Spark REJECTS an
# aggregate argument that mixes outer and local references —
# SUM(local_expr * outer(n.n_nationkey)) raises
# UNSUPPORTED_SUBQUERY_EXPRESSION_CATEGORY
# .AGGREGATE_FUNCTION_MIXED_OUTER_LOCAL_REFERENCES — while outer
# references in the inner WHERE are fine. The grammar therefore keeps
# outer refs in predicates and applies outer-derived scaling in the
# OUTER projection (t.a2 * (n.n_nationkey + 1)), the semantically
# identical supported spelling in both engines.

_G40_INNER_USES_N = [
    # n referenced in the inner PREDICATE
    "o.o_orderkey % 25 <> n.n_nationkey",
    "o.o_orderkey % 7 > n.n_nationkey % 7",
    # n referenced via an exact-integer comparison against c too
    "o.o_custkey % 25 >= n.n_nationkey",
]


@given(
    r=st.integers(0, 30),
    k=st.integers(1, 3),
    desc=st.booleans(),
    npred=st.sampled_from(_G40_INNER_USES_N),
    left=st.booleans(),
    agg_form=st.booleans(),
    scale_by_n=st.booleans(),
)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_lateral_two_outer_tables_differential(
    threeway_engines, r, k, desc, npred, left, agg_form, scale_by_n
):
    """LATERAL subquery referencing BOTH customer and nation columns:
    per-(customer, nation) exact-integer aggregates (optionally scaled
    by an n-derived factor — still exact int64) or a fully-tie-broken
    top-k whose predicate mixes both correlations."""
    spark, con = threeway_engines
    direction = "DESC" if desc else "ASC"
    cents = "CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)"
    # outer-derived scaling must live in the OUTER projection (see the
    # dialect finding above) — still exact int64 in both engines
    a2 = "t.a2 * (n.n_nationkey + 1)" if scale_by_n else "t.a2"
    if agg_form:
        inner = (
            "SELECT CAST(COUNT(*) AS BIGINT) AS a1,"
            f" CAST(SUM({cents}) AS BIGINT) AS a2,"
            " MIN(o.o_orderkey) AS a3"
            " FROM orders o"
            f" WHERE o.o_custkey = c.c_custkey AND {npred}"
        )
    else:
        inner = (
            f"SELECT o.o_orderkey AS a1, {cents} AS a2,"
            " CAST(NULL AS BIGINT) AS a3"
            " FROM orders o"
            f" WHERE o.o_custkey = c.c_custkey AND {npred}"
            f" ORDER BY o.o_totalprice {direction}, o.o_orderkey"
            f" LIMIT {k}"
        )
    proj = f"t.a1, {a2} AS a2s, t.a3"
    outer = (
        "customer c JOIN nation n ON c.c_nationkey = n.n_nationkey"
    )
    if left:
        sql = (
            f"SELECT c.c_custkey, n.n_name, {proj} FROM {outer}"
            f" LEFT JOIN LATERAL ({inner}) t ON TRUE"
            f" WHERE c.c_custkey % 31 = {r}"
        )
    else:
        sql = (
            f"SELECT c.c_custkey, n.n_name, {proj} FROM {outer},"
            f" LATERAL ({inner}) t"
            f" WHERE c.c_custkey % 31 = {r}"
        )
    spdf = spark.sql(sql).toPandas()
    opdf = con.sql(sql).df()
    assert sorted(spdf.columns) == sorted(opdf.columns), sql
    assert _canon(spdf) == _canon(opdf), sql


# ---- grammar 41: recursive CTE UNION-distinct fixpoint (dialect pair) ------
# Grammar 38 terminates via explicit depth guards (UNION ALL + d < n);
# the OTHER recursive-CTE termination contract is UNION (distinct):
# iteration stops when a step yields no rows not already in the
# accumulated set.
#
# Dialect finding (probed building this grammar): Spark 4.1 REJECTS
# UNION inside a recursive CTE — UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE,
# SQLSTATE 42836, "not yet supported ... use UNION ALL instead" —
# while DuckDB runs the distinct-union fixpoint natively. So, like
# grammar 35's windowed-DISTINCT pair, the SPEC (the reachable SET
# under closure) is rendered per dialect: DuckDB as the guard-free
# UNION fixpoint (the surface under test — termination comes entirely
# from per-step dedup against the working table), Spark as the
# UNION ALL walk with a depth guard + outer DISTINCT. The edge
# relation is made ACYCLIC by construction (src < dst), so the walk
# terminates within <= mod steps with a finite, small path count and
# both renderings provably compute the same set.


@given(
    r=st.integers(0, 96),
    mod=st.sampled_from([23, 37, 50]),
    s=st.integers(0, 4),
)
@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_recursive_cte_union_distinct_fixpoint_differential(
    engines, r, mod, s
):
    """Distinct-union fixpoint closure as a dialect pair: DuckDB's
    native guard-free UNION recursion vs Spark's depth-guarded
    UNION ALL walk — identical reachable sets over a drawn acyclic
    orders-derived edge relation."""
    spark, con = engines
    edges = f"""e AS (
        SELECT DISTINCT o_custkey % {mod} AS src,
               o_orderkey % {mod} AS dst
        FROM orders
        WHERE o_orderkey % 97 = {r}
          AND o_custkey % {mod} < o_orderkey % {mod}
    )"""
    summary = """
    SELECT CAST(COUNT(*) AS BIGINT) AS nodes,
           CAST(COALESCE(SUM(node), 0) AS BIGINT) AS total,
           CAST(MIN(node) AS BIGINT) AS lo,
           CAST(MAX(node) AS BIGINT) AS hi
    """
    duck = f"""
    WITH RECURSIVE {edges}, reach(node) AS (
        SELECT src FROM e WHERE src % 5 = {s}
        UNION
        SELECT e.dst FROM reach x JOIN e ON e.src = x.node
    )
    {summary} FROM reach
    """
    sp = f"""
    WITH RECURSIVE {edges}, walk(node, d) AS (
        SELECT src, 0 FROM e WHERE src % 5 = {s}
        UNION ALL
        SELECT e.dst, x.d + 1 FROM walk x JOIN e ON e.src = x.node
        WHERE x.d < {mod}
    )
    {summary} FROM (SELECT DISTINCT node FROM walk)
    """
    spdf = spark.sql(sp).toPandas()
    opdf = con.sql(duck).df()
    assert _canon(spdf) == _canon(opdf), duck


# ---- TABLESAMPLE: probed, documented, deliberately NOT a grammar -----------
# Probe results (r11): Spark accepts `TABLESAMPLE (p PERCENT)
# REPEATABLE (seed)` and returns a row-level Bernoulli sample; DuckDB
# parses the same text but routes it to its default (system/reservoir)
# sampler and returned 0 rows over a parquet view; DuckDB's explicit
# `TABLESAMPLE BERNOULLI(p PERCENT)` is a parse error in Spark. Even
# where both parse, the drawn row SETS differ (different RNGs behind
# the same seed), so no exact differential is possible BY DESIGN.
# The engine's deterministic-sampling operators (smp2/smp3/smp7 hash
# gates, smp4 A-ES, smp8 systematic PPS) exist precisely because
# TABLESAMPLE is not reproducible across engines — they are the
# differential-checkable replacements, all hash-green.


# ---- grammar 42: ORDER BY ALL (ordered-output differential) ----------------
# g39 covers GROUP BY ALL under the usual canonicalized (sorted)
# compare, which cannot see ORDERING bugs. This grammar checks the
# actual row ORDER both engines produce for ORDER BY ALL [DESC] over
# GROUP BY ALL results — compared as ordered tuple lists, not sets.
# Projections are integer/string only (exact equality) and the
# ordering keys are non-null by construction: the engines' NULL
# ordering DEFAULTS differ (Spark ASC = NULLS FIRST, DuckDB = NULLS
# LAST), a dialect divergence this grammar sidesteps rather than
# tests. GROUP BY ALL makes dim combinations unique, so ORDER BY ALL
# is a total order and the comparison is deterministic.

_G42_DIMS = [
    "o_orderstatus",
    "o_orderpriority",
    "o_orderkey % 7 AS b7",
    "CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr",
    "o_custkey % 11 AS c11",
]
_G42_AGGS = [
    "CAST(COUNT(*) AS BIGINT) AS cnt",
    "CAST(SUM(o_orderkey % 1000) AS BIGINT) AS sk",
    "CAST(MIN(o_orderkey) AS BIGINT) AS mn",
    "CAST(MAX(o_custkey) AS BIGINT) AS mx",
]


@given(
    dims=st.lists(st.sampled_from(_G42_DIMS), min_size=1, max_size=3,
                  unique=True),
    aggs=st.lists(st.sampled_from(_G42_AGGS), min_size=1, max_size=2,
                  unique=True),
    pred=st.sampled_from(PREDS),
    desc=st.booleans(),
    limit=st.sampled_from([None, 7, 50]),
)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_order_by_all_ordered_differential(
    engines, dims, aggs, pred, desc, limit
):
    """ORDER BY ALL [DESC] [LIMIT k]: the engines must emit the
    IDENTICAL row sequence (ordered compare — the one thing the
    canonicalizing grammars cannot check), including the interaction
    with LIMIT (top-k under the inferred whole-row order)."""
    spark, con = engines
    where = f" WHERE {pred}" if pred else ""
    tail = " DESC" if desc else ""
    lim = f" LIMIT {limit}" if limit else ""
    sql = (
        f"SELECT {', '.join(dims + aggs)} FROM orders{where}"
        f" GROUP BY ALL ORDER BY ALL{tail}{lim}"
    )
    sp = [tuple(r) for r in spark.sql(sql).collect()]
    du = [tuple(r) for r in con.sql(sql).df().itertuples(index=False)]
    assert sp == du, sql
