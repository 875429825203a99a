"""Physical-plan introspection: the engine's scale-regression guard.

The reference delegates all physical planning to Postgres/Redshift and
never inspects it (SURVEY.md §4); on Spark the physical plan IS the
scale contract — a query that silently picks up an extra Exchange or
drops a pushed filter is a 100 TB regression even when every correctness
test stays green. This module turns ``explain("formatted")`` output into
checkable numbers so tests and tools/audit_plans.py can pin the plans
we shipped:

- :func:`plan_stats` — shuffle/broadcast/scan/pushdown counts + red
  flags for one DataFrame.
- :func:`assert_scalable` — raise if a plan exceeds a shuffle budget or
  contains an unintended quadratic join / row-at-a-time Python UDF.

Red flags (why each breaks at scale):
- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — O(n·m) compare;
  only acceptable for deliberately bounded ground-truth operators.
- ``BatchEvalPython`` — row-at-a-time Python UDF: per-row
  pickle/unpickle, ~10-100× slower than Arrow-batched
  (``MapInPandas``/``ArrowEvalPython``, which are fine).
- a filtered parquet scan without ``PushedFilters`` — the predicate
  runs above the reader, so every row-group is read and decoded.
- ``ReadSchema`` wider than the query needs — column pruning failed;
  on a 100 TB columnar table the scan cost is proportional to the
  columns actually decoded.
- a ``Window`` with an EMPTY partition spec — the whole input is
  sorted in ONE task; only acceptable when the input relation is
  provably bounded (a bucket spine, a rank-limited prefilter, a sketch
  summary). tools/audit_plans.py holds the whitelist of justified
  sites; anything else is flagged ``GLOBAL-WINDOW``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    """The ``explain("formatted")`` text of ``df`` as a string (Spark
    only prints it to stdout)."""
    spark = df.sparkSession
    jvm = spark.sparkContext._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@dataclass
class PlanStats:
    """Counts extracted from one formatted physical plan."""

    shuffles: int = 0  # hash/range Exchange operators
    broadcasts: int = 0  # BroadcastExchange operators
    scans: int = 0  # parquet scans
    pushed_scans: int = 0  # scans with non-empty PushedFilters
    unpartitioned_windows: int = 0  # Window ops with empty partition spec
    window_group_limits: int = 0  # WindowGroupLimit prefilter ops
    flags: list[str] = field(default_factory=list)
    plan: str = ""

    @property
    def quadratic(self) -> bool:
        return any("QUADRATIC" in f or "quadratic" in f for f in self.flags)

    @property
    def row_python(self) -> bool:
        return "ROW-PYTHON-UDF" in self.flags


_ORDER_SUFFIX = re.compile(r"(ASC|DESC) NULLS (FIRST|LAST)$")


def _split_top_level(s: str) -> "list[str]":
    """Split ``s`` on commas that sit outside any paren/bracket nesting.

    Quoted segments (``'...'`` / ``"..."``, as printed for string
    literals in plan expressions) are opaque: parens, brackets, and
    commas inside them never affect nesting depth or splitting."""
    parts: list[str] = []
    depth = 0
    quote: str | None = None
    cur: list[str] = []
    for ch in s:
        if quote is not None:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return parts


def _unpartitioned_windows(plan: str) -> int:
    """Count physical ``Window`` operators whose windowspecdefinition
    has an EMPTY partition spec — these sort their ENTIRE input in one
    task. The spec's printed form is
    ``windowspecdefinition(partExprs..., orderExprs..., frame)``:
    order expressions carry an ``ASC/DESC NULLS ...`` suffix and the
    trailing argument is always the frame, so the window is
    unpartitioned exactly when no suffix-free argument remains."""
    count = 0
    for sec in re.finditer(
        r"^\(\d+\) Window\n(?:(?!\(\d+\) )[^\n]*\n?)*", plan, re.M
    ):
        text = sec.group(0)
        for m in re.finditer(r"windowspecdefinition\(", text):
            i, depth = m.end(), 1
            quote: str | None = None
            while i < len(text) and depth:
                ch = text[i]
                if quote is not None:
                    if ch == quote:
                        quote = None
                elif ch in "'\"":
                    quote = ch
                elif ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                i += 1
            args = _split_top_level(text[m.end() : i - 1])
            if not [a for a in args[:-1] if not _ORDER_SUFFIX.search(a)]:
                count += 1
                break  # one hit marks the node; on to the next Window
    return count


def _connector_col(line: str) -> int:
    m = re.search(r"[:+]- ", line)
    return m.start() if m else -1


def _bnlj_small_build(plan: str) -> bool:
    """True when EVERY BroadcastNestedLoopJoin in ``plan`` broadcasts a
    provably-tiny build side — a scalar aggregate (HashAggregate with
    ``Keys: []``, e.g. a scalar-subquery threshold) or a driver-local
    frame (``Scan ExistingRDD`` / ``LocalTableScan``). Those are the
    *correct* plans for 1-row/few-row comparisons and must not be
    reported as quadratic-join scale hazards."""
    tree = plan.split("\n\n", 1)[0].splitlines()
    rows = [i for i, l in enumerate(tree) if "BroadcastNestedLoopJoin" in l]
    if not rows:
        return False
    for i in rows:
        col = _connector_col(tree[i])
        children = []
        for j in range(i + 1, len(tree)):
            c = _connector_col(tree[j])
            if c <= col:
                break
            if c == col + 3:
                children.append(j)
        if not children:
            return False
        build = children[0] if "BuildLeft" in tree[i] else children[-1]
        ccol = col + 3
        sub = [tree[build]]
        for j in range(build + 1, len(tree)):
            if _connector_col(tree[j]) <= ccol:
                break
            sub.append(tree[j])
        subtext = "\n".join(sub)
        if "Scan ExistingRDD" in subtext or "LocalTableScan" in subtext:
            continue
        # HashAggregate, ObjectHashAggregate (percentile/collect), and
        # SortAggregate are all scalar when Keys is empty
        agg = r"(?:HashAggregate|ObjectHashAggregate|SortAggregate)"
        for opid in re.findall(rf"{agg} \((\d+)\)", subtext):
            sec = re.search(
                rf"^\({opid}\) {agg}\n(?:(?!\(\d+\) )[^\n]*\n?)*",
                plan,
                re.M,
            )
            if sec and "Keys: []" in sec.group(0):
                break
        else:
            return False
    return True


def plan_stats(df: DataFrame, wide_scan_cols: int = 10) -> PlanStats:
    """Parse ``df``'s formatted physical plan into :class:`PlanStats`.

    formatted mode lists each operator once in the tree and once as a
    numbered ``(N) Op`` detail section — we count the detail sections,
    so every operator is counted exactly once even when the tree
    indentation wraps.
    """
    plan = explain_formatted(df)
    stats = PlanStats(plan=plan)
    stats.shuffles = len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M))
    stats.broadcasts = len(re.findall(r"^\(\d+\) BroadcastExchange\b", plan, re.M))
    stats.scans = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    stats.pushed_scans = sum(1 for p in pushed if p.strip())
    if "CartesianProduct" in plan:
        stats.flags.append("QUADRATIC-JOIN")
    elif "BroadcastNestedLoopJoin" in plan:
        if _bnlj_small_build(plan):
            stats.flags.append("nested-loop(small-bcast)")
        else:
            stats.flags.append("QUADRATIC-JOIN")
    stats.unpartitioned_windows = _unpartitioned_windows(plan)
    stats.window_group_limits = len(
        re.findall(r"^\(\d+\) WindowGroupLimit\b", plan, re.M)
    )
    if stats.unpartitioned_windows:
        stats.flags.append(f"GLOBAL-WINDOW(x{stats.unpartitioned_windows})")
    if "BatchEvalPython" in plan:
        stats.flags.append("ROW-PYTHON-UDF")
    if "MapInPandas" in plan or "ArrowEvalPython" in plan:
        stats.flags.append("arrow-python(ok)")
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        ncols = len(m.group(1).split(",")) if m.group(1) else 0
        if ncols >= wide_scan_cols:
            stats.flags.append(f"wide-scan({ncols}cols)")
    return stats


def assert_scalable(
    df: DataFrame,
    max_shuffles: int | None = None,
    allow_quadratic: bool = False,
    allow_row_python: bool = False,
) -> PlanStats:
    """Assert ``df``'s physical plan has no unintended scale hazards;
    returns the stats so callers can make further assertions.

    Use in tests to pin a query's plan shape::

        stats = assert_scalable(q(spark, sf), max_shuffles=2)
        assert stats.broadcasts >= 1
    """
    stats = plan_stats(df)
    problems = []
    if max_shuffles is not None and stats.shuffles > max_shuffles:
        problems.append(f"{stats.shuffles} shuffles > budget {max_shuffles}")
    if stats.quadratic and not allow_quadratic:
        problems.append("unintended CartesianProduct/BroadcastNestedLoopJoin")
    if stats.row_python and not allow_row_python:
        problems.append("row-at-a-time Python UDF (BatchEvalPython)")
    if problems:
        raise AssertionError(
            "; ".join(problems) + "\n--- physical plan ---\n" + stats.plan
        )
    return stats
