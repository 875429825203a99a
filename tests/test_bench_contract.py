"""bench.py driver contract: the round-3 record lost its headline
because the stdout result line was clipped by the driver's bounded tail
capture (`parsed: null`). Pin the contract: stdout carries exactly one
non-empty line, it is valid JSON with the required keys, it stays far
under any plausible tail budget, and the full record lands in
BENCH_DETAIL.json."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_stdout_is_one_compact_json_line(tmp_path):
    detail_path = str(tmp_path / "BENCH_DETAIL.json")
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_QUERIES="a3_daily_stats,t1_top1_by_value",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_DETAIL_PATH=detail_path,
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"stdout must be ONE line, got {len(lines)}"
    out = json.loads(lines[0])
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in out, key
    assert out["unit"] == "sec"
    assert set(out["queries"]) == {"a3_daily_stats", "t1_top1_by_value"}
    # the driver's tail capture clipped a ~3 KB line in round 3; the
    # full headline map is ~700 B — pin generous headroom
    assert len(lines[0]) < 2000, len(lines[0])
    # scaling-signal fields (VERDICT r12 #2): the line must prove
    # $SPARK_GRAFT_CPUS reached the session
    assert out["master"] == "local[4]"
    assert out["parallelism"] == 4
    detail = json.load(open(detail_path))
    assert detail["queries"] == out["queries"]


def test_detail_path_guards_subset_and_unreliable_runs():
    """VERDICT r12 #8: a subset or load-tripped run must never clobber
    the committed full-run BENCH_DETAIL.json; an explicit env path
    always wins (the in-bench retime subprocesses rely on that)."""
    sys.path.insert(0, REPO)
    from bench import resolve_detail_path

    full = resolve_detail_path(None, subset=False, unreliable=False)
    assert full.endswith("/BENCH_DETAIL.json")
    assert resolve_detail_path(None, subset=True, unreliable=False).endswith(
        "/BENCH_DETAIL_SUBSET.json"
    )
    # subset protection applies even when the run was also noisy
    assert resolve_detail_path(None, subset=True, unreliable=True).endswith(
        "/BENCH_DETAIL_SUBSET.json"
    )
    assert resolve_detail_path(None, subset=False, unreliable=True).endswith(
        "/BENCH_DETAIL_UNRELIABLE.json"
    )
    assert (
        resolve_detail_path("/tmp/x.json", subset=True, unreliable=True)
        == "/tmp/x.json"
    )
