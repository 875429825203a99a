"""Per-query isolation harness (optimization guide §1).

Times one or more registry queries in a fresh process with the SAME
session/config as bench.py, but with the noop sink as the timed action
(guide §1.4: computes every column of every row, no optimizer pruning of
the count path) alongside the bench's df.count() action for continuity.
Captures .explain("formatted") to plans/<tag>/<query>_<suffix>.txt when
--plans is given. Jobs are labelled via setJobDescription (guide §1.5).

Usage:
  python tools/isolate.py [--sf DIR] [--runs N] [--plans TAG_DIR_SUFFIX]
                          query [query ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Prints one JSON line per query:
  {"query": name, "noop": [runs...], "count": [runs...], "median_noop": s}
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_project_spark.registry import all_queries  # noqa: E402
from etl_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None,
                    help="write explain('formatted') to plans/<round>/"
                         "<query>_<PLANS>.txt (e.g. --plans before)")
    ap.add_argument("--plans-round", default="r13",
                    help="plans/ subdirectory (default r13)")
    ap.add_argument("--no-noop", action="store_true",
                    help="skip the noop-sink timings (count only)")
    args = ap.parse_args()

    spark = get_spark(
        "isolate", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    qs = all_queries()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in args.queries:
        fn = qs[name]
        sc = spark.sparkContext
        if args.plans:
            pdir = os.path.join(repo, "plans", args.plans_round)
            os.makedirs(pdir, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    pdir, f"{name}_{args.plans}.txt"), "w") as f:
                f.write(plan)
        noop_runs: list[float] = []
        count_runs: list[float] = []

        def run(action: str) -> float:
            t0 = time.time()
            df = fn(spark, args.sf)
            if action == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            return time.time() - t0

        # warmup (compile) with the count action — same as bench.py
        sc.setJobDescription(f"{name}: warmup")
        run("count")
        for i in range(args.runs):
            sc.setJobDescription(f"{name}: count run {i}")
            count_runs.append(round(run("count"), 3))
        if not args.no_noop:
            sc.setJobDescription(f"{name}: noop warmup")
            run("noop")
            for i in range(args.runs):
                sc.setJobDescription(f"{name}: noop run {i}")
                noop_runs.append(round(run("noop"), 3))
        sc.setJobDescription(None)
        out = {
            "query": name,
            "count": count_runs,
            "median_count": round(statistics.median(count_runs), 3),
        }
        if noop_runs:
            out["noop"] = noop_runs
            out["median_noop"] = round(statistics.median(noop_runs), 3)
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
