#!/usr/bin/env python
"""Round-18 measurement helper: for each named query, capture
``.explain('formatted')`` into plans/r18/<name>_<tag>.txt, time ``reps``
noop-sink executions (guide §1.4) after one warm run, and record the
SPARK JOB COUNT of one run via statusTracker job groups — the drift-free
secondary metric for job-chain operators (semdedup store family), per
the round-17 measurement protocol.

Usage: python scripts/explain_r18.py <tag> [--reps N] [--sf DIR] name...
       python scripts/explain_r18.py before semdedup_store_append

Timing output is one JSON line per query on stdout:
  {"name": ..., "walls": [...], "median": ..., "jobs": N}
Plans go to plans/r18/ (committed — the judge reads them).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hhek2sqlite_spark.operators.util import owned_result  # noqa: E402
from hhek2sqlite_spark.plans import QUERIES  # noqa: E402
from hhek2sqlite_spark.session import get_spark  # noqa: E402


def count_jobs(spark, fn, *args, **kwargs):
    """Run ``fn`` under a fresh job group and return (result_of_fn,
    number of Spark jobs it submitted). Construction + action both
    count — the statusTracker sees every job the driver ran."""
    sc = spark.sparkContext
    group = f"jobcount-{time.monotonic_ns()}"
    sc.setJobGroup(group, group)
    try:
        out = fn(*args, **kwargs)
    finally:
        sc.setJobGroup(None, None)
    return out, len(sc.statusTracker().getJobIdsForGroup(group))


def main() -> None:
    args = sys.argv[1:]
    tag = args.pop(0)
    reps = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    while args and args[0].startswith("--"):
        flag = args.pop(0)
        if flag == "--reps":
            reps = int(args.pop(0))
        elif flag == "--sf":
            sf_dir = args.pop(0)
    names = args or sorted(QUERIES)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r18"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r18-explain")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = QUERIES[name]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        if reps == 0:
            print(json.dumps({"name": name, "tag": tag, "plan_only": True}), flush=True)
            continue

        def _one_run():
            with owned_result(fn(spark, sf_dir)) as timed:
                timed.write.format("noop").mode("overwrite").save()

        walls: list[float] = []
        spark.sparkContext.setJobDescription(f"r18 {tag}: {name}")
        _one_run()  # warm pass, dropped
        _, jobs = count_jobs(spark, _one_run)
        for _ in range(reps):
            t0 = time.perf_counter()
            _one_run()
            walls.append(round(time.perf_counter() - t0, 4))
        spark.sparkContext.setJobDescription(None)
        print(
            json.dumps(
                {
                    "name": name,
                    "tag": tag,
                    "jobs": jobs,
                    "walls": walls,
                    "median": round(statistics.median(walls), 4),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
