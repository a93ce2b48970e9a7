#!/usr/bin/env python
"""Round-17 measurement helper: for each named query, capture
``.explain('formatted')`` into plans/r17/<name>_<tag>.txt and time
``reps`` noop-sink executions (guide §1.4) after one warm run.

Usage: python scripts/explain_r17.py <tag> [--reps N] [--sf DIR] name...
       python scripts/explain_r17.py before minhash_lsh supplier_pagerank

Timing output is one JSON line per query on stdout:
  {"name": ..., "walls": [...], "median": ...}
Plans go to plans/r17/ (committed — the judge reads them).
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
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r17"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r17-explain")
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
        walls: list[float] = []
        spark.sparkContext.setJobDescription(f"r17 {tag}: {name}")
        for _ in range(reps + 1):  # first rep is the warm pass, dropped
            t0 = time.perf_counter()
            with owned_result(fn(spark, sf_dir)) as timed:
                timed.write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 4))
        spark.sparkContext.setJobDescription(None)
        print(
            json.dumps(
                {
                    "name": name,
                    "tag": tag,
                    "warm": walls[0],
                    "walls": walls[1:],
                    "median": round(statistics.median(walls[1:]), 4),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
