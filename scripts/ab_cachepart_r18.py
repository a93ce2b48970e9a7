#!/usr/bin/env python
"""Interleaved A/B: spark.sql.optimizer.canChangeCachedPlanOutputPartitioning
true (the repo's r-era setting — lets AQE coalesce consumers of cached
plans) vs false (the Spark default — the cached plan's output
partitioning is PRESERVED, so a same-key consumer skips its exchange).

Round-18 motivation: the loop-body plan dumps (explain_loop_r18.py)
show that under `true` the iterative operators' cached loop-invariant
relations (pagerank's degree edges, neardup's closed-neighborhood
edges) are RE-EXCHANGED every round — the one shuffle the r17 re-plans
existed to remove. Under `false` the per-round plan reads the cache's
hash layout directly. This A/B measures the suite-wide trade across
every cache-bearing query, conf toggled per rep inside one session
(it is planning-time, runtime-settable) so drift cancels.

Usage: python scripts/ab_cachepart_r18.py [rounds]
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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CONF = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
NAMES = (
    "minhash_clusters",
    "dedup_keep_best",
    "supplier_pagerank",
    "minhash_lsh",
    "simhash_pairs",
    "ngram_jaccard",
    "similarity_lsh",
    "similarity_lsh_highsim",
)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("r18-ab-cachepart")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"sf_dir": SF_DIR, "rounds": rounds, "loadavg": list(os.getloadavg())}
    for name in NAMES:
        fn = QUERIES[name]
        # one warm pass per variant
        for v in ("true", "false"):
            spark.conf.set(CONF, v)
            with owned_result(fn(spark, SF_DIR)) as df:
                df.write.format("noop").mode("overwrite").save()
        walls = {"true": [], "false": []}
        for _ in range(rounds):
            for v in ("true", "false"):
                spark.conf.set(CONF, v)
                t0 = time.perf_counter()
                with owned_result(fn(spark, SF_DIR)) as df:
                    df.write.format("noop").mode("overwrite").save()
                walls[v].append(round(time.perf_counter() - t0, 4))
        spark.conf.set(CONF, "true")
        out[name] = {
            "true_walls": walls["true"],
            "false_walls": walls["false"],
            "true_median": round(statistics.median(walls["true"]), 4),
            "false_median": round(statistics.median(walls["false"]), 4),
            "false_wins": sum(
                1 for x, y in zip(walls["true"], walls["false"]) if y < x
            ),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
