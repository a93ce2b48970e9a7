#!/usr/bin/env python
"""Variant decomposition of order_count_distribution (TPC-H Q13) —
VERDICT r15 #8 (stretch): the one sub-second query whose SCALING slope
read non-improving in BOTH the chain and the quiet subset (17.0 -> 22.2
and 19.9 -> 24.6), with sublinear absolute growth (0.68 -> 1.26s for
x8). The Q7 precedent: decompose with interleaved medians before
believing a slope flag on a floor-bound query.

Variants (identical output, the oracle SQL unchanged):

- join-then-count (committed r12-r15, RETIRED r16): customer LEFT
  JOIN orders (filter in the join condition) -> groupBy custkey ->
  groupBy c_count. The join EXCHANGES FULL ORDER ROWS on o_custkey,
  then counts.
- pre-agg (committed since r16): count orders per custkey FIRST
  (map-side combinable — the exchange carries partial counts,
  ~|custkeys| x partitions rows instead of |orders| rows), then
  customer LEFT JOIN counts + coalesce(0) -> groupBy c_count. The
  standard Q13 rewrite; at 100 TB the join input shrinks from the
  fact to the key domain.

First measurement (2026-08-16, interleaved, start load 4.2/8.7):
x1 join-then-count 0.648 vs pre-agg 0.783 (the pre-agg pays one extra
stage at the 17MB job floor); x8 0.874 vs 0.836 — the sign flips with
scale, exactly the fact-exchange argument, so the pre-agg form was
committed (plan contract in test_round16_ops).

Protocol: engine-A/B interleaved (A rep, B rep, alternating), median
of REPS, noop sink, x1 and x8 scaled dirs, quiet box.

Usage: python scripts/decompose_q13.py [x1_dir x8_dir]
Prints one JSON document; fold the verdict into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hhek2sqlite_spark.plans.extensions import (  # noqa: E402
    _Q13_EXCLUDED_PRIORITY,
    q_order_count_distribution,
)
from hhek2sqlite_spark.session import get_spark  # noqa: E402
from hhek2sqlite_spark.sources.parquet import load_table  # noqa: E402

REPS = 3


def variant_join_then_count(spark, sf_dir: str):
    """The retired r12-r15 form, kept as the A/B reference."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != _Q13_EXCLUDED_PRIORITY),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


def _run(fn, spark, d) -> float:
    t0 = time.perf_counter()
    fn(spark, d).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    args = sys.argv[1:]
    dirs = args or ["testdata_scaled/x1", "testdata_scaled/x8"]
    spark = get_spark("hhek2sqlite_spark-decompose-q13")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for d in dirs:
        label = os.path.basename(d.rstrip("/"))
        # equality first: both variants must agree before timing matters
        a_rows = sorted(
            tuple(r) for r in variant_join_then_count(spark, d).collect()
        )
        b_rows = sorted(
            tuple(r) for r in q_order_count_distribution(spark, d).collect()
        )
        assert a_rows == b_rows, f"variant outputs differ at {label}"
        a_ts, b_ts = [], []
        _run(variant_join_then_count, spark, d)  # warm A
        _run(q_order_count_distribution, spark, d)  # warm B
        for _ in range(REPS):  # interleaved
            a_ts.append(_run(variant_join_then_count, spark, d))
            b_ts.append(_run(q_order_count_distribution, spark, d))
        out[label] = {
            "retired_join_then_count_sec": round(statistics.median(a_ts), 4),
            "committed_pre_agg_sec": round(statistics.median(b_ts), 4),
            "a_samples": [round(t, 4) for t in a_ts],
            "b_samples": [round(t, 4) for t in b_ts],
        }
        print(f"{label}: {out[label]}", file=sys.stderr)
    doc = {
        "query": "order_count_distribution",
        "protocol": {
            "reps": REPS,
            "stat": "median",
            "interleaved": True,
            "warm_runs": 1,
        },
        "loadavg_at_start": [round(x, 2) for x in os.getloadavg()],
        "points": out,
    }
    print(json.dumps(doc))
    spark.stop()


if __name__ == "__main__":
    main()
