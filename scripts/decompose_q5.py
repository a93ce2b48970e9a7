#!/usr/bin/env python
"""Stage decomposition of regional_supplier_volume (TPC-H Q5) — VERDICT
r16 #8: the one SCALING.json non-improver (x1 ratio 22.57 -> x8 22.59),
classified as slope-neutral window noise because Spark and oracle grew
by exactly the same factor (2.51/2.51). This confirms or refutes that
classification with interleaved stage medians at x1/x8:

1. stage_semi_lineitem — the region-supplier SEMI prefilter of the fact
   (scan + broadcast semi join, no exchange): should grow ~linearly
   with data (scan-bound).
2. stage_cust_orders — the orders ⋈ customer fold (the custkey
   exchange at order grain).
3. full — the committed plan end-to-end.

If every stage's growth is ~the data factor and no stage's share of the
total swings between x1 and x8, the committed plan has no emergent
super-linear term and the flat ratio is what it looks like: both
engines data-proportional, the constant offset being the local stage
floor. A stage growing faster than data at x8 would localize a re-plan
target instead.

Protocol: interleaved reps (one rep of each case per round), median of
3, noop sink, quiet box (BASELINE.md: 1-min loadavg < 1 at start).

Usage: python scripts/decompose_q5.py [x1_dir x8_dir]
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
    _Q5_END,
    _Q5_REGION,
    _Q5_START,
    q_regional_supplier_volume,
)
from hhek2sqlite_spark.session import get_spark  # noqa: E402
from hhek2sqlite_spark.sources.parquet import load_table  # noqa: E402

REPS = 3


def _region_suppliers(spark, d):
    nat = (
        load_table(spark, d, "nation")
        .join(
            load_table(spark, d, "region").filter(F.col("r_name") == _Q5_REGION),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    return (
        load_table(spark, d, "supplier")
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )


def _stage_semi_lineitem(spark, d):
    """The fact prefilter alone: lineitem SEMI region-suppliers + a
    same-grain reduce (no orderkey exchange, no composite join)."""
    li = load_table(spark, d, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    li = li.join(
        _region_suppliers(spark, d).select("s_suppkey"),
        li.l_suppkey == F.col("s_suppkey"),
        "left_semi",
    )
    return li.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines")
    )


def _stage_cust_orders(spark, d):
    """The customer fold alone: date-filtered orders ⋈ customer at
    order grain (the custkey exchange)."""
    orders = load_table(spark, d, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q5_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q5_END).cast("timestamp"))
    )
    return orders.join(
        load_table(spark, d, "customer"),
        orders.o_custkey == F.col("c_custkey"),
    ).select("o_orderkey", "c_nationkey")


def main() -> None:
    dirs = sys.argv[1:] or ["testdata_scaled/x1", "testdata_scaled/x8"]
    spark = get_spark("hhek2sqlite_spark-q5-decomp")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"loadavg_at_start": [round(x, 2) for x in os.getloadavg()]}
    for d in dirs:
        label = os.path.basename(d.rstrip("/"))
        cases = {
            "full": lambda: q_regional_supplier_volume(spark, d),
            "stage_semi_lineitem": lambda: _stage_semi_lineitem(spark, d),
            "stage_cust_orders": lambda: _stage_cust_orders(spark, d),
        }
        for fn in cases.values():  # warm every case once before timing
            fn().write.format("noop").mode("overwrite").save()
        samples: dict[str, list[float]] = {k: [] for k in cases}
        for _rep in range(REPS):  # interleaved: one rep of each per round
            for k, fn in cases.items():
                t0 = time.perf_counter()
                fn().write.format("noop").mode("overwrite").save()
                samples[k].append(round(time.perf_counter() - t0, 4))
        out[label] = {
            k: {"median": round(statistics.median(v), 4), "samples": v}
            for k, v in samples.items()
        }
        print(f"{label}: " + json.dumps(out[label]), file=sys.stderr)
    if len(dirs) == 2:
        a, b = (os.path.basename(d.rstrip("/")) for d in dirs)
        out["growth"] = {
            k: round(out[b][k]["median"] / out[a][k]["median"], 2)
            for k in out[a]
        }
        out["stage_share"] = {
            lbl: {
                k: round(out[lbl][k]["median"] / out[lbl]["full"]["median"], 2)
                for k in out[lbl]
            }
            for lbl in (a, b)
        }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
