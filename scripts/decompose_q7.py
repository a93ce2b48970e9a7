#!/usr/bin/env python
"""Stage decomposition of nation_trade_flows (TPC-H Q7) — VERDICT r14
#4: its SCALING curve improves the least (ratio 17.0 -> 15.8, Spark
wall x2.1 for x8 data). Questions this answers with interleaved
medians at x1/x8:

1. Which exchange dominates — the customer-side fold (orders ⋈
   customer ⋈ broadcast(nation) -> order-keyed relation) or the fact
   shuffle (lineitem ⋈ sp_enriched ⋈ ord_enriched + final agg)?
2. Does folding nation INTO customer BEFORE orders (one fewer
   broadcast rebuild inside the orders join pipeline) move the total?

Variants share every downstream operator; the only delta is the
customer-chain join order. Protocol: engine-A/B interleaved (variant
A rep, variant B rep, alternating), median of 3, noop sink, quiet box.

Usage: python scripts/decompose_q7.py [x1_dir x8_dir]
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

from hhek2sqlite_spark.plans.extensions import q_nation_trade_flows  # noqa: E402
from hhek2sqlite_spark.plans.reference import _disc_e6, _out1e6  # noqa: E402
from hhek2sqlite_spark.session import get_spark  # noqa: E402
from hhek2sqlite_spark.sources.parquet import load_table  # noqa: E402

REPS = 3


def _ord_enriched_current(spark, d):
    orders = load_table(spark, d, "orders")
    cust = load_table(spark, d, "customer")
    nation = load_table(spark, d, "nation")
    cn = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
        )
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(cn, F.col("c_nationkey") == F.col("c_nk"))
        .select(
            "o_orderkey",
            "cust_nation",
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
    )


def _ord_enriched_custfirst(spark, d):
    orders = load_table(spark, d, "orders")
    cust = load_table(spark, d, "customer")
    nation = load_table(spark, d, "nation")
    cn = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
        )
    )
    cust_n = cust.join(cn, cust.c_nationkey == F.col("c_nk")).select(
        "c_custkey", "cust_nation"
    )
    return orders.join(cust_n, orders.o_custkey == F.col("c_custkey")).select(
        "o_orderkey",
        "cust_nation",
        F.year("o_orderdate").cast("int").alias("order_year"),
    )


def _full(spark, d, ord_builder):
    li = load_table(spark, d, "lineitem")
    supp = load_table(spark, d, "supplier")
    nation = load_table(spark, d, "nation")
    sn = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
        )
    )
    sp = supp.join(sn, F.col("s_nationkey") == F.col("s_nk")).select(
        "s_suppkey", "supp_nation"
    )
    return (
        li.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(sp, li.l_suppkey == F.col("s_suppkey"))
        .join(ord_builder(spark, d), li.l_orderkey == F.col("o_orderkey"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", "order_year")
        .agg(
            _out1e6(F.sum(_disc_e6("l_extendedprice", "l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


def _fact_only(spark, d):
    """The fact side WITHOUT the orders attach: lineitem ⋈ sp_enriched
    + the same-grain reduce — isolates the supplier broadcast + fact
    scan cost from the orderkey exchange."""
    li = load_table(spark, d, "lineitem")
    supp = load_table(spark, d, "supplier")
    nation = load_table(spark, d, "nation")
    sn = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
        )
    )
    sp = supp.join(sn, F.col("s_nationkey") == F.col("s_nk")).select(
        "s_suppkey", "supp_nation"
    )
    return (
        li.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(sp, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("supp_nation")
        .agg(F.sum(_disc_e6("l_extendedprice", "l_discount")).alias("rev_e6"))
    )


def _timed(fn, reps=REPS) -> list[float]:
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        ts.append(round(time.perf_counter() - t0, 4))
    return ts


def main() -> None:
    dirs = sys.argv[1:] or ["testdata_scaled/x1", "testdata_scaled/x8"]
    spark = get_spark("hhek2sqlite_spark-q7-decomp")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"loadavg_at_start": [round(x, 2) for x in os.getloadavg()]}
    for d in dirs:
        label = os.path.basename(d.rstrip("/"))
        cases = {
            "full_current": lambda: q_nation_trade_flows(spark, d),
            "full_custfirst": lambda: _full(spark, d, _ord_enriched_custfirst),
            "stage_ord_enriched_current": lambda: _ord_enriched_current(spark, d),
            "stage_ord_enriched_custfirst": lambda: _ord_enriched_custfirst(
                spark, d
            ),
            "stage_fact_no_orders": lambda: _fact_only(spark, d),
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
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
