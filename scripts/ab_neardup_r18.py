#!/usr/bin/env python
"""Interleaved A/B for the r17 batch-1 neardup_clusters re-plan
(round 18, VERDICT r17 #7): the r17 claim (3.43 -> 2.80s
minhash_clusters / 3.97 -> 2.90s dedup_keep_best) was builder-
self-reported from separate runs; this records a quiet-window
INTERLEAVED A/B of the r16 loop (sym join + groupBy + join-back:
3 keyed exchanges per round) vs the shipped r17/r18 loop (closed
neighborhood via self-edges: join + map-combined groupBy, the cached
edges never re-keyed) — variant A is the r16 code verbatim (from
commit 1886032), variant B calls the shipped operator. Per-round
labels are identical by construction (min over the same closed
neighborhood), checked once per case before timing.

Usage: python scripts/ab_neardup_r18.py [rounds]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hhek2sqlite_spark.operators import dedup  # noqa: E402
from hhek2sqlite_spark.operators.util import (  # noqa: E402
    owned_result,
    release_local_checkpoints,
    release_owned_caches,
)
from hhek2sqlite_spark.session import get_spark  # noqa: E402
from hhek2sqlite_spark.sources.parquet import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def neardup_clusters_r16(pairs, *, max_iter: int = 25):
    """The r16 loop, verbatim (commit 1886032) — 3 keyed exchanges per
    round: sym x labels join, neighbor-min groupBy, join-back least()."""
    edges = pairs.select("id_a", "id_b").cache()
    sym = edges.union(
        edges.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    )
    labels = (
        sym.select(F.col("id_a").alias("id")).distinct().withColumn("label", F.col("id"))
    ).cache()
    try:
        prev_sum = labels.agg(F.sum("label")).collect()[0][0]
        for _ in range(max_iter):
            nbr_min = (
                sym.join(labels.withColumnRenamed("id", "id_b"), "id_b")
                .groupBy("id_a")
                .agg(F.min("label").alias("nbr_label"))
                .withColumnRenamed("id_a", "id")
            )
            new_labels = (
                labels.join(nbr_min, "id", "left")
                .select(
                    "id",
                    F.least(
                        F.col("label"), F.coalesce("nbr_label", F.col("label"))
                    ).alias("label"),
                )
            ).cache()
            new_sum = new_labels.agg(F.sum("label")).collect()[0][0]
            labels.unpersist()
            labels = new_labels
            if new_sum == prev_sum:
                return labels.select(
                    F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
                ).localCheckpoint()
            prev_sum = new_sum
        return dedup.star_connected_components(edges)
    finally:
        edges.unpersist()
        labels.unpersist()
        release_owned_caches(pairs)


def clusters_a(spark):
    docs = load_table(spark, SF_DIR, "documents")
    return neardup_clusters_r16(dedup.minhash_lsh_pairs(docs))


def clusters_b(spark):
    docs = load_table(spark, SF_DIR, "documents")
    return dedup.neardup_clusters(dedup.minhash_lsh_pairs(docs))


def keep_best_a(spark):
    docs = load_table(spark, SF_DIR, "documents")
    clusters = neardup_clusters_r16(dedup.minhash_lsh_pairs(docs))
    return dedup.dedup_keep_best(docs, clusters)


def keep_best_b(spark):
    docs = load_table(spark, SF_DIR, "documents")
    clusters = dedup.neardup_clusters(dedup.minhash_lsh_pairs(docs))
    return dedup.dedup_keep_best(docs, clusters)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("r18-ab-neardup")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"sf_dir": SF_DIR, "rounds": rounds, "loadavg": list(os.getloadavg())}
    cases = {
        "minhash_clusters": (clusters_a, clusters_b),
        "dedup_keep_best": (keep_best_a, keep_best_b),
    }
    for name, (fa, fb) in cases.items():
        ra = fa(spark)
        rb = fb(spark)
        assert sorted(map(tuple, ra.collect())) == sorted(map(tuple, rb.collect()))
        release_local_checkpoints(ra)
        release_local_checkpoints(rb)
        walls = {"a": [], "b": []}
        for _ in range(rounds):
            for tag, fn in (("a", fa), ("b", fb)):
                t0 = time.perf_counter()
                with owned_result(fn(spark)) as df:
                    df.write.format("noop").mode("overwrite").save()
                walls[tag].append(round(time.perf_counter() - t0, 4))
        out[name] = {
            "r16_walls": walls["a"],
            "r17_walls": walls["b"],
            "r16_median": round(statistics.median(walls["a"]), 4),
            "r17_median": round(statistics.median(walls["b"]), 4),
            "r17_wins": sum(1 for x, y in zip(walls["a"], walls["b"]) if y < x),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
