#!/usr/bin/env python
"""Interleaved A/B for the vocab_growth / source_overlap re-plans
(round 18, VERDICT r17 #8): the r17 'deliberately left' duplicated
token-explode branches vs a bounded-width intermediate —

- vocab_growth: reduce occurrences to (bucket, token) COUNTS first
  (one map-side-combined shuffle), checkpoint that vocab-scale
  relation, and derive both per_bucket and firsts from it, instead of
  re-running the explode + full occurrence shuffle per consumer.
- source_overlap: checkpoint the distinct (source, token) relation its
  three consumers (vocab + both self-join sides) each re-derived.

Both variants are constructed IN THIS SCRIPT (A = the r17 tree shape,
B = the re-plan) and alternated rep-by-rep in one session so co-tenant
drift cancels (the round-17 measurement protocol). Results are exact
by construction either way (same aggregates over the same grains).

Usage: python scripts/ab_vocab_r18.py [rounds]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from hhek2sqlite_spark.operators.text import tokens  # noqa: E402
from hhek2sqlite_spark.operators.util import owned_result, spread  # noqa: E402
from hhek2sqlite_spark.session import get_spark  # noqa: E402
from hhek2sqlite_spark.sources.parquet import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_BUCKETS = 20


def vocab_growth_a(documents):
    """r17 shape: occ feeds two consumers, explode re-run per branch."""
    occ = documents.select(F.col("doc_id"), F.explode(tokens("text")).alias("w"))
    mx = documents.agg((F.max("doc_id") + 1).alias("m"))
    occ = occ.crossJoin(F.broadcast(mx)).withColumn(
        "bucket", F.expr(f"CAST((doc_id * {N_BUCKETS}) DIV m AS INT)")
    )
    per_bucket = occ.groupBy("bucket").agg(F.count(F.lit(1)).alias("bucket_tokens"))
    firsts = (
        occ.groupBy("w")
        .agg(F.min("bucket").alias("fb"))
        .groupBy(F.col("fb").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("new_types"))
    )
    w = Window.orderBy("bucket")
    return (
        per_bucket.join(firsts, "bucket", "left")
        .na.fill({"new_types": 0})
        .select(
            "bucket",
            F.col("new_types").cast("int").alias("new_types"),
            F.col("bucket_tokens").cast("long").alias("bucket_tokens"),
            F.sum("new_types").over(w).cast("long").alias("cum_vocab"),
            F.sum("bucket_tokens").over(w).cast("long").alias("cum_tokens"),
        )
    )


def vocab_growth_b(documents):
    """r18 re-plan: (bucket, token) counts once, checkpointed."""
    occ = documents.select(F.col("doc_id"), F.explode(tokens("text")).alias("w"))
    mx = documents.agg((F.max("doc_id") + 1).alias("m"))
    occ = occ.crossJoin(F.broadcast(mx)).withColumn(
        "bucket", F.expr(f"CAST((doc_id * {N_BUCKETS}) DIV m AS INT)")
    )
    bw = (
        occ.groupBy("bucket", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    per_bucket = bw.groupBy("bucket").agg(F.sum("c").alias("bucket_tokens"))
    firsts = (
        bw.groupBy("w")
        .agg(F.min("bucket").alias("fb"))
        .groupBy(F.col("fb").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("new_types"))
    )
    w = Window.orderBy("bucket")
    return (
        per_bucket.join(firsts, "bucket", "left")
        .na.fill({"new_types": 0})
        .select(
            "bucket",
            F.col("new_types").cast("int").alias("new_types"),
            F.col("bucket_tokens").cast("long").alias("bucket_tokens"),
            F.sum("new_types").over(w).cast("long").alias("cum_vocab"),
            F.sum("bucket_tokens").over(w).cast("long").alias("cum_tokens"),
        )
    )


def source_overlap_a(documents):
    """r17 shape: sv re-derived by all three consumers."""
    sv = documents.select(F.col("source"), F.explode(tokens("text")).alias("w")).distinct()
    return _overlap_tail(sv)


def source_overlap_b(documents):
    """r18 re-plan: sv checkpointed once."""
    sv = (
        documents.select(F.col("source"), F.explode(tokens("text")).alias("w"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    return _overlap_tail(sv)


def _overlap_tail(sv):
    vocab = sv.groupBy("source").agg(F.count(F.lit(1)).alias("v"))
    a = sv.select(F.col("source").alias("source_a"), "w")
    b = sv.select(F.col("source").alias("source_b"), "w")
    inter = (
        a.join(b, "w")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    va = vocab.select(F.col("source").alias("source_a"), F.col("v").alias("va"))
    vb = vocab.select(F.col("source").alias("source_b"), F.col("v").alias("vb"))
    pairs = (
        va.crossJoin(vb)
        .filter(F.col("source_a") < F.col("source_b"))
        .join(inter, ["source_a", "source_b"], "left")
        .na.fill({"inter": 0})
    )
    return pairs.select(
        "source_a",
        "source_b",
        F.col("inter").cast("int").alias("inter"),
        F.round(
            F.lit(1000000.0)
            * F.col("inter")
            / (F.col("va") + F.col("vb") - F.col("inter"))
        )
        .cast("long")
        .alias("jaccard_e6"),
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_spark("r18-ab-vocab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = lambda: spread(load_table(spark, SF_DIR, "documents"))  # noqa: E731
    cases = {
        "vocab_growth": (vocab_growth_a, vocab_growth_b),
        "source_overlap": (source_overlap_a, source_overlap_b),
    }
    out = {"sf_dir": SF_DIR, "rounds": rounds, "loadavg": list(os.getloadavg())}
    for name, (fa, fb) in cases.items():
        # equality check once (both variants must agree row-for-row)
        ra = sorted(map(tuple, fa(docs()).collect()))
        rb = sorted(map(tuple, fb(docs()).collect()))
        assert ra == rb, f"{name}: variants disagree"
        walls = {"a": [], "b": []}
        for _ in range(rounds):
            for tag, fn in (("a", fa), ("b", fb)):
                t0 = time.perf_counter()
                with owned_result(fn(docs())) as df:
                    df.write.format("noop").mode("overwrite").save()
                walls[tag].append(round(time.perf_counter() - t0, 4))
        out[name] = {
            "a_walls": walls["a"],
            "b_walls": walls["b"],
            "a_median": round(statistics.median(walls["a"]), 4),
            "b_median": round(statistics.median(walls["b"]), 4),
            "b_wins": sum(1 for x, y in zip(walls["a"], walls["b"]) if y < x),
        }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
