#!/usr/bin/env python
"""Interleaved A/B for two more duplicated-subtree candidates found by
the round-18 sweep (same class as the accepted vocab_growth re-plan):

- ngram_novelty (baseline 2.63s): the distinct (doc, gram) relation
  feeds the corpus-first aggregation AND the join-back — Catalyst
  re-derives the explode+distinct per consumer. Variant B checkpoints
  it (the rare_token_share precedent: a (doc, key)-grain relation,
  document-bounded).
- dice_collocations (baseline 1.01s): the unigram count relation feeds
  both count-attach joins (c1/c2), and the tokenized base feeds the
  unigram AND bigram branches. Variant B checkpoints the unigram
  counts (vocab-sized).

Both variants constructed here; alternated rep-by-rep in one session.

Usage: python scripts/ab_ngram_r18.py [rounds]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hhek2sqlite_spark.operators.text import tokens  # noqa: E402
from hhek2sqlite_spark.operators.util import owned_result, spread  # noqa: E402
from hhek2sqlite_spark.session import get_spark  # noqa: E402
from hhek2sqlite_spark.sources.parquet import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _grams(documents, n):
    toks = tokens("text")
    base = documents.select(F.col("doc_id"), toks.alias("toks")).filter(
        F.size("toks") >= n
    )
    return base.select(
        "doc_id",
        F.explode(
            F.transform(
                F.slice("toks", 1, F.size("toks") - (n - 1)),
                lambda x, i: F.concat_ws(
                    " ",
                    F.array(
                        *[
                            F.element_at(F.col("toks"), i + F.lit(j + 1))
                            for j in range(n)
                        ]
                    ),
                ),
            )
        ).alias("g"),
    ).distinct()


def _novelty_tail(grams):
    firsts = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    return (
        grams.join(firsts, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_grams"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
            .cast("int")
            .alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.round(F.lit(1000000.0) * F.col("n_novel") / F.col("n_grams"))
            .cast("long")
            .alias("novelty_e6"),
        )
    )


def novelty_a(docs):
    return _novelty_tail(_grams(docs, 3))


def novelty_b(docs):
    return _novelty_tail(_grams(docs, 3).localCheckpoint(eager=True))


def _dice_tail(uni, pairs, min_count=5, k=50):
    bg = (
        pairs.select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_bg"))
        .filter(F.col("c_bg") >= min_count)
    )
    c1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    c2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    return (
        bg.join(c1, "w1")
        .join(c2, "w2")
        .select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"),
            F.col("c_bg").cast("int").alias("c_bg"),
            F.col("c1").cast("int").alias("c1"),
            F.col("c2").cast("int").alias("c2"),
            F.round(
                F.lit(1000000.0) * 2 * F.col("c_bg") / (F.col("c1") + F.col("c2"))
            )
            .cast("long")
            .alias("dice_e6"),
        )
        .orderBy(F.col("dice_e6").desc(), F.col("bigram").asc())
        .limit(k)
    )


def _dice_parts(docs):
    toks = tokens("text")
    base = docs.select(toks.alias("toks"))
    uni = (
        base.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = base.filter(F.size("toks") >= 2).select(
        F.explode(
            F.transform(
                F.slice("toks", 1, F.size("toks") - 1),
                lambda x, i: F.struct(
                    x.alias("w1"),
                    F.element_at(F.col("toks"), i + F.lit(2)).alias("w2"),
                ),
            )
        ).alias("p")
    )
    return uni, pairs


def dice_a(docs):
    uni, pairs = _dice_parts(docs)
    return _dice_tail(uni, pairs)


def dice_b(docs):
    uni, pairs = _dice_parts(docs)
    return _dice_tail(uni.localCheckpoint(eager=True), pairs)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = get_spark("r18-ab-ngram")
    spark.sparkContext.setLogLevel("ERROR")
    docs = lambda: spread(load_table(spark, SF_DIR, "documents"))  # noqa: E731
    out = {"sf_dir": SF_DIR, "rounds": rounds, "loadavg": list(os.getloadavg())}
    for name, fa, fb in (
        ("ngram_novelty", novelty_a, novelty_b),
        ("dice_collocations", dice_a, dice_b),
    ):
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
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
