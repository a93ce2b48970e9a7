#!/usr/bin/env python
"""Quality evidence for the ingest-time semdedup path (VERDICT r15 #4):
SEMDEDUP_RECALL.json scores the batch-dedup operator; nothing scored the
INCREMENTAL path's admit/reject decisions against ground truth. This
sweeps (seed_stride x coarse_k) and writes SEMDEDUP_INCR_RECALL.json.

Ground-truth batch construction (sf0.1 embeddings = existing corpus):

- TRUE DUPS: the registry injection recipe (every corpus vec_id % 10
  == 0 reappears at id + 10^7, +-2%% elementwise, cosine ~0.9996 to its
  partner — above tau 0.99). Correct decision: REJECT.
- TRUE NOVEL: every corpus vec_id % 10 == 5 reappears at id + 2*10^7
  multiplied by a fixed Rademacher sign pattern (the scaling-series
  isometry trick): cosine to EVERY corpus vector is far below tau (to
  its own original: a random +-weighted sum ~N(0, 1/dim-ish); to
  others: the corpus' organic <0.6 ceiling, sign-scrambled). Correct
  decision: ADMIT.

Metrics per operating point:

  recall        = rejected true-dups / n_true_dups
  false_rejects = rejected true-novel rows (must be 0 — rejecting
                  genuinely new data is silent data loss, the worst
                  failure mode of an ingest gate)

At the registry point (stride 64, coarse_k 16) the store path
(build_semdedup_store + semantic_dedup_incremental_from_store) is run
beside the recompute path and must produce IDENTICAL decisions.

Usage: python scripts/semdedup_incremental_recall.py [sf_dir]
Run on a QUIET box (1-min loadavg < 1 at start).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hhek2sqlite_spark.operators.similarity import (  # noqa: E402
    build_semdedup_store,
    semantic_dedup_incremental,
    semantic_dedup_incremental_from_store,
)
from hhek2sqlite_spark.operators.util import owned_result  # noqa: E402
from hhek2sqlite_spark.plans.extensions import (  # noqa: E402
    _SEMDEDUP_TAU,
)
from hhek2sqlite_spark.session import get_spark  # noqa: E402
from hhek2sqlite_spark.sources.parquet import load_table  # noqa: E402

STRIDES = [32, 64, 128]
COARSE = [None, 8, 16, 32]
DUP_OFFSET = 10_000_000
NOVEL_OFFSET = 20_000_000
REGISTRY_POINT = (64, 16)


def _batch(spark, base, dim: int):
    dups = base.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + DUP_OFFSET).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x
            * (
                F.lit(1.0)
                + F.lit(0.01) * ((F.col("vec_id") + i) % 5 - 2).cast("double")
            ),
        ).alias("embedding"),
    )
    rng = np.random.default_rng(424242)
    signs = [float(s) for s in (rng.integers(0, 2, size=dim) * 2 - 1)]
    signs_col = F.array(*[F.lit(s) for s in signs])
    novel = base.filter(F.col("vec_id") % 10 == 5).select(
        (F.col("vec_id") + NOVEL_OFFSET).alias("vec_id"),
        F.zip_with("embedding", signs_col, lambda x, s: x * s).alias("embedding"),
    )
    return dups.unionByName(novel)


def _score(out_df) -> dict:
    row = out_df.agg(
        F.sum(
            F.when(
                (F.col("admitted") == 0) & (F.col("vec_id") < NOVEL_OFFSET), 1
            ).otherwise(0)
        ).alias("rej_dup"),
        F.sum(
            F.when(
                (F.col("admitted") == 0) & (F.col("vec_id") >= NOVEL_OFFSET), 1
            ).otherwise(0)
        ).alias("rej_novel"),
        F.sum(F.when(F.col("vec_id") < NOVEL_OFFSET, 1).otherwise(0)).alias(
            "n_dup"
        ),
        F.sum(F.when(F.col("vec_id") >= NOVEL_OFFSET, 1).otherwise(0)).alias(
            "n_novel"
        ),
    ).collect()[0]
    return {
        "recall": round(row["rej_dup"] / row["n_dup"], 4),
        "false_rejects": int(row["rej_novel"]),
        "n_dup": int(row["n_dup"]),
        "n_novel": int(row["n_novel"]),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("hhek2sqlite_spark-semdedup-incr-recall")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    dim = len(base.select("embedding").first()["embedding"])
    batch = _batch(spark, base, dim).localCheckpoint(eager=True)

    points = []
    for stride in STRIDES:
        for ck in COARSE:
            with owned_result(
                semantic_dedup_incremental(
                    base,
                    batch,
                    seed_stride=stride,
                    tau_e6=_SEMDEDUP_TAU,
                    coarse_k=ck,
                )
            ) as out:
                pt = {"seed_stride": stride, "coarse_k": ck, **_score(out)}
            points.append(pt)
            print(json.dumps(pt), file=sys.stderr)

    # store path == recompute path at the registry point
    stride, ck = REGISTRY_POINT
    with owned_result(
        build_semdedup_store(base, seed_stride=stride, coarse_k=ck)
    ) as store:
        with owned_result(
            semantic_dedup_incremental_from_store(
                store, batch, tau_e6=_SEMDEDUP_TAU, coarse_k=ck
            )
        ) as out:
            store_score = _score(out)
    recompute_score = next(
        {k: p[k] for k in ("recall", "false_rejects", "n_dup", "n_novel")}
        for p in points
        if (p["seed_stride"], p["coarse_k"]) == REGISTRY_POINT
    )

    doc = {
        "sf_dir": sf_dir,
        "tau_e6": _SEMDEDUP_TAU,
        "ground_truth": (
            "true dups: +-2% elementwise copies at cosine ~0.9996; true "
            "novel: Rademacher-sign-flipped organics (cosine to every "
            "corpus vector far below tau). recall = rejected dups / dups; "
            "false_rejects = rejected novel rows (silent data loss if >0)"
        ),
        "points": points,
        "registry_point": {
            "seed_stride": stride,
            "coarse_k": ck,
            "recompute": recompute_score,
            "store_path": store_score,
            "identical": store_score == recompute_score,
        },
        "loadavg_at_start": [round(x, 2) for x in os.getloadavg()],
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SEMDEDUP_INCR_RECALL.json",
    )
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"points": len(points), "out": path}))
    spark.stop()


if __name__ == "__main__":
    main()
