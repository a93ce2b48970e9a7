#!/usr/bin/env python
"""Recall evidence for semantic_dedup (VERDICT r14 #8, the IVF_RECALL
analog): the cell fence means a near-dup pair straddling a cell
boundary is missed BY DESIGN (as in the SemDeDup paper's k-means
cells) — this measures how often, per operating point.

Ground truth: the registry query's injected near-dup copies (every
vec_id % 10 == 0 original reappears at vec_id + 10^7, cosine ~0.9996
— above tau 0.99) are ALL true positives, and the corpus has no
organic pair above cosine ~0.60 (measured fixture fact recorded at
plans/extensions.py), so at tau 0.99:

  recall      = removed injected copies / injected copies
  false-marks = removed organic rows (must be 0 — any removal below
                the injection tier is a correctness bug, not tuning)

Sweeps seed_stride x coarse_k, including coarse_k=None (the one-level
reference). One-level is NOT a recall ceiling for the two-level
points (ADVICE r15): re-routing a vector across cells can SPLIT a
near-dup pair one-level kept together, but can equally MERGE a pair
one-level split — and the measured sweep shows both directions
(stride 64: coarse_k=8 reads 0.99 vs one-level 0.975). The sweep
itself is the evidence; no ordering between the tiers is claimed.
Writes SEMDEDUP_RECALL.json at the repo root.

Usage: python scripts/semdedup_recall.py [sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hhek2sqlite_spark.operators.similarity import semantic_dedup  # noqa: E402
from hhek2sqlite_spark.operators.util import (  # noqa: E402
    release_local_checkpoints,
)
from hhek2sqlite_spark.plans.extensions import (  # noqa: E402
    _NEARDUP_COPY_OFFSET,
    _SEMDEDUP_TAU,
    _augment_near_dups,
)
from hhek2sqlite_spark.session import get_spark  # noqa: E402
from hhek2sqlite_spark.sources.parquet import load_table  # noqa: E402

STRIDES = [32, 64, 128]
COARSE = [None, 8, 16, 32]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("hhek2sqlite_spark-semdedup-recall")
    spark.sparkContext.setLogLevel("ERROR")
    emb = _augment_near_dups(load_table(spark, sf_dir, "embeddings"))
    n_injected = emb.filter(F.col("vec_id") >= _NEARDUP_COPY_OFFSET).count()
    points = []
    for stride in STRIDES:
        for ck in COARSE:
            out = semantic_dedup(
                emb,
                seed_stride=stride,
                seed_max_id=_NEARDUP_COPY_OFFSET,
                tau_e6=_SEMDEDUP_TAU,
                coarse_k=ck,
            )
            agg = out.agg(
                F.sum(
                    F.when(
                        (F.col("kept") == 0)
                        & (F.col("vec_id") >= _NEARDUP_COPY_OFFSET),
                        1,
                    ).otherwise(0)
                ).alias("tp"),
                F.sum(
                    F.when(
                        (F.col("kept") == 0)
                        & (F.col("vec_id") < _NEARDUP_COPY_OFFSET),
                        1,
                    ).otherwise(0)
                ).alias("fp"),
                F.countDistinct("cell").alias("n_cells"),
            ).collect()[0]
            pt = {
                "seed_stride": stride,
                "coarse_k": ck,
                "n_cells": agg["n_cells"],
                "recall": round(agg["tp"] / n_injected, 4),
                "false_marks": int(agg["fp"]),
            }
            points.append(pt)
            # semantic_dedup is EAGER (localCheckpoint) — release each
            # point's blocks or 12 operating points accumulate executor
            # storage across the sweep (ADVICE r15)
            release_local_checkpoints(out)
            print(json.dumps(pt), file=sys.stderr)
    out_doc = {
        "sf_dir": sf_dir,
        "tau_e6": _SEMDEDUP_TAU,
        "n_injected": n_injected,
        "ground_truth": (
            "injected +-2% elementwise copies at cosine ~0.9996 (the "
            "_augment_near_dups recipe); no organic pair above ~0.60, so "
            "every removal must be an injected copy"
        ),
        "points": points,
        "loadavg_at_start": [round(x, 2) for x in os.getloadavg()],
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SEMDEDUP_RECALL.json",
    )
    with open(path, "w") as f:
        json.dump(out_doc, f, indent=1)
    print(json.dumps({"points": len(points), "out": path}))
    spark.stop()


if __name__ == "__main__":
    main()
