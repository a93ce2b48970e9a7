#!/usr/bin/env python
"""Per-micro-batch driver-job count for the streaming semdedup tier
(round 18, VERDICT r17 #4): judge K micro-batches through
``judge_semdedup_batch`` against a parquet base store and print the
Spark JOB COUNT of each — the drift-free metric for the per-batch
router overhead (metadata read + coarse collect) that the session
router cache removes. Writes nothing outside /tmp.

Usage: python scripts/stream_jobs_r18.py <tag> [n_batches]
Output: one JSON line {"tag": ..., "jobs_per_batch": [...], ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hhek2sqlite_spark.operators.similarity import build_semdedup_store  # noqa: E402
from hhek2sqlite_spark.operators.util import release_local_checkpoints  # noqa: E402
from hhek2sqlite_spark.session import get_spark  # noqa: E402
from hhek2sqlite_spark.sources.parquet import load_table  # noqa: E402
from hhek2sqlite_spark.streaming.semdedup import (  # noqa: E402
    init_semdedup_stream_store,
    judge_semdedup_batch,
)
from scripts.explain_r18 import count_jobs  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "probe"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("r18-stream-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, SF_DIR, "embeddings")
    root = tempfile.mkdtemp(prefix="semstream_r18_")
    try:
        store = build_semdedup_store(emb, seed_stride=64, coarse_k=16)
        init_semdedup_stream_store(store, root)
        release_local_checkpoints(store)
        # batches: disjoint vec_id slices offset far above the corpus,
        # each scaled +-2% like the registry recipe so some rows reject
        jobs = []
        for i in range(n_batches):
            batch = emb.filter(F.col("vec_id") % 10 == i).select(
                (F.col("vec_id") + 10_000_000 * (i + 1)).alias("vec_id"),
                F.transform(
                    F.col("embedding").cast("array<double>"),
                    lambda x: x * (1.0 + 0.002 * (i + 1)),
                ).alias("embedding"),
            )
            _, n = count_jobs(
                spark,
                judge_semdedup_batch,
                batch,
                i,
                root=root,
                tau_e6=990_000,
            )
            jobs.append(n)
        print(
            json.dumps(
                {
                    "tag": tag,
                    "sf_dir": SF_DIR,
                    "n_batches": n_batches,
                    "jobs_per_batch": jobs,
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
