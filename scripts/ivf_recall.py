#!/usr/bin/env python
"""IVF recall-vs-probe operating curve (VERDICT r11 task 5).

The recall pytest pins one point (n_probe=4, n_cells=16); a production
deployment needs the CURVE to pick an operating point: recall@k against
the exact brute-force top-k, as n_probe sweeps 1..n_cells, for two cell
counts. Recall is a DETERMINISTIC property of the data + parameters
(centroid training is seeded by xxhash64 cell assignment, no RNG), so
unlike the timing artifacts this can be regenerated under any load —
contention cannot move it.

Writes IVF_RECALL.json at the repo root:
  {"sf_dir": ..., "n_queries": Q, "k": K,
   "curves": {"cells=16": [{"n_probe": p, "recall": r,
                             "probed_frac": p/cells}, ...], ...}}

Usage: python scripts/ivf_recall.py [sf_dir]   (default sf0.1)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hhek2sqlite_spark.operators import similarity  # noqa: E402
from hhek2sqlite_spark.session import get_spark  # noqa: E402
from hhek2sqlite_spark.sources.parquet import load_table  # noqa: E402

N_QUERIES = 50
K = 10
CELL_COUNTS = (16, 64)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("hhek2sqlite_spark-ivf-recall")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")

    exact = similarity.brute_force_topk(emb, n_queries=N_QUERIES, k=K)
    truth: dict[int, set[int]] = {}
    for r in exact.collect():
        truth.setdefault(r["q_id"], set()).add(r["vec_id"])
    n_truth = sum(len(v) for v in truth.values())

    curves = {}
    for n_cells in CELL_COUNTS:
        centroids = similarity.train_ivf_centroids(emb, n_cells=n_cells)
        indexed = similarity.build_ivf_index(emb, centroids=centroids)
        indexed = indexed.localCheckpoint(eager=True)  # amortize the build
        pts = []
        n_probe = 1
        while n_probe <= n_cells:
            got = similarity.ivf_topk(
                emb,
                n_queries=N_QUERIES,
                k=K,
                n_cells=n_cells,
                n_probe=n_probe,
                centroids=centroids,
                indexed=indexed,
            )
            hit = sum(
                1
                for r in got.collect()
                if r["vec_id"] in truth.get(r["q_id"], ())
            )
            pts.append(
                {
                    "n_probe": n_probe,
                    "recall": round(hit / n_truth, 4),
                    "probed_frac": round(n_probe / n_cells, 4),
                }
            )
            print(f"cells={n_cells} probe={n_probe}: {pts[-1]}", file=sys.stderr)
            n_probe *= 2
        curves[f"cells={n_cells}"] = pts
        from hhek2sqlite_spark.operators.util import release_local_checkpoints

        release_local_checkpoints(indexed)

    out = {
        "sf_dir": sf_dir,
        "n_queries": N_QUERIES,
        "k": K,
        "n_truth_pairs": n_truth,
        "curves": curves,
        "note": (
            "recall@k vs exact brute-force cosine top-k; deterministic "
            "(hash-seeded Lloyd, no RNG) so reproducible under any load"
        ),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "IVF_RECALL.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps({k: v for k, v in out.items() if k != "curves"}))
    spark.stop()


if __name__ == "__main__":
    main()
