#!/usr/bin/env python
"""LSH band-join skew probe (round 18, VERDICT r17 #9): the (band, key)
self-join in lsh_bucket_pairs is the one place a hot bucket creates a
straggler at 100 TB. This probe writes the band-key population profile
to LSH_SKEW.json: per-bucket occupancy quantiles, the max/median ratio
(guide §2.5 calls >5-10x worth fixing), the pair fan-out each band
contributes, and the same profile on the x8/x16 scaled corpora when
present — the evidence for either salting hot buckets or recording an
explicit not-skewed decision.

Usage: python scripts/lsh_skew_probe_r18.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hhek2sqlite_spark.operators.similarity import (  # noqa: E402
    _QUANT_SCALE,
    _hyperplanes,
)
from hhek2sqlite_spark.session import get_spark  # noqa: E402

N_BANDS, BAND_BITS, DIM = 16, 4, 64


def profile(spark, emb_df) -> dict:
    """Bucket occupancy of the (band, key) relation — computed with the
    operator's own integer sign-bit arithmetic (plain SQL here: the
    probe needs counts, not the Arrow kernel)."""
    planes = _hyperplanes(N_BANDS * BAND_BITS, DIM)
    e = emb_df.select(
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.round(x * _QUANT_SCALE).cast("long"),
        ).alias("eq")
    )
    # per band: key = sum of sign bits << i over the band's planes
    keys = []
    for b in range(N_BANDS):
        bits = []
        for i in range(BAND_BITS):
            p = planes[b * BAND_BITS + i]
            dot = " + ".join(f"eq[{d}] * {c}L" for d, c in enumerate(p))
            bits.append(f"(CASE WHEN ({dot}) > 0 THEN {1 << i} ELSE 0 END)")
        keys.append(" + ".join(bits))
    hashed = e.select(
        F.posexplode(F.expr("array(" + ", ".join(keys) + ")")).alias(
            "band", "key"
        )
    )
    counts = (
        hashed.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    occ = np.array(sorted(r["c"] for r in counts))
    pair_fanout = int((occ.astype(np.int64) * (occ - 1) // 2).sum())
    return {
        "n_buckets": int(len(occ)),
        "n_rows": int(occ.sum()),
        "occupancy": {
            "min": int(occ.min()),
            "p50": int(np.percentile(occ, 50)),
            "p90": int(np.percentile(occ, 90)),
            "p99": int(np.percentile(occ, 99)),
            "max": int(occ.max()),
        },
        "max_over_median": round(float(occ.max() / np.percentile(occ, 50)), 2),
        "candidate_pair_fanout": pair_fanout,
        "top8_buckets": [int(x) for x in occ[-8:][::-1]],
    }


def main() -> None:
    spark = get_spark("r18-lsh-skew")
    spark.sparkContext.setLogLevel("ERROR")
    from hhek2sqlite_spark.sources.parquet import load_table

    out = {"n_bands": N_BANDS, "band_bits": BAND_BITS, "corpora": {}}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out["corpora"]["sf0.1"] = profile(spark, load_table(spark, sf_dir, "embeddings"))
    for scale in ("x8", "x16"):
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "testdata_scaled",
            scale,
            "embeddings.parquet",
        )
        if os.path.exists(path):
            out["corpora"][scale] = profile(spark, spark.read.parquet(path))
    # AQE skew-join facts for the record: splitting applies to sort-merge /
    # shuffled-hash joins when a partition exceeds BOTH skewedPartitionFactor
    # x median AND skewedPartitionThresholdInBytes (256 MB default) — a
    # partition holds MANY (band, key) buckets, so single-bucket heat shows
    # up as partition heat only when one bucket dominates its partition.
    out["aqe"] = {
        "skewJoin_enabled": spark.conf.get("spark.sql.adaptive.skewJoin.enabled"),
        "skewedPartitionFactor": spark.conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
        ),
        "skewedPartitionThresholdInBytes": spark.conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        ),
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "LSH_SKEW.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
