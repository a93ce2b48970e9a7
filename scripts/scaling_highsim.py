#!/usr/bin/env python
"""Dedicated scaling curve for ``similarity_lsh_highsim`` (VERDICT r9
task 4) — writes SCALING_HIGHSIM.json.

Why not simply add the query to scripts/scaling_curve.py's SUBSET: the
make_scaled replicate-and-shift series is methodologically broken for
this query, twice.

1. **Quadratic true pairs.** make_scaled perturbs embedding copies by
   +c*1e-4 on one coordinate — copies of the same original sit at
   cosine ~0.9999, far above the 0.9 operating point, so the K copies
   of every vector form a mutual near-dup clique: true pairs grow as
   K^2. That is a property of the replication artifact, not of either
   engine — it would corrupt the slope exactly as scaling_curve.py's
   docstring warns for pair-generating operators.
2. **vec_id collision.** make_scaled shifts keys by c*10^7, which is
   the query's own _NEARDUP_COPY_OFFSET — copy 1 of vector v collides
   with the injected near-dup of v, giving two distinct vectors the
   same id and fanning out the candidate-verify join.

This script builds a series whose pair structure is LINEAR in K by
construction: copy c multiplies every embedding elementwise by a
deterministic Rademacher (+-1) sign pattern s_c derived from (coord,
copy). Elementwise sign flips PRESERVE every within-copy inner product
((x*s).(y*s) = x.y), so each copy contributes exactly the x1 corpus's
geometry — same organic max-sim (~0.60, below threshold), same 10%%
injected near-dups — while cross-copy cosines are sign-randomized
noise (|E| ~ 1/sqrt(dim) ~ 0.125, nowhere near 0.9). vec_ids shift by
c*10^9: far from the 10^7 injection offset for any K here, and
divisible by 10 so the injection rate stays exact. True pairs per
scale: exactly K * (pairs at x1) — verified by the row counts this
script records.

Usage: python scripts/scaling_highsim.py [K ...]   (default: 1 4 16 64)
Builds testdata_scaled_vec/x{K}/embeddings.parquet (dir of part files)
from /root/testdata/sf0.1/embeddings.parquet, measures the Spark query
vs its DuckDB oracle (median of 3, 1 warm rep, same protocol as
scaling_curve.py), writes SCALING_HIGHSIM.json at the repo root.

Run on a QUIET box only (BASELINE.md: 15-min loadavg < 1).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from hhek2sqlite_spark.plans import ORACLE_SQL, QUERIES  # noqa: E402
from hhek2sqlite_spark.session import get_spark  # noqa: E402

NAME = "similarity_lsh_highsim"
SRC = "/root/testdata/sf0.1/embeddings.parquet"
DST_ROOT = "testdata_scaled_vec"
COPY_SHIFT = 10**9
N_PARTS = 8
REPS = 3
SLOW_CUTOFF_SEC = 15.0


def _signs(dim: int, c: int) -> np.ndarray:
    # A real PRNG, not an affine hash: the first cut used bit 7 of
    # (i*a + c*b), which is affine mod 256 — copies whose offsets
    # differed by a small residue (e.g. c2-c1=13 -> argument shift 3)
    # got sign patterns differing in ~1 of dim coords, i.e. cosine
    # ~0.97 cross-copy NEAR-COLLISIONS that showed up as superlinear
    # pair counts in the x16/x64 linearity check. Independent
    # per-copy PCG64 streams make cross-copy patterns differ in
    # ~dim/2 coords (cosine ~0).
    rng = np.random.default_rng(987654321 + c)
    return (rng.integers(0, 2, size=dim).astype(np.float32) * 2.0) - 1.0


def build_series(ks: list[int]) -> dict[str, str]:
    tbl = pq.read_table(SRC)
    ids = tbl.column("vec_id").to_numpy()
    labels = tbl.column("label").to_numpy()
    vecs = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float32)
    n, dim = vecs.shape
    dirs = {}
    for k in ks:
        label = f"x{k}"
        parts_dir = os.path.join(DST_ROOT, label, "embeddings.parquet")
        os.makedirs(parts_dir, exist_ok=True)
        marker = os.path.join(parts_dir, "_done")
        if os.path.exists(marker):
            dirs[label] = os.path.join(DST_ROOT, label)
            continue
        all_ids = np.concatenate([ids + c * COPY_SHIFT for c in range(k)])
        all_vecs = np.concatenate(
            # c=0 keeps the ORIGINAL vectors so x1 is the production fixture
            [vecs if c == 0 else vecs * _signs(dim, c)[None, :] for c in range(k)]
        )
        all_labels = np.concatenate([labels] * k)
        order = np.arange(len(all_ids))
        bounds = np.linspace(0, len(order), N_PARTS + 1, dtype=int)
        for p in range(N_PARTS):
            sl = order[bounds[p] : bounds[p + 1]]
            out = pa.table(
                {
                    "vec_id": pa.array(all_ids[sl], type=pa.int64()),
                    "embedding": pa.array(
                        [row for row in all_vecs[sl]], type=pa.list_(pa.float32())
                    ),
                    "label": pa.array(all_labels[sl], type=pa.int32()),
                }
            )
            pq.write_table(out, os.path.join(parts_dir, f"part-{p:02d}.parquet"))
        open(marker, "w").close()
        dirs[label] = os.path.join(DST_ROOT, label)
    return dirs


def _median_time(fn, reps: int) -> float:
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def _measure(fn) -> float:
    t0 = time.perf_counter()
    fn()  # warm
    warm = time.perf_counter() - t0
    return _median_time(fn, 1 if warm > SLOW_CUTOFF_SEC else REPS)


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 16, 64]
    dirs = build_series(ks)
    spark = get_spark("hhek2sqlite_spark-scaling-highsim")
    spark.sparkContext.setLogLevel("ERROR")
    # many small part files: scan-split tuning as in the multirg runs
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 20))
    spark.conf.set("spark.sql.files.openCostInBytes", str(16384))
    fn = QUERIES[NAME]
    sql = ORACLE_SQL[NAME]
    points: dict[str, dict] = {}
    loadavg = [round(x, 2) for x in os.getloadavg()]
    for k in ks:
        label = f"x{k}"
        d = dirs[label]
        con = duckdb.connect()
        con.execute(f"SET threads={os.cpu_count()}")
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{d}/embeddings.parquet/*.parquet')"
        )
        n_pairs_oracle = con.execute(
            f"SELECT count(*) FROM ({sql})"
        ).fetchone()[0]
        n_pairs_spark = fn(spark, d).count()
        spark_sec = _measure(
            lambda: fn(spark, d).write.format("noop").mode("overwrite").save()
        )
        oracle_sec = _measure(lambda: con.execute(sql).fetchall())
        con.close()
        points[label] = {
            "spark_sec": round(spark_sec, 4),
            "oracle_sec": round(oracle_sec, 4),
            "ratio_raw": round(spark_sec / oracle_sec, 2),
            "pairs_spark": n_pairs_spark,
            "pairs_oracle": n_pairs_oracle,
        }
        print(f"{label}: {points[label]}", file=sys.stderr)
    first, last = f"x{ks[0]}", f"x{ks[-1]}"
    out = {
        "query": NAME,
        "protocol": {
            "reps": REPS,
            "stat": "median",
            "warm_runs": 1,
            "series": "sign-flip copies (linear true pairs, see docstring)",
        },
        "loadavg_at_start": loadavg,
        "series": [f"x{k}" for k in ks],
        "points": points,
        "spark_growth": round(
            points[last]["spark_sec"] / points[first]["spark_sec"], 2
        ),
        "oracle_growth": round(
            points[last]["oracle_sec"] / points[first]["oracle_sec"], 2
        ),
        "ratio_first": points[first]["ratio_raw"],
        "ratio_last": points[last]["ratio_raw"],
        "pairs_linear_check": {
            f"x{k}": points[f"x{k}"]["pairs_spark"] for k in ks
        },
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING_HIGHSIM.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps({k: out[k] for k in ("ratio_first", "ratio_last", "spark_growth", "oracle_growth")}))
    spark.stop()


if __name__ == "__main__":
    main()
