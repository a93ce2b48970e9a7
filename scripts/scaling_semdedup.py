#!/usr/bin/env python
"""Dedicated scaling curve for ``semantic_dedup`` (VERDICT r13 #2 asked
for a SCALING point with the new operator) — writes SCALING_SEMDEDUP.json.

Why not scripts/scaling_curve.py's make_scaled series: the
replicate-and-shift embeddings are methodologically broken for this
query, the same two ways scaling_highsim.py documents for
similarity_lsh_highsim — (1) +c*1e-4 perturbed copies sit at cosine
~0.9999 > tau, so true dups grow K^2 (replication artifact, not
engine); (2) the c*10^7 key shift collides with the query's own
_NEARDUP_COPY_OFFSET injection AND defeats the vec_id < 10^7 seed
fence, collapsing every copy into copy-0's fixed 32 cells (cell
population x K -> quadratic pair work).

This series reuses scaling_highsim's sign-flip construction (copy c
multiplies every embedding by an independent-PCG64 Rademacher pattern:
within-copy inner products preserved, cross-copy cosines ~N(0, 1/dim))
but with CONTIGUOUS vec_ids (copy c gets ids c*N .. c*N+N-1) so the
registry query and its oracle run VERBATIM:

- max corpus id at x64 is 128,000 << the 10^7 injection offset, so
  injected ids collide with nothing and the seed fence excludes
  exactly the injected copies;
- ids stay divisible by 10 at the same rate, so the 10%% injection is
  exact per copy;
- seeds (id %% 64 == 0) land ~31 per copy — the cell count GROWS
  LINEARLY with the corpus, per-cell population stays ~stride, and
  every copy's cells quantize that copy's (isometric) geometry
  exactly as x1's do. True dups per scale ~ K * (dups at x1); the
  artifact records the found-dup counts as the linearity check.

Usage: python scripts/scaling_semdedup.py [K ...]   (default: 1 4 16)
Builds testdata_scaled_semdedup/x{K}/embeddings.parquet from
/root/testdata/sf0.1/embeddings.parquet, measures QUERIES[name] vs
ORACLE_SQL[name] (median of 3, 1 warm rep, scaling_curve protocol),
writes SCALING_SEMDEDUP.json at the repo root.

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

NAME = "semantic_dedup"
SRC = "/root/testdata/sf0.1/embeddings.parquet"
DST_ROOT = "testdata_scaled_semdedup"
N_PARTS = 8
REPS = 3
SLOW_CUTOFF_SEC = 15.0

# Bump when the series CONSTRUCTION changes (_signs recipe, id layout,
# partitioning): the _done marker embeds this + the SRC content hash, so
# a stale marker can never silently pin old fixtures to new code
# (ADVICE r14: committed markers made build_series skip regeneration
# forever even if SRC or the construction changed).
GEN_VERSION = 1


def _marker_payload() -> str:
    import hashlib

    h = hashlib.md5()
    with open(SRC, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return json.dumps({"src_md5": h.hexdigest(), "gen_version": GEN_VERSION})


def _signs(dim: int, c: int) -> np.ndarray:
    # independent per-copy PCG64 streams (scaling_highsim.py records why
    # an affine hash is NOT enough: near-identical cross-copy patterns
    # produced cosine ~0.97 collisions and superlinear pair counts)
    rng = np.random.default_rng(987654321 + c)
    return (rng.integers(0, 2, size=dim).astype(np.float32) * 2.0) - 1.0


def build_series(ks: list[int]) -> dict[str, str]:
    payload = _marker_payload()
    tbl = pq.read_table(SRC)
    vecs = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float32)
    labels = tbl.column("label").to_numpy()
    n, dim = vecs.shape
    dirs = {}
    for k in ks:
        label = f"x{k}"
        parts_dir = os.path.join(DST_ROOT, label, "embeddings.parquet")
        os.makedirs(parts_dir, exist_ok=True)
        marker = os.path.join(parts_dir, "_done")
        # skip only when the marker matches the CURRENT source content
        # hash and construction version — anything else regenerates
        if os.path.exists(marker) and open(marker).read() == payload:
            dirs[label] = os.path.join(DST_ROOT, label)
            continue
        for old in os.listdir(parts_dir):
            os.unlink(os.path.join(parts_dir, old))
        # CONTIGUOUS ids: copy c occupies [c*n, c*n + n)
        all_ids = np.concatenate(
            [np.arange(n, dtype=np.int64) + c * n for c in range(k)]
        )
        all_vecs = np.concatenate(
            [vecs if c == 0 else vecs * _signs(dim, c)[None, :] for c in range(k)]
        )
        all_labels = np.concatenate([labels] * k)
        bounds = np.linspace(0, len(all_ids), N_PARTS + 1, dtype=int)
        for p in range(N_PARTS):
            sl = slice(bounds[p], bounds[p + 1])
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
        with open(marker, "w") as f:
            f.write(payload)
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
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    dirs = build_series(ks)
    spark = get_spark("hhek2sqlite_spark-scaling-semdedup")
    spark.sparkContext.setLogLevel("ERROR")
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
        dups_oracle = con.execute(
            f"SELECT count(*) FROM ({sql}) WHERE kept = 0"
        ).fetchone()[0]
        out_df = fn(spark, d)
        dups_spark = out_df.filter("kept = 0").count()
        spark_sec = _measure(
            lambda: fn(spark, d).write.format("noop").mode("overwrite").save()
        )
        oracle_sec = _measure(lambda: con.execute(sql).fetchall())
        con.close()
        points[label] = {
            "spark_sec": round(spark_sec, 4),
            "oracle_sec": round(oracle_sec, 4),
            "ratio_raw": round(spark_sec / oracle_sec, 2),
            "dups_spark": dups_spark,
            "dups_oracle": dups_oracle,
        }
        print(f"{label}: {points[label]}", file=sys.stderr)
    first, last = f"x{ks[0]}", f"x{ks[-1]}"
    out = {
        "query": NAME,
        "protocol": {
            "reps": REPS,
            "stat": "median",
            "warm_runs": 1,
            "series": "sign-flip copies, contiguous ids (see docstring)",
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
        "dups_linear_check": {
            f"x{k}": points[f"x{k}"]["dups_spark"] for k in ks
        },
    }
    out_path = os.environ.get("SPARK_GRAFT_SEMDEDUP_OUT") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING_SEMDEDUP.json",
    )
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
