#!/usr/bin/env python
"""Replicate-and-shift scale-up of the sf0.1 fixture — the scaling-curve
input for scripts/scaling_curve.py.

PERF_FLOOR_multirg.json settled the layout question but left the SCALE
question open: at 17 MB every Spark query is floor-bound (fixed
per-stage scheduling dominates the data path), so single-point ratios
against DuckDB say nothing about 100 TB behavior. The testable claim is
the TREND: as data grows with fixed query plans, Spark's wall-clock
should grow sublinearly (fixed costs amortize) while a single-node
engine grows ~linearly once it saturates its cores. This script builds
the fixture series for that measurement.

Construction (copy c of K, c=0 is the original):

- ``region``/``nation`` stay single-copy (dimensions: fixed size at any
  scale, exactly like real TPC-H).
- Fact/entity keys shift by ``c * 10**7`` consistently across tables
  (o_custkey with c_custkey, l_orderkey with o_orderkey, events.user_id
  with c_custkey, ...) so referential integrity and join fan-outs are
  PRESERVED, not multiplied: every query's per-row work scales linearly
  in K.
- ``documents.text`` gets a per-copy suffix (" c01", " c02", ...): the
  copies become NEAR-duplicates, not exact duplicates — dedup and LSH
  workloads see realistic near-dup clusters of size K instead of a
  degenerate all-identical corpus. The contamination eval set (doc_id <
  50) stays copy-0 only, like a real benchmark suite that does not grow
  with the corpus.
- ``embeddings.embedding`` gets a deterministic tiny per-copy
  perturbation (+c * 1e-4 on one coordinate, different coordinate per
  copy) for the same reason in vector space.

Output: multirg layout (directories of ~32 part files per table,
row_group_size<=20k) so both engines scan in parallel — the layout
PERF_FLOOR_multirg.json established as the symmetric comparison.

Usage: python scripts/make_scaled.py K [src] [dst]
   eg: python scripts/make_scaled.py 4   # -> testdata_scaled/x4
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SHIFT = 10**7
N_PARTS = 32
ROW_GROUP_ROWS = 20_000

KEY_SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SINGLE_COPY = {"region", "nation"}


def shifted_copy(name: str, table: pa.Table, c: int) -> pa.Table:
    if c == 0:
        return table
    cols = {}
    for field in table.schema:
        arr = table.column(field.name)
        if field.name in KEY_SHIFTS.get(name, []):
            np_arr = arr.to_numpy(zero_copy_only=False) + c * SHIFT
            cols[field.name] = pa.array(np_arr, type=field.type)
        elif name == "documents" and field.name == "text":
            suffix = f" c{c:02d}"
            cols[field.name] = pa.array(
                [t + suffix for t in arr.to_pylist()], type=field.type
            )
        elif name == "documents" and field.name == "n_chars":
            np_arr = arr.to_numpy(zero_copy_only=False) + 4  # len(" cNN")
            cols[field.name] = pa.array(np_arr, type=field.type)
        elif name == "embeddings" and field.name == "embedding":
            vecs = [np.asarray(v, dtype=np.float32) for v in arr.to_pylist()]
            dim = len(vecs[0]) if vecs else 1
            coord = c % dim
            for v in vecs:
                v[coord] += c * 1e-4
            cols[field.name] = pa.array([v.tolist() for v in vecs], type=field.type)
        else:
            cols[field.name] = arr
    return pa.table(cols, schema=table.schema)


def write_multirg(table: pa.Table, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    n = table.num_rows
    parts = max(1, min(N_PARTS, n // 150))
    per = math.ceil(n / parts)
    for i in range(parts):
        chunk = table.slice(i * per, per)
        if chunk.num_rows:
            pq.write_table(
                chunk,
                os.path.join(out_dir, f"part-{i:05d}.parquet"),
                row_group_size=min(ROW_GROUP_ROWS, max(1, per)),
            )


def main() -> None:
    k = int(sys.argv[1])
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "testdata_scaled",
            f"x{k}",
        )
    )
    for fname in sorted(os.listdir(src)):
        if not fname.endswith(".parquet"):
            continue
        name = fname[: -len(".parquet")]
        base = pq.read_table(os.path.join(src, fname))
        if name in SINGLE_COPY:
            out = base
        else:
            out = pa.concat_tables([shifted_copy(name, base, c) for c in range(k)])
        write_multirg(out, os.path.join(dst, fname))
        print(f"{fname}: {base.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
