#!/usr/bin/env python
"""Rewrite the fixture in the layout a cluster actually scans.

The driver fixture stores every table as ONE parquet file with ONE row
group, so every Spark scan pipeline runs as ONE task no matter how many
cores exist, while DuckDB parallelizes inside the row group x32 — the
structural reason PERF_FLOOR.json's local ratios exceed cluster ratios
(BASELINE.md). This script converts that claim from plan-audit argument
to measurement: it rewrites each table as a DIRECTORY of part files —
one per core for any table big enough to split — with row_group_size
capped inside each part, i.e. the >= cores-splits layout every table
has on a 1000-executor cluster reading 100 TB.

Why part FILES and not just more row groups: Spark's scan-parallelism
unit is the file split (spark.sql.files.maxPartitionBytes over byte
ranges); a 2 MB single file is one split — and therefore one task —
regardless of its row-group count. Multiple row groups per part are
still written so DuckDB keeps its intra-file parallelism: BOTH engines
get parallel scans, the comparison stays symmetric.

Run the floor against it with scan tuning matched to the small-file
layout (at real scale files are ~128 MB and the defaults are right;
locally a 60 KB part would otherwise be packed 32-to-a-task by
openCostInBytes):

    python scripts/make_multirg.py
    SPARK_GRAFT_SF_DIR=testdata_multirg/sf0.1 \\
    SPARK_GRAFT_SPREAD=0 \\
    SPARK_GRAFT_EXTRA_CONF="spark.sql.files.maxPartitionBytes=1048576,spark.sql.files.openCostInBytes=16384" \\
    SPARK_GRAFT_PERF_OUT=PERF_FLOOR_multirg.json \\
    python scripts/perf_floor.py

SPARK_GRAFT_SPREAD=0 disables the spread() pre-shuffle: its whole
purpose is to simulate this layout on the single-split fixture, and
paying it here would double-count.
"""

from __future__ import annotations

import math
import os
import sys

import pyarrow.parquet as pq

N_PARTS_MAX = int(os.environ.get("SPARK_GRAFT_MULTIRG_PARTS", "32"))
MIN_ROWS_PER_PART = 150  # below this a table stays single-file
ROW_GROUP_ROWS = 20_000


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "testdata_multirg",
            os.path.basename(src.rstrip("/")),
        )
    )
    os.makedirs(dst, exist_ok=True)
    for fname in sorted(os.listdir(src)):
        if not fname.endswith(".parquet"):
            continue
        table = pq.read_table(os.path.join(src, fname))
        n = table.num_rows
        parts = max(1, min(N_PARTS_MAX, n // MIN_ROWS_PER_PART))
        out_dir = os.path.join(dst, fname)  # directory named <t>.parquet
        os.makedirs(out_dir, exist_ok=True)
        per = math.ceil(n / parts)
        for i in range(parts):
            chunk = table.slice(i * per, per)
            if chunk.num_rows == 0:
                continue
            pq.write_table(
                chunk,
                os.path.join(out_dir, f"part-{i:05d}.parquet"),
                row_group_size=min(ROW_GROUP_ROWS, max(1, per)),
            )
        print(f"{fname}: {n} rows -> {parts} parts x ~{per} rows")


if __name__ == "__main__":
    main()
