"""Small-file compaction for parquet datasets.

Reference anchor: none — extension tier. A continuously-ingesting
100 TB pipeline accretes small files (per-trigger streaming commits,
per-batch appends); scan throughput then dies on open/footer overhead
and the NameNode/object-store listing. Compaction rewrites a dataset
into files of a target size. This is the maintenance operator every
lakehouse runs (Delta OPTIMIZE / Iceberg rewrite_data_files analog),
expressed with plain open APIs.

Design rules (100 TB):
- File count is computed from the dataset's actual on-disk bytes (via
  the input_file_name + file listing, no collect of data rows), so the
  target holds whatever the input skew.
- ``repartition(n)`` (round-robin) — not ``coalesce(n)`` — so output
  files are evenly sized even when input files are wildly skewed;
  coalesce would glue neighbors and preserve the skew. The price is one
  shuffle of the data being compacted, which a compaction job accepts
  (it IS the write amplification), and round-robin requires no key.
- Partitioned layouts: pass ``partition_by`` to keep Hive-style
  directory partitioning; files are then sized per partition by Spark's
  write path.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession


def dataset_bytes(path: str) -> int:
    """Total bytes of all data files under ``path`` (local FS walk; on a
    cluster this would ask the FileSystem API the same question)."""
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    *,
    target_file_mb: int = 256,
    partition_by: tuple[str, ...] = (),
) -> int:
    """Rewrite the parquet dataset at ``in_path`` to ``out_path`` with
    files of roughly ``target_file_mb``. Returns the file count used.
    Row-identical rewrite: no dedup, no reorder semantics promised
    (parquet carries no order)."""
    n_files = max(1, math.ceil(dataset_bytes(in_path) / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(in_path)
    writer = df.repartition(n_files).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(out_path)
    return n_files
