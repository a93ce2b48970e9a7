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
  directory partitioning. The data is then repartitioned ON the
  partition columns plus a per-partition salt sized from that
  partition's estimated bytes — NOT round-robin. Round-robin +
  partitionBy makes every one of the n_files tasks write one file per
  partition value it holds (up to n_files x n_partitions tiny files —
  the opposite of compaction, round-5 advice); keying the shuffle on
  (partition cols, salt) means each Hive partition is written by
  exactly its own salt-count of tasks, honoring the size target per
  partition.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


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
    files of roughly ``target_file_mb``. Returns the planned file count
    (total of per-partition slot counts when ``partition_by`` is set;
    the shuffle routes each (partition, salt) slot by hash, so a hash
    collision can merge two slots into one task — actual files are
    <= the returned count, never more, and never the round-robin
    n_files x n_partitions explosion).
    Row-identical rewrite: no dedup, no reorder semantics promised
    (parquet carries no order)."""
    target_bytes = target_file_mb * 1024 * 1024
    total_bytes = dataset_bytes(in_path)
    df = spark.read.parquet(in_path)
    if not partition_by:
        n_files = max(1, math.ceil(total_bytes / target_bytes))
        df.repartition(n_files).write.mode("overwrite").parquet(out_path)
        return n_files

    # Per-partition sizing: row counts are the cheap per-partition
    # measure (one map-combined agg over the scan); scale rows -> bytes
    # with the dataset-wide bytes/row. The collect is control-plane —
    # one row per Hive partition VALUE, not per data row.
    per = df.groupBy(*partition_by).agg(F.count(F.lit(1)).alias("_rows")).collect()
    total_rows = sum(r["_rows"] for r in per)
    if total_rows == 0:
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(out_path)
        return 0
    bytes_per_row = total_bytes / total_rows
    slot_rows = [
        tuple(r[c] for c in partition_by)
        + (max(1, math.ceil(r["_rows"] * bytes_per_row / target_bytes)),)
        for r in per
    ]
    n_files = sum(r[-1] for r in slot_rows)
    slots = spark.createDataFrame(
        slot_rows, schema=df.select(*partition_by).schema.add("_nslots", "integer")
    )
    data_cols = [c for c in df.columns if c not in partition_by]
    # deterministic within-partition spread; pmod keeps 0 <= salt < nslots
    spread = F.hash(*data_cols) if data_cols else F.monotonically_increasing_id()
    # Null-safe join: NULL is a legal Hive partition value
    # (__HIVE_DEFAULT_PARTITION__) and groupBy above keeps it as a group,
    # but a plain equi-join would drop those rows (NULL != NULL) and break
    # the row-identical-rewrite contract. eqNullSafe per column, left join
    # + coalesce(_nslots, 1) so no row can ever be lost.
    cond = None
    for c in partition_by:
        e = df[c].eqNullSafe(slots[c])
        cond = e if cond is None else cond & e
    salted = (
        df.join(F.broadcast(slots), cond, "left")
        .drop(*[slots[c] for c in partition_by])
        .withColumn(
            "_salt", F.pmod(spread, F.coalesce(F.col("_nslots"), F.lit(1)))
        )
    )
    (
        salted.repartition(n_files, *partition_by, F.col("_salt"))
        .drop("_nslots", "_salt")
        .write.mode("overwrite")
        .partitionBy(*partition_by)
        .parquet(out_path)
    )
    return n_files
