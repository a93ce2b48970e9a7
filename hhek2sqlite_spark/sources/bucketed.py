"""Bucketed (co-located) table layout: the shuffle-free fact-fact join.

The reference's 15 secondary indexes (SURVEY.md 4.3,
/root/reference/hhek2sqlite.go:428-452) encode the access paths the
consuming app needs. ``materialize_access_path`` (operators/util.py)
covers the *pruning* half of that — directory partitioning + row-group
sort. This module covers the *join* half: hash-bucketing both sides of a
recurring fact-fact join on the join key, so every subsequent join reads
co-located buckets and plans with ZERO Exchange on either side.

At 100 TB this is the difference between re-shuffling 100 TB per join
and reading pre-aligned files: lineitem joins orders by orderkey in
every reporting query, so the one-time bucketed write amortizes over
every downstream run. Bucket count is a layout constant (same for both
sides — Spark only elides the shuffle when bucket counts match and the
join keys equal the bucket keys).

Bucketed tables must be saved through the session catalog
(``saveAsTable`` — plain ``.parquet(path)`` writes no bucket metadata).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: Sequence[str],
    buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` hash-bucketed on ``bucket_cols`` (optionally
    sorted within buckets so merge-join reads need no sort). One shuffle
    now, zero on every future join/aggregation keyed on the bucket
    columns."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket keys. When both
    sides are bucketed identically, Catalyst's EnsureRequirements sees
    the required HashClusteredDistribution already satisfied by the scan
    and plans no Exchange (verify: explain('formatted') has zero
    Exchange nodes — asserted in tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
