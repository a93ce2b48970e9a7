"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, enabled: bool = True) -> DataFrame:
    """One cheap round-robin shuffle of the raw rows so CPU-heavy map
    stages are not glued to the scan's split count (a single-row-group
    parquet file scans as ONE task no matter how many cores exist). At
    cluster scale the input already has >= cores splits — pass
    enabled=False and this is a no-op."""
    if not enabled:
        return df
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)
