"""Streaming exact dedup: exactly-once-shaped ingest over at-least-once
sources.

The batch tier's exact dedup (operators/dedup.py) is a groupBy over the
whole corpus; a stream cannot hold "the whole corpus" as state. The
scalable streaming form is ``dropDuplicatesWithinWatermark``: keyed
state holds only ids seen inside the watermark horizon, and the
watermark both bounds state size and defines the dedup guarantee
(re-deliveries arriving within the horizon are dropped; later ones are
by contract out of scope — the same contract Kafka/Kinesis ingest
pipelines state). State per key is just the id + one timestamp, so at
100 TB/day the state store holds horizon-hours of ids, not the corpus.

The reference is purely batch (SURVEY.md 2.9); this module is the
extension tier's streaming half of the dedup family, same split as
streaming/events.py vs the batch window operators.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def streaming_dedup(
    spark: SparkSession,
    source_dir: str,
    *,
    id_cols: Sequence[str] = ("event_id",),
    event_time_col: str = "ts",
    watermark: str = "2 hours",
    path_glob: str | None = None,
) -> DataFrame:
    """readStream(parquet dir) -> watermark -> drop duplicate ids within
    the watermark horizon. Schema is taken from a batch read of the same
    directory (streaming parquet requires an explicit schema — inference
    would scan the dir on the driver every trigger)."""
    batch = spark.read.parquet(source_dir)
    reader = spark.readStream.schema(batch.schema).format("parquet")
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    raw = reader.load(source_dir)
    return raw.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        list(id_cols)
    )
