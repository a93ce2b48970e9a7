"""Event-time windowing over the ``events`` table — batch first (the
driver's oracle can check it), Structured Streaming as the same logical
plan behind ``readStream`` (SURVEY.md 2.9: the reference is purely
batch; this is the engine's extension tier).

Window starts are emitted as epoch-second BIGINTs: integer bucket keys
hash-match any oracle engine and sidestep timestamp-rendering
differences. Money-style sums cast to decimal before aggregation as
everywhere else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hhek2sqlite_spark.sources.parquet import load_table

VALUE_DEC = "decimal(18,4)"
VALUE_SUM = "decimal(38,4)"


def _epoch(c) -> F.Column:
    return F.unix_timestamp(c)


def tumbling(events: DataFrame, *, width_sec: int = 3600) -> DataFrame:
    """Tumbling event-time windows: integer epoch bucketing — equivalent
    to window(ts, '1 hour') for aligned widths, one shuffle on
    (bucket, event_type)."""
    es = _epoch(F.col("ts"))
    bucket = (es - F.pmod(es, F.lit(width_sec))).alias("window_start")
    return (
        events.groupBy(bucket, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(VALUE_DEC)).cast(VALUE_SUM).alias("sum_value"),
        )
    )


def sliding(events: DataFrame, *, width_sec: int = 3600, slide_sec: int = 1800) -> DataFrame:
    """Sliding windows via explicit offset fan-out (width/slide windows
    per event — here 2), the set-based reading of window(ts, width,
    slide). Explode happens before the shuffle; no state, no UDF."""
    n_windows = width_sec // slide_sec
    es = _epoch(F.col("ts"))
    grid = es - F.pmod(es, F.lit(slide_sec))
    starts = F.array(*[grid - F.lit(i * slide_sec) for i in range(n_windows)])
    return (
        events.select(F.explode(starts).alias("window_start"), "event_type", "value")
        .groupBy("window_start", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(VALUE_DEC)).cast(VALUE_SUM).alias("sum_value"),
        )
    )


def user_activity(events: DataFrame) -> DataFrame:
    """Per-user behavioral profile: one shuffle on user_id."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        F.sum(F.col("value").cast(VALUE_DEC)).cast(VALUE_SUM).alias("total_value"),
        _epoch(F.max("ts")).alias("last_seen_epoch"),
    )


# ---------------------------------------------------------------------------
# Structured Streaming variant — same logical plan behind readStream.
# ---------------------------------------------------------------------------

def streaming_tumbling(
    spark: SparkSession,
    sf_dir: str,
    *,
    width: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """readStream -> watermark -> windowed agg. Watermark bounds state for
    late data; 'append' output emits a window once the watermark passes
    its end. Run with trigger(availableNow=True) to drain a static dir
    (how the tests exercise it)."""
    from hhek2sqlite_spark.sources.parquet import _normalize_events

    path = f"{sf_dir}/events.parquet"
    # schema from the raw file (ts arrives as a nanos LONG under
    # nanosAsLong); normalize to a real timestamp after readStream — the
    # projection works identically on streaming frames. readStream wants
    # a directory, so load the sf_dir with a glob for the events file.
    raw_schema = spark.read.parquet(path).schema
    raw = _normalize_events(
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return (
        raw.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(VALUE_DEC)).cast(VALUE_SUM).alias("sum_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
