"""Stream-stream interval join: purchases matched to the same user's
signups within a bounded event-time window — the stateful two-stream
shape (attribution / conversion matching), completing the streaming
tier next to windows (events.py), stateful sessions (sessions.py),
dedup (dedup.py) and the stream-static enrichment (enrich.py).

State story (the part that matters at scale): BOTH sides carry a
watermark and the join predicate bounds purchase.ts to
[signup.ts, signup.ts + horizon], so Spark can expel a buffered signup
once the watermark passes signup.ts + horizon and a buffered purchase
once it can no longer match any future signup — state is
watermark-bounded on both sides, not grow-forever. An unbounded
equi-join on user_id alone would accumulate every row seen.

Both streams here read the same events fixture filtered by type; in
production they would be two sources.

Join modes:

- ``how="inner"`` (default): a purchase with no qualifying signup is
  dropped. Exact under a single availableNow drain — matched rows never
  depend on watermark progression.
- ``how="left_outer"``: a purchase with no qualifying signup emits ONCE
  with null signup columns — but only when the watermark passes
  purchase_ts + horizon (Spark can then prove no future signup can
  match it; emitting earlier could produce a retracted row). Null rows
  therefore require the watermark to ADVANCE past the expiry point,
  which a one-batch drain of a static fixture never does: the test
  protocol feeds multiple files with ``max_files_per_trigger=1`` so
  later files (far-future heartbeat events on both sides) push the
  watermark forward and flush the expired left rows
  (tests/test_extensions.py::test_stream_stream_left_outer_drain).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _interval_cond(horizon_hours: int) -> Column:
    return (
        (F.col("p_user_id") == F.col("s_user_id"))
        & (F.col("purchase_ts") >= F.col("signup_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("signup_ts") + F.expr(f"INTERVAL {horizon_hours} HOURS")
        )
    )


def _select_attrib(joined: DataFrame) -> DataFrame:
    return joined.select(
        F.col("purchase_event_id").alias("purchase_id"),
        F.col("signup_event_id").alias("signup_id"),
        F.col("p_user_id").alias("user_id"),
        F.unix_micros("purchase_ts").alias("purchase_us"),
        F.unix_micros("signup_ts").alias("signup_us"),
        "purchase_value",
    )


def _split_sides(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    signups = events.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_user_id"),
        F.col("ts").alias("signup_ts"),
        F.col("event_id").alias("signup_event_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
    )
    return purchases, signups


def streaming_purchase_attribution(
    spark: SparkSession,
    sf_dir: str,
    *,
    horizon_hours: int = 72,
    watermark: str = "0 seconds",
    how: str = "inner",
    events_glob: str | None = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Purchases attributed to a same-user signup within ``horizon_hours``.

    ``sf_dir`` is a directory of event parquet files; ``events_glob``
    narrows it to the fixture's events table (pass ``None`` to stream
    every file — the multi-file drain protocol). ``max_files_per_trigger``
    caps files per micro-batch so an availableNow drain runs one batch
    per file, letting the watermark advance between files.
    """
    from hhek2sqlite_spark.sources.parquet import _normalize_events

    sample = spark.read
    if events_glob is not None:
        sample = sample.option("pathGlobFilter", events_glob)
    raw_schema = sample.parquet(sf_dir).schema

    def stream() -> DataFrame:
        reader = spark.readStream.schema(raw_schema).format("parquet")
        if events_glob is not None:
            reader = reader.option("pathGlobFilter", events_glob)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        return _normalize_events(reader.load(sf_dir))

    purchases, signups = _split_sides(stream())
    purchases = purchases.withWatermark("purchase_ts", watermark)
    signups = signups.withWatermark("signup_ts", watermark)
    return _select_attrib(
        purchases.join(signups, _interval_cond(horizon_hours), how)
    )


def batch_purchase_attribution(
    events: DataFrame, *, horizon_hours: int = 72, how: str = "inner"
) -> DataFrame:
    """Batch twin of the stream-stream join (the parity oracle for the
    availableNow drain). For ``how="left_outer"`` it is the FULL-DRAIN
    oracle: the streaming form only reaches it once the watermark has
    passed every purchase's expiry — the multi-file drain test restricts
    the comparison to rows the final watermark has flushed."""
    purchases, signups = _split_sides(events)
    return _select_attrib(
        purchases.join(signups, _interval_cond(horizon_hours), how)
    )
