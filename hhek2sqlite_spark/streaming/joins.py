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
production they would be two sources. The join is INNER: a purchase
with no qualifying signup is dropped (left-outer stream-stream joins
emit nulls only at watermark expiry, which an availableNow drain of a
static fixture never reaches for the tail — the inner form keeps the
batch-parity test exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_purchase_attribution(
    spark: SparkSession,
    sf_dir: str,
    *,
    horizon_hours: int = 72,
    watermark: str = "0 seconds",
) -> DataFrame:
    from hhek2sqlite_spark.sources.parquet import _normalize_events

    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def stream() -> DataFrame:
        return _normalize_events(
            spark.readStream.schema(raw_schema)
            .format("parquet")
            .option("pathGlobFilter", "events.parquet")
            .load(sf_dir)
        )

    signups = (
        stream()
        .filter(F.col("event_type") == "signup")
        .select(
            F.col("user_id").alias("s_user_id"),
            F.col("ts").alias("signup_ts"),
            F.col("event_id").alias("signup_event_id"),
        )
        .withWatermark("signup_ts", watermark)
    )
    purchases = (
        stream()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_event_id"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    joined = purchases.join(
        signups,
        (F.col("p_user_id") == F.col("s_user_id"))
        & (F.col("purchase_ts") >= F.col("signup_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("signup_ts") + F.expr(f"INTERVAL {horizon_hours} HOURS")
        ),
    )
    return joined.select(
        F.col("purchase_event_id").alias("purchase_id"),
        F.col("signup_event_id").alias("signup_id"),
        F.col("p_user_id").alias("user_id"),
        F.unix_micros("purchase_ts").alias("purchase_us"),
        F.unix_micros("signup_ts").alias("signup_us"),
        "purchase_value",
    )


def batch_purchase_attribution(
    events: DataFrame, *, horizon_hours: int = 72
) -> DataFrame:
    """Batch twin of the stream-stream join (the parity oracle for the
    availableNow drain)."""
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
    return (
        purchases.join(
            signups,
            (F.col("p_user_id") == F.col("s_user_id"))
            & (F.col("purchase_ts") >= F.col("signup_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("signup_ts") + F.expr(f"INTERVAL {horizon_hours} HOURS")
            ),
        )
        .select(
            F.col("purchase_event_id").alias("purchase_id"),
            F.col("signup_event_id").alias("signup_id"),
            F.col("p_user_id").alias("user_id"),
            F.unix_micros("purchase_ts").alias("purchase_us"),
            F.unix_micros("signup_ts").alias("signup_us"),
            "purchase_value",
        )
    )
