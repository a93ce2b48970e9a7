"""Stream-static enrichment join: the streaming counterpart of the
dimension joins in ``plans/`` (J2 Trans⋈Personer-style lookups,
/root/reference/hhek2sqlite.go:428-452's by-account access paths).

A parquet ``readStream`` over the events fixture joins the CUSTOMER
dimension as a static DataFrame. Structured Streaming re-plans the
static side per micro-batch, so at cluster scale the dimension is
broadcast to every batch (same hint as the batch tier) and a slowly
changing dimension is picked up on refresh without restarting the
stream. No watermark is needed: a stream-static inner join is
stateless — each event row joins the current dimension snapshot and is
emitted immediately (state only appears in stream-STREAM joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_enriched_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hhek2sqlite_spark.sources.parquet import _normalize_events, load_table

    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = _normalize_events(
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        "c_mktsegment",
        "c_nationkey",
    )
    return (
        raw.select("event_id", "user_id", "ts", "event_type", "value")
        .join(F.broadcast(dim), "user_id")
        .select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("ts_us"),
            "event_type",
            "value",
            "c_mktsegment",
            "c_nationkey",
        )
    )
