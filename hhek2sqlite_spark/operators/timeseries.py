"""Time-series resampling: per-key daily rollup onto a dense date grid
with gap rows filled by last-observation-carried-forward (LOCF) — the
hypertable `time_bucket_gapfill + locf` shape (the brief's named
example of an operator Spark lacks natively, built here from
composition).

Design rules (100 TB):
- The value carried across the pipeline is an INTEGER quantized sum
  (floor(value*1000)), so every aggregate is exact in any engine and
  the whole operator is oracle-pairable.
- LOCF avoids engine-specific `IGNORE NULLS` window modes (absent or
  differently-spelled across engines) via the portable gaps-and-islands
  form: a running count of non-null observations assigns each gap row
  to its predecessor's island, then one max per island fills the value.
- Shuffle shape: one shuffle on (key, day) for the rollup, one on the
  key for span + grid + both windows — the island window partitions by
  (key, island) but HashPartitioning(key) already satisfies that
  clustering, so no third Exchange appears (plan-contract-tested).
- The grid explode is bounded by each key's own [min_day, max_day]
  span, never a global calendar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def daily_ohlc(
    events: DataFrame,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    quant: int = 1000,
) -> DataFrame:
    """Downsample to daily OHLC bars (open/high/low/close + count) per
    key — the metrics/candlestick compaction step. Open/close are
    picked by row_number over the deterministic (ts, id) order — not
    by arg_min/arg_max, whose tie behavior differs across engines —
    and all values are integer-quantized, so the bars are
    oracle-exact. One shuffle on (key, day) serves both windows (asc
    and desc share the partitioning; the second order is a sort, not
    an Exchange) and the final aggregation."""
    staged = events.select(
        F.col(key_col),
        F.to_date(ts_col).alias("day"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        F.floor(F.col(value_col) * quant).cast("long").alias("_q"),
    )
    w_asc = Window.partitionBy(key_col, "day").orderBy(
        F.col("_ts").asc(), F.col("_id").asc()
    )
    w_desc = Window.partitionBy(key_col, "day").orderBy(
        F.col("_ts").desc(), F.col("_id").desc()
    )
    marked = staged.withColumn("_ra", F.row_number().over(w_asc)).withColumn(
        "_rd", F.row_number().over(w_desc)
    )
    return marked.groupBy(key_col, "day").agg(
        F.max(F.when(F.col("_ra") == 1, F.col("_q"))).alias("open_q"),
        F.max("_q").alias("high_q"),
        F.min("_q").alias("low_q"),
        F.max(F.when(F.col("_rd") == 1, F.col("_q"))).alias("close_q"),
        F.count(F.lit(1)).alias("n_events"),
    )


def daily_gapfill_locf(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    quant: int = 1000,
) -> DataFrame:
    """Returns (key, day, n_events, sum_q_filled, is_gap): one row per
    key per day in the key's own observed span; days with no events
    carry the previous day's quantized sum and is_gap = true."""
    daily = events.groupBy(
        F.col(key_col), F.to_date(ts_col).alias("day")
    ).agg(
        F.sum(F.floor(F.col(value_col) * quant).cast("long")).alias("_sq"),
        F.count(F.lit(1)).alias("_n"),
    )
    span = daily.groupBy(key_col).agg(
        F.min("day").alias("_d0"), F.max("day").alias("_d1")
    )
    grid = span.select(
        key_col, F.explode(F.sequence("_d0", "_d1")).alias("day")
    )
    j = grid.join(daily, [key_col, "day"], "left")
    w_run = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = j.withColumn("_island", F.count("_sq").over(w_run))
    filled = marked.withColumn(
        "sum_q_filled", F.max("_sq").over(Window.partitionBy(key_col, "_island"))
    )
    return filled.select(
        key_col,
        "day",
        F.coalesce("_n", F.lit(0).cast("long")).alias("n_events"),
        "sum_q_filled",
        F.col("_sq").isNull().alias("is_gap"),
    )
