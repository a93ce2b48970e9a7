"""Product-analytics operators over the events stream: ordered funnel
conversion and weekly retention cohorts — the two queries every
event-warehouse user runs (the reference's Transaktioner date rollups,
`hhek2sqlite.go:462-500`, are the single-table ancestor of both).

Design rules (100 TB):
- Everything reduces per USER first (one keyed shuffle with map-side
  combine), then aggregates tiny per-user rows — the raw event stream
  is never joined against itself.
- All outputs are exact integers (user counts, integer week indexes
  from a fixed epoch) — oracle-pairable in any engine. Week indexes
  use day-difference DIV 7 from an explicit epoch date rather than
  WEEK()/strftime('%W') because week-of-year numbering is
  engine-defined (ISO vs US, year boundaries); integer day arithmetic
  is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def funnel_stages(
    events: DataFrame,
    *,
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered three-stage funnel: a user converts stage k only with an
    event of type ``stages[k]`` STRICTLY AFTER their stage-(k-1)
    conversion time (first-touch semantics: the earliest qualifying
    event per stage). Returns ONE row: total users and the user count
    reaching each stage.

    Plan shape: three stacked per-user window minima over the SAME
    partitioning (Catalyst plans one Exchange on user_id and chains the
    Window nodes without re-shuffling), then a per-user rollup and a
    global single-row aggregate over per-user rows. The event stream is
    scanned once and never self-joined — the textbook funnel as three
    EXISTS self-joins would scan it three times and risk O(n²) on hot
    users."""
    s1, s2, s3 = stages
    w = Window.partitionBy(user_col)
    t1 = F.min(F.when(F.col(type_col) == s1, F.col(ts_col))).over(w)
    staged = (
        events.select(user_col, type_col, ts_col)
        .withColumn("t1", t1)
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col(type_col) == s2) & (F.col(ts_col) > F.col("t1")),
                    F.col(ts_col),
                )
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col(type_col) == s3) & (F.col(ts_col) > F.col("t2")),
                    F.col(ts_col),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy(user_col).agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("long").alias("users_total"),
        F.count("t1").cast("long").alias(f"users_{s1}"),
        F.count("t2").cast("long").alias(f"users_{s2}"),
        F.count("t3").cast("long").alias(f"users_{s3}"),
    )


FUNNEL_EPOCH = "2024-01-01"


def retention_cohorts(
    events: DataFrame,
    *,
    epoch: str = FUNNEL_EPOCH,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention triangle: users are cohorted by the week of
    their FIRST event (integer week index = days-since-``epoch`` DIV 7)
    and counted once per (cohort_week, activity_week) they appear in.
    ``week_offset`` = activity_week - cohort_week, so offset 0 is the
    cohort's own size and the retention curve reads along ascending
    offsets.

    Plan shape: per-user first-event minimum (one map-side-combined
    shuffle), distinct (user, activity_week) on its pair key, one
    broadcast-scale join of per-user cohorts back onto the pair
    relation, then a cohort-key rollup. Week arithmetic is pure integer
    day math — see the module docstring for why WEEK() is banned."""
    day = F.datediff(F.to_date(ts_col), F.to_date(F.lit(epoch)))
    week = F.floor(day / 7).cast("int")
    cohorts = (
        events.select(user_col, week.alias("w"))
        .groupBy(user_col)
        .agg(F.min("w").alias("cohort_week"))
    )
    activity = events.select(user_col, week.alias("activity_week")).distinct()
    return (
        activity.join(cohorts, user_col)
        .groupBy("cohort_week", "activity_week")
        .agg(F.count(F.lit(1)).cast("long").alias("active_users"))
        .select(
            "cohort_week",
            "activity_week",
            (F.col("activity_week") - F.col("cohort_week"))
            .cast("int")
            .alias("week_offset"),
            "active_users",
        )
    )
