"""Gap-based sessionization: group each user's events into sessions
separated by >= ``gap`` of inactivity.

Batch implementation is the standard two-window plan: lag() marks
session starts, a running sum over the marks numbers the sessions, then
one aggregation per (user, session). Both windows and the final groupBy
share the same partitioning key (user), so the whole thing is ONE
shuffle — Catalyst reuses the exchange. This is also exactly expressible
in ANSI SQL, which makes it oracle-checkable; the streaming counterpart
(streaming/sessions.py) uses applyInPandasWithState and is checked
against this batch plan on the same input.

Timestamps are emitted as epoch microseconds (BIGINT) so results
hash-match across engines regardless of timestamp binary layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

VALUE_SUM = "decimal(38,4)"


def sessionize(
    events: DataFrame,
    *,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """One row per (user, session): session_seq (1-based per user),
    session_start_us / session_end_us epoch-micros bounds, n_events, and
    the exact-decimal value total. ``id_col`` breaks ordering ties so the
    session numbering is deterministic."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    us = F.unix_micros(F.col(ts_col))
    new_session = (
        F.when(us - F.unix_micros(F.lag(ts_col).over(w)) > gap_us, 1)
        .otherwise(0)
    )
    # first event of a user: lag is NULL -> when() falls to otherwise(0);
    # starting the running sum at 0 makes session_seq 0-based, so add 1
    numbered = events.withColumn(
        "session_seq",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        + 1,
    )
    return (
        numbered.groupBy(user_col, "session_seq")
        .agg(
            F.min(us).alias("session_start_us"),
            F.max(us).alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,4)"))
            .cast(VALUE_SUM)
            .alias("total_value"),
        )
    )
