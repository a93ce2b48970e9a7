"""As-of join: for each left row, the latest right row with the same key
and right_ts <= left_ts (inclusive).

Spark has no native as-of join; the classic implementations are a range
join (quadratic blowup per key) or a per-key mapPartitions merge. This
one is a *union + single window pass*: tag both sides, sort each key's
rows once by (ts, side) with right rows winning ties, and carry the last
non-null right payload forward. One shuffle on the key, O(n log n) per
key for the sort, no range explosion — the same plan shape survives a
1000-executor scale-up because the window partitions by the join key.

Skew note: a hot key serializes into one task; pre-filter obviously-dead
right rows (e.g. older than the left side's min ts) or split hot keys by
time range if a key's row count exceeds task memory.

DuckDB's native ASOF JOIN (ON l.key = r.key AND l.ts >= r.ts) has
identical semantics and serves as the oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str],
    matched_ts_col: str = "matched_ts",
) -> DataFrame:
    """Left as-of join. Keeps every left column, adds ``matched_ts_col``
    (the matched right row's timestamp) and each of ``value_cols`` from
    the matched right row; all added columns are NULL when no right row
    precedes the left row (left-outer semantics).

    ``value_cols`` must not collide with left column names — alias on the
    right DataFrame first if they do.
    """
    on = list(on)
    left_payload = [c for c in left.columns if c not in on and c != left_ts]
    overlap = set(value_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"value_cols collide with left columns: {sorted(overlap)}")

    # The whole matched right row travels as ONE struct through a single
    # last(ignorenulls=True): per-column carries would skip a legitimately
    # NULL payload column and mix values from different right rows
    # (DuckDB/pandas ASOF semantics return the matched row's NULL). The
    # struct itself is non-null for every right row, so ignorenulls only
    # skips left rows.
    from pyspark.sql.types import StructField, StructType

    carry_type = StructType(
        [StructField(matched_ts_col, right.schema[right_ts].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        *left_payload,
        F.lit(None).cast(carry_type).alias("_carry"),
        F.lit(1).alias("_side"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        F.struct(
            F.col(right_ts).alias(matched_ts_col),
            *[F.col(c) for c in value_cols],
        ).alias("_carry"),
        F.lit(0).alias("_side"),
    )
    # right rows sort before left rows at equal ts (_side 0 < 1), so a
    # right row AT the left row's timestamp matches (inclusive as-of)
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        *on,
        "_ts",
        "_side",
        *left_payload,
        F.last("_carry", ignorenulls=True).over(w).alias("_carry"),
    )
    return (
        carried.filter(F.col("_side") == 1)
        .select(
            *on,
            F.col("_ts").alias(left_ts),
            *left_payload,
            *[F.col(f"_carry.{c}").alias(c) for c in value_cols],
            F.col(f"_carry.{matched_ts_col}").alias(matched_ts_col),
        )
    )
