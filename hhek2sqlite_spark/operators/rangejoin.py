"""Bucketized interval join: points joined to the intervals containing
them, without a range-predicate cross join.

Spark plans a bare ``ts BETWEEN start AND end`` join (with equi keys
absent or low-cardinality) as BroadcastNestedLoop/Cartesian — quadratic.
The classic fix, used here: quantize time into fixed buckets; each
interval EXPLODES to every bucket it covers, each point has exactly ONE
bucket, and the join becomes an equi-join on (keys..., bucket) followed
by the exact range verify. A (point, interval) pair can only meet in the
point's single bucket, so no dedup pass is needed.

Bucket sizing: cost is sum(interval_len / bucket) join rows on the
interval side vs bucket-collision fan-in on the point side — pick the
bucket near the median interval length; gap-session intervals here are
minutes-to-hours, so 1h default.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    on: Sequence[str] = (),
    point_ts_us: str,
    start_us: str,
    end_us: str,
    bucket_us: int = 3_600_000_000,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to interval rows with the same ``on`` keys and
    ``start_us <= point_ts_us <= end_us`` (epoch-micros columns). Result
    carries all columns of both sides (alias collisions must be resolved
    by the caller first)."""
    on = list(on)
    p = points.withColumn("_bucket", F.floor(F.col(point_ts_us) / bucket_us))
    i = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_us) / bucket_us),
                F.floor(F.col(end_us) / bucket_us),
            )
        ),
    )
    cond = (F.col(point_ts_us) >= F.col(start_us)) & (
        F.col(point_ts_us) <= F.col(end_us)
    )
    return p.join(i, on + ["_bucket"], how).filter(cond).drop("_bucket")
