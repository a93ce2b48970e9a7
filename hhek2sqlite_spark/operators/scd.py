"""Slowly-changing-dimension type-2 history construction.

Reference anchor: none — extension tier. The reference
(/root/reference/hhek2sqlite.go) copies dimension snapshots verbatim;
a warehouse feeding a 100 TB pipeline instead keeps versioned history
for its dimensions (customer segment changes, supplier region moves) so
facts can join the attribute AS OF their event time. SCD2 is that
history: one row per (key, version) with [valid_from, valid_to).

Design rules (100 TB):
- One union + two window passes over a single hash Exchange on the key
  (lag for change-collapse, lead for interval close) — no self-joins,
  no driver-side state, scales with the dimension not the fact table.
- Change detection compares each update against the immediately
  preceding raw row: rows equal to their predecessor are no-ops and
  collapse away (correct because a dropped row never changed the
  running state). Deterministic tiebreak (eff, attr) for same-day
  updates.
- NULL attribute values are first-class: the comparison is null-safe
  (``eqNullSafe`` / SQL ``IS DISTINCT FROM``) and first-row detection
  uses an explicit row_number marker, so a change TO NULL opens a
  version and a non-null value AFTER a NULL is a real change — a plain
  ``_prev != attr`` filter silently drops both (round-5 advice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

END_OF_TIME = "9999-12-31"


def scd2_merge(
    base: DataFrame,
    updates: DataFrame,
    *,
    key: str,
    attr: str,
    base_from: str,
    end_of_time: str = END_OF_TIME,
) -> DataFrame:
    """Build the type-2 history for one tracked attribute.

    ``base``: current snapshot, one row per ``key`` (attr value as of
    ``base_from``). ``updates``: (key, attr, eff) change feed, any
    number of rows per key, possibly no-ops. Returns one row per
    surviving version: (key, attr, valid_from, valid_to, is_current)
    with half-open intervals chained per key and the last version open
    until ``end_of_time``."""
    rows = base.select(
        F.col(key), F.col(attr), F.lit(base_from).alias("eff")
    ).unionByName(updates.select(F.col(key), F.col(attr), F.col("eff")))
    w = Window.partitionBy(key).orderBy(F.col("eff").asc(), F.col(attr).asc_nulls_first())
    # null-safe change filter: `_prev != attr` would evaluate to NULL (and
    # drop the row) whenever either side is NULL, losing changes to/from
    # NULL; and `_prev IS NULL` cannot distinguish "first row" from
    # "previous value was NULL" — hence the explicit row_number marker.
    marked = (
        rows.withColumn("_rn", F.row_number().over(w))
        .withColumn("_prev", F.lag(attr).over(w))
        .filter((F.col("_rn") == 1) | ~F.col("_prev").eqNullSafe(F.col(attr)))
    )
    versions = marked.withColumn(
        "valid_to", F.coalesce(F.lead("eff").over(w), F.lit(end_of_time))
    )
    return versions.select(
        key,
        attr,
        F.col("eff").alias("valid_from"),
        "valid_to",
        (F.col("valid_to") == end_of_time).alias("is_current"),
    )


def merge_upsert(target: DataFrame, source: DataFrame, *, key: str) -> DataFrame:
    """MERGE INTO (type-1 upsert): matched keys take the source row's
    values wholesale — including genuine NULLs, which a naive
    per-column ``coalesce(source, target)`` would silently revert —
    unmatched target rows survive, unmatched source rows insert. Both
    sides must share the schema. One full-outer equi-join on the key:
    shuffle-partitioned on both sides, no skew beyond the key's own
    (broadcast the source when it is a small changeset — Catalyst does
    when it fits). Deletes are out of scope (pair with an anti-join)."""
    cols = [c for c in target.columns if c != key]
    if set(source.columns) != set(target.columns):
        raise ValueError(f"schema mismatch: {source.columns} vs {target.columns}")
    s = source.withColumn("_src", F.lit(True)).alias("s")
    t = target.alias("t")
    picked = [
        F.coalesce(F.col(f"s.{key}"), F.col(f"t.{key}")).alias(key),
        *[
            F.when(F.col("s._src").isNotNull(), F.col(f"s.{c}"))
            .otherwise(F.col(f"t.{c}"))
            .alias(c)
            for c in cols
        ],
    ]
    return t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer").select(*picked)
