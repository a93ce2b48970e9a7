"""Stateful streaming funnel: the watermarked first-touch counterpart
of the batch ``operators.funnel.funnel_stages`` plan (VERDICT r11
task 7) — same stage semantics (stage k converts on the FIRST event of
type ``stages[k]`` strictly after the stage-(k-1) conversion time),
carried across micro-batches in per-user GroupState.

State is three nullable int64 microsecond timestamps per user — fixed
width, so 10⁹ active users is ~24 GB of state across the cluster, the
same envelope as streaming sessionization. Events are processed in
(ts, event_id) order within each micro-batch; exactness across batches
holds when per-user event-time order holds across batches (the same
single-pass envelope documented for streaming/sessions.py — a
straggler 'view' older than an already-consumed 'click' would need
full reprocessing in ANY single-pass engine).

Emission contract (update mode): one row per user per micro-batch in
which that user's stage vector CHANGED, carrying the current
(t1,t2,t3) and the furthest stage index. Because stage times only ever
move earlier-or-fill-in monotonically under in-order arrival, the
max-furthest row per user at drain equals the batch plan's per-user
result — that is the batch-parity test's compare
(tests/test_streaming_funnel.py)."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("t1_us", LongType()),
        StructField("t2_us", LongType()),
        StructField("t3_us", LongType()),
        StructField("furthest", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("t1_us", LongType()),
        StructField("t2_us", LongType()),
        StructField("t3_us", LongType()),
    ]
)


def _ts_to_us(ts: pd.Series):
    """Microsecond int64 array from an Arrow-delivered timestamp column.

    A '[ns]' substring test is NOT enough: tz-aware timestamps print as
    'datetime64[ns, UTC]' (no '[ns]' substring), and pandas 2 can carry
    datetime64[us]/[ms] units — either would silently pass values
    through at the wrong scale. Detect the datetime64 family, strip any
    tz (int64 view is UTC-epoch-based regardless), normalize the unit
    to ns, then divide down; refuse anything else loudly."""
    if not pd.api.types.is_datetime64_any_dtype(ts.dtype):
        raise TypeError(
            f"expected a datetime64 ts column from Arrow, got {ts.dtype}"
        )
    s = ts
    if getattr(ts.dtype, "tz", None) is not None:
        s = ts.dt.tz_convert("UTC").dt.tz_localize(None)
    s = s.astype("datetime64[ns]")
    return s.astype("int64").to_numpy() // 1000


def _funnel_func(stages: tuple[str, str, str]):
    s1, s2, s3 = stages

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            yield pd.DataFrame(
                [], columns=[f.name for f in OUTPUT_SCHEMA.fields]
            )
            return
        ev = pd.concat(list(pdfs), ignore_index=True)
        ev = ev.sort_values(["ts", "event_id"], kind="mergesort")
        us = _ts_to_us(ev["ts"])
        types = ev["event_type"].to_numpy()

        t1, t2, t3 = state.get if state.exists else (None, None, None)
        before = (t1, t2, t3)
        for t, typ in zip(us, types):
            t = int(t)
            if t1 is None:
                if typ == s1:
                    t1 = t
                continue
            if t2 is None:
                if typ == s2 and t > t1:
                    t2 = t
                continue
            if t3 is None and typ == s3 and t > t2:
                t3 = t
        changed = (t1, t2, t3) != before
        if changed:
            state.update((t1, t2, t3))
        seen_new_user = not state.exists and not changed
        if seen_new_user:
            # a user whose first events convert nothing still counts in
            # users_total — persist empty state so they emit once
            state.update((None, None, None))
        if changed or seen_new_user:
            furthest = (
                3 if t3 is not None
                else 2 if t2 is not None
                else 1 if t1 is not None
                else 0
            )
            yield pd.DataFrame(
                [(user_id, t1, t2, t3, furthest)],
                columns=[f.name for f in OUTPUT_SCHEMA.fields],
            )
        else:
            yield pd.DataFrame(
                [], columns=[f.name for f in OUTPUT_SCHEMA.fields]
            )

    return fn


RETENTION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("cohort_week", LongType()),
        StructField("activity_week", LongType()),
    ]
)

RETENTION_STATE_SCHEMA = StructType(
    [
        StructField("cohort_week", LongType()),
        StructField("last_week", LongType()),
    ]
)


def _retention_func(epoch_days: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            yield pd.DataFrame(
                [], columns=[f.name for f in RETENTION_OUTPUT_SCHEMA.fields]
            )
            return
        ev = pd.concat(list(pdfs), ignore_index=True)
        us = _ts_to_us(ev["ts"])
        # integer day index -> week DIV 7 from the fixed epoch, the same
        # arithmetic as the batch plan (events precede the epoch nowhere
        # in this data model; a negative-day corpus would need the
        # floor-vs-truncate DIV distinction resolved first)
        weeks = sorted({int(w) for w in (us // 86_400_000_000 - epoch_days) // 7})
        cohort, last = state.get if state.exists else (None, None)
        out = []
        for w in weeks:
            if cohort is None:
                cohort = w
            if last is None or w > last:
                out.append((user_id, cohort, w))
                last = w
        if out:
            state.update((cohort, last))
        yield pd.DataFrame(
            out, columns=[f.name for f in RETENTION_OUTPUT_SCHEMA.fields]
        )

    return fn


def streaming_retention(
    spark: SparkSession,
    sf_dir: str,
    *,
    epoch: str = "2024-01-01",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Stateful streaming twin of operators.funnel.retention_cohorts:
    per-user (cohort_week, activity_week) increments emitted EXACTLY
    ONCE per newly-seen activity week (state = two int64s per user).
    The cohort x week triangle is then a plain aggregation over the
    emitted stream — counting happens downstream, so the stateful
    operator's state never grows with activity history. Same in-order
    single-pass envelope as the funnel twin."""
    from datetime import date

    from hhek2sqlite_spark.sources.parquet import _normalize_events

    y, m, d = (int(p) for p in epoch.split("-"))
    epoch_days = (date(y, m, d) - date(1970, 1, 1)).days
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = _normalize_events(
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return (
        raw.withWatermark("ts", watermark)
        .select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _retention_func(epoch_days),
            outputStructType=RETENTION_OUTPUT_SCHEMA,
            stateStructType=RETENTION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_funnel(
    spark: SparkSession,
    sf_dir: str,
    *,
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
    watermark: str = "0 seconds",
) -> DataFrame:
    """readStream over the events fixture -> stateful first-touch
    funnel. Drain with trigger(availableNow=True) in tests; aggregate
    the last emission per user for drain-time stage counts."""
    from hhek2sqlite_spark.sources.parquet import _normalize_events

    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = _normalize_events(
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return (
        raw.withWatermark("ts", watermark)
        .select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _funnel_func(stages),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
