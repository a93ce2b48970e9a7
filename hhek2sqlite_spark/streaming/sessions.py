"""Stateful streaming sessionization: the custom-stateful-operator tier
(``applyInPandasWithState``), the streaming counterpart of the batch
``operators.sessionize`` plan.

Semantics: per-user gap sessions (same gap rule as batch). Within a
micro-batch events are sorted by (ts, event_id); the open session rides
in GroupState between batches with an event-time timeout at
last_ts + gap, so a session closes either (a) when a later event opens
the next session, or (b) when the watermark passes its timeout. Sessions
still open when an ``availableNow`` drain terminates are NOT emitted —
the stream's contract only covers closed sessions (the test checks the
emitted set against the batch plan's sessions).

Correctness envelope (documented, inherent to per-key streaming
sessionization): exact when each user's events arrive in timestamp order
across micro-batches (any order within a batch is fine — we sort); a
batch-boundary straggler older than the open session's start would be
mis-sessionized by any single-pass engine without full reprocessing.

Scale: state is one fixed-width row per ACTIVE user (4 numbers), keyed
shuffles only, Arrow-batched transfer; watermark bounds state lifetime.

Value totals here are float64 (Arrow/pandas path); the exact-decimal
version of the same aggregate lives in the batch plan, which is also the
oracle-checked one.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

# robust ts handling (tz-aware dtypes print '[ns, UTC]'; pandas 2 can
# carry [us]/[ms] units) — shared with the funnel/retention twins
from hhek2sqlite_spark.streaming.funnel import _ts_to_us

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _session_func(gap_us: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        closed: list[tuple[int, int, int, int, float]] = []

        if state.hasTimedOut:
            if state.exists:
                s0, s1, n, tv = state.get
                closed.append((user_id, s0, s1, n, tv))
                state.remove()
            yield pd.DataFrame(
                closed,
                columns=[f.name for f in OUTPUT_SCHEMA.fields],
            )
            return

        ev = pd.concat(list(pdfs), ignore_index=True)
        ev = ev.sort_values(["ts", "event_id"], kind="mergesort")
        us = _ts_to_us(ev["ts"])
        vals = ev["value"].to_numpy()

        if state.exists:
            cur = list(state.get)
        else:
            cur = None

        for t, v in zip(us, vals):
            if cur is None:
                cur = [int(t), int(t), 1, float(v)]
            elif t - cur[1] > gap_us:
                closed.append((user_id, cur[0], cur[1], cur[2], cur[3]))
                cur = [int(t), int(t), 1, float(v)]
            else:
                cur[1] = int(t)
                cur[2] += 1
                cur[3] += float(v)

        if cur is not None:
            state.update(tuple(cur))
            # event-time timeout fires once the watermark passes this
            # (setTimeoutTimestamp takes epoch MILLIseconds)
            state.setTimeoutTimestamp(cur[1] // 1000 + gap_us // 1000)

        yield pd.DataFrame(
            closed, columns=[f.name for f in OUTPUT_SCHEMA.fields]
        )

    return fn


def streaming_sessions(
    spark: SparkSession,
    sf_dir: str,
    *,
    gap_minutes: int = 30,
    watermark: str = "0 seconds",
) -> DataFrame:
    """readStream over the events fixture -> stateful sessionizer.
    Drain with trigger(availableNow=True) in tests."""
    from hhek2sqlite_spark.sources.parquet import _normalize_events

    gap_us = gap_minutes * 60 * 1_000_000
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = _normalize_events(
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return (
        raw.withWatermark("ts", watermark)
        .select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_func(gap_us),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
