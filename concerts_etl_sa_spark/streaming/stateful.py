"""Custom stateful streaming operator via applyInPandasWithState.

Beyond the built-in watermark/window aggregates (incremental.py), a
training-data ingest needs ARBITRARY per-key state — the canonical case
being streaming dedup with a bounded memory of seen ids per key. Spark's
``dropDuplicates`` on a stream keeps unbounded state unless watermarked
on event time; this operator keeps an explicit per-user seen-set with a
processing-time timeout — the applyInPandasWithState shape any custom
stateful op (sessionizers, online counters, rate limiters) follows.

State layout: one row per user_id, state = (seen_ids array). Each
micro-batch emits only rows whose event_id wasn't in state, then merges
the new ids into state. Arrow-batched: pandas per key-group, no
row-at-a-time Python.

Scale notes: state is partitioned by the grouping key across executors
(RocksDB state store in production); state size scales with #active
keys, not stream length. A production deployment bounds idle-key state
with GroupStateTimeout.EventTimeTimeout + a watermark; with a
processing-time timeout the engine schedules continuous (empty)
micro-batches to fire pending timeouts, which also prevents an
availableNow backlog drain from ever terminating — so the finite-batch
form here keeps NoTimeout and lets the checkpoint lifecycle own cleanup.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
    ]
)

STATE_SCHEMA = StructType([StructField("seen_ids", ArrayType(LongType()))])

def _dedup_user_events(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (seen,) = state.get if state.exists else ([],)
    seen_set = set(seen)
    for pdf in batches:
        fresh = pdf[~pdf["event_id"].isin(seen_set)]
        # batch-internal dedup too: keep first occurrence per event_id
        fresh = fresh.drop_duplicates(subset=["event_id"], keep="first")
        seen_set.update(fresh["event_id"].tolist())
        if len(fresh):
            yield fresh[["user_id", "event_id", "ts", "event_type"]]
    state.update((sorted(seen_set),))


def streaming_dedup_by_user(events: DataFrame) -> DataFrame:
    """Exactly-once-per-event_id stream per user with bounded state."""
    return (
        events.select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _dedup_user_events,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_streaming_dedup(events: DataFrame, out_path: str, checkpoint: str):
    """availableNow runner: drains the backlog exactly once, keeps state
    across runs via the checkpoint, then terminates."""
    return (
        streaming_dedup_by_user(events)
        .writeStream.trigger(availableNow=True)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .option("path", out_path)
        .format("parquet")
        .start()
    )


def streaming_dedup_watermarked(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """NATIVE bounded-state streaming dedup:
    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    key's event time falls behind the watermark, then evicts it — the
    built-in twin of :func:`streaming_dedup_by_user` for the common case
    where duplicates arrive close together in event time (retried
    scrapes, at-least-once upstream replays). Use the
    applyInPandasWithState form when dedup memory must outlive the
    watermark or the state is richer than a key set; use this one when
    it needn't — the state store handles eviction with zero custom code
    and no Python in the stream.

    Keyed on event_id alone (global dedup, not per-user): state scales
    with the number of DISTINCT ids inside the watermark horizon."""
    return (
        events.select("user_id", "event_id", "ts", "event_type")
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
    )
