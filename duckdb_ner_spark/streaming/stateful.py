"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.E future-work surface; the Spark-native mechanism for operators
the built-in windowed aggregations can't express).

``running_user_stats``: per-user running (count, total value, max ts) that
updates every micro-batch and emits the current state — an arbitrary-state
operator (the built-in alternative would force a window/watermark shape).

Scale notes: state is partitioned by the grouping key across executors and
checkpointed by the streaming engine; a production run sets a TTL timeout
(GroupStateTimeout) to bound state for dead keys. Arrow batches in/out —
same process boundary economics as the NER UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        # epoch micros: the running max must live IN the state — late events
        # in a later micro-batch must not move last_ts backwards
        StructField("last_ts_us", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)


def _update(key, pdfs, state: GroupState):
    (user_id,) = key
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        mx = pdf["ts"].max()
        if pd.notna(mx):
            last_us = max(last_us, int(mx.value // 1000))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "last_ts": [pd.Timestamp(last_us * 1000) if last_us else pd.NaT],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """events (streaming, cols user_id/ts/value) → running per-user stats."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_to_memory(spark, sf_dir: str, table_name: str = "stateful_out") -> None:
    from .events import stream_events

    q = (
        running_user_stats(stream_events(spark, sf_dir))
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    from .events import _await_drain

    _await_drain(q)
