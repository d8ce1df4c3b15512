"""Streaming last-touch attribution via applyInPandasWithState — the
UNBOUNDED-lookback variant of q_attribution (operators/scalepatterns.py).

Why a custom stateful operator: a watermarked stream-stream interval join
(q_stream_join / q_stream_left_join) can only attribute within a bounded
time band — its view-side state must hold every view inside the band, and
an unbounded band means unbounded join state. Last-touch attribution with
unlimited lookback needs exactly ONE number per user (the latest view
timestamp), which is the textbook case for arbitrary per-key state: O(1)
state per user, purchases attributed the moment they arrive.

Ordering semantics (pinned to the batch twin): within each micro-batch the
key's rows are concatenated across Arrow chunks and sorted ONCE in (ts,
purchases-after-views-at-same-ts) order — self-contained, no reliance on
chunk or shuffle order — so a view sharing the purchase's exact timestamp
attributes, matching the batch operator's RANGE-frame (not ROWS-frame) tie
rule. Across micro-batches the
staged source is time-ordered (streaming/events.py invariant); a production
deployment facing out-of-order arrival would add a small sort buffer keyed
by watermark, which changes nothing about the O(1) state design.

Scale notes: state is hash-partitioned by user_id across executors and
checkpointed by the engine; dead users are bounded with a state TTL in
production (GroupStateTimeout) — left NoTimeout here because the drain is
finite. Arrow batches in/out, same boundary economics as the NER UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

STATE_SCHEMA = StructType([StructField("last_view_us", LongType())])

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("purchase_us", LongType()),
        StructField("view_us", LongType()),
        StructField("gap_us", LongType()),
    ]
)


def _attr_update(key, pdfs, state: GroupState):
    (user_id,) = key
    (last_view_us,) = state.get if state.exists else (None,)
    out_eid, out_pus, out_vus = [], [], []
    # Materialize the key's whole micro-batch before the ONE sort: sorting
    # each Arrow chunk independently would assume global time order across
    # chunks (and across upstream source partitions post-shuffle) from the
    # staged-source invariant rather than enforce it — a purchase in an
    # earlier chunk could process before an older view in a later chunk
    # (r4 ADVICE). Per-key per-batch data is small by construction, so the
    # concat is bounded.
    chunks = list(pdfs)
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        pdf = pdf.assign(
            # .values->ns->int64: robust to pandas datetime64[ns] vs [us]
            # column units (astype('int64') alone would silently change
            # scale with the unit)
            _us=pdf["ts"].values.astype("datetime64[ns]").astype("int64") // 1000,
            _is_p=(pdf["event_type"] == "purchase").astype("int8"),
        ).sort_values(["_us", "_is_p"], kind="stable")
        for eid, us, et in zip(pdf["event_id"], pdf["_us"], pdf["event_type"]):
            if et == "view":
                last_view_us = int(us) if last_view_us is None else max(last_view_us, int(us))
            elif et == "purchase" and last_view_us is not None:
                out_eid.append(int(eid))
                out_pus.append(int(us))
                out_vus.append(last_view_us)
    state.update((last_view_us,))
    if out_eid:
        yield pd.DataFrame(
            {
                "event_id": out_eid,
                "user_id": [user_id] * len(out_eid),
                "purchase_us": out_pus,
                "view_us": out_vus,
                "gap_us": [p - v for p, v in zip(out_pus, out_vus)],
            }
        )


def streaming_attribution(events: DataFrame) -> DataFrame:
    """events (streaming; event_id/user_id/ts/event_type) → one appended row
    per attributed purchase, emitted in the micro-batch it arrives."""
    return events.select("event_id", "user_id", "ts", "event_type").groupBy(
        "user_id"
    ).applyInPandasWithState(
        _attr_update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
