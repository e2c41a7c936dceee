"""Custom stateful streaming operators (applyInPandasWithState).

``streaming_topk_per_topic`` keeps the newest-K messages per
(contract, topic) as live streaming state — the streaming analog of
the reference's in-memory per-topic reverse-time window
(reference: time_window.go:107-187 add/ilookup: unsynced newest-first
entries served before disk). Each micro-batch updates the per-key
top-K and emits the refreshed view.

State is bounded: K entries per key, incoming rows are deduped by seq
(upstream delivery is at-least-once), and a PROCESSING-TIME timeout
drops keys idle past ``idle_timeout_ms`` of wall clock (expiry-window
parity, expiry_window.go:28-148 — which is also wall-clock there).
Note this is not an event-time eviction: a historical replay processed
quickly won't time keys out mid-replay (usually what you want), and a
paused stream does evict after the idle window. At scale state is
partitioned by the group key across executors by the state store — no
driver involvement.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("contract", LongType()),
        StructField("topic", StringType()),
        StructField("seq", LongType()),
        StructField("ts_us", LongType()),
        StructField("payload", BinaryType()),
        StructField("rank", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("seqs", ArrayType(LongType())),
        StructField("ts_us", ArrayType(LongType())),
        StructField("payloads", ArrayType(BinaryType())),
    ]
)


def _topk_fn(k: int, timeout_ms: int | None):
    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        contract, topic = key
        if state.hasTimedOut:
            state.remove()
            return
        seqs: list[int]
        ts_us: list[int]
        payloads: list[bytes]
        if state.exists:
            seqs, ts_us, payloads = state.get
            seqs, ts_us, payloads = list(seqs), list(ts_us), list(payloads)
        else:
            seqs, ts_us, payloads = [], [], []
        # dedup by seq: upstream delivery is at-least-once, and a
        # redelivered message must not occupy two of the K slots
        seen = set(seqs)
        for pdf in pdfs:
            for seq, t, p in zip(pdf["seq"], pdf["ts_us"], pdf["payload"]):
                s = int(seq)
                if s in seen:
                    continue
                seen.add(s)
                seqs.append(s)
                ts_us.append(int(t))
                payloads.append(bytes(p) if p is not None else b"")
        order = sorted(range(len(seqs)), key=lambda i: -seqs[i])[:k]
        seqs = [seqs[i] for i in order]
        ts_us = [ts_us[i] for i in order]
        payloads = [payloads[i] for i in order]
        state.update((seqs, ts_us, payloads))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                "contract": [contract] * len(seqs),
                "topic": [topic] * len(seqs),
                "seq": seqs,
                "ts_us": ts_us,
                "payload": payloads,
                "rank": list(range(1, len(seqs) + 1)),
            }
        )

    return fn


def streaming_topk_per_topic(
    entries: DataFrame, k: int = 5, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Maintain newest-K per (contract, topic) as streaming state.

    Input: messages-schema stream (contract, topic, seq, ts, payload).
    Output (update mode): refreshed top-K per touched key each batch.
    """
    from pyspark.sql import functions as F

    prepped = entries.select(
        "contract", "topic", "seq", F.unix_micros("ts").alias("ts_us"), "payload"
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return prepped.groupBy("contract", "topic").applyInPandasWithState(
        _topk_fn(k, idle_timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
