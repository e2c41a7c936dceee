"""Stream-stream interval joins (attribution-style correlation).

The reference correlates streams only at the application layer (a
subscriber reads two topics and matches by hand); Structured Streaming
makes the correlation an operator: an inner join between two streams
with a time-range predicate and watermarks bounding both sides' state
(reference behavior anchor: the pub/sub fan-out in
server/internal/service.go routes but never joins).

``stream_interval_join`` is the streaming twin of the batch
``operators.asof.range_join_bucketed``: right rows match left rows of
the same key with ``right_ts`` inside ``[left_ts + lower, left_ts +
upper]``. Watermarks let Spark drop buffered state once an input is
older than ``watermark + upper`` — without them a stream-stream join
buffers forever (the state-store analogue of an unbounded window
chain).

The same function works UNCHANGED on batch DataFrames
(``withWatermark`` is a no-op in batch), which is how the parity test
pins streaming results == batch results on the same input.

Scale: the join shuffles both streams on the key; state per key is
bounded by the watermark horizon. Skewed keys behave like any skewed
stream-stream join — pre-salt the hot keys or widen the key with a
coarse time bucket if one key dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: int = 0,
    upper_seconds: int = 3600,
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner join: same ``on`` key and ``right_ts`` within
    ``[left_ts + lower_seconds, left_ts + upper_seconds]``.

    Column sets must be disjoint apart from ``on`` (and the two ts
    columns must be differently named) — refuse loudly rather than let
    Catalyst produce ambiguous references mid-plan. Output keeps one
    copy of the key plus both sides' remaining columns.
    """
    if left_ts == right_ts:
        raise ValueError(
            "stream_interval_join: rename the ts columns apart "
            f"(both sides use {left_ts!r})"
        )
    overlap = (set(left.columns) & set(right.columns)) - {on}
    if overlap:
        raise ValueError(
            f"stream_interval_join: rename overlapping columns first: {sorted(overlap)}"
        )
    if upper_seconds < lower_seconds:
        raise ValueError("stream_interval_join: upper_seconds < lower_seconds")
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (l[on] == r[on])
        & (r[right_ts] >= l[left_ts] + F.expr(f"INTERVAL {lower_seconds} SECONDS"))
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {upper_seconds} SECONDS"))
    )
    out_cols = [l[on].alias(on)]
    out_cols += [l[c] for c in left.columns if c != on]
    out_cols += [r[c] for c in right.columns if c != on]
    return l.join(r, cond, "inner").select(*out_cols)
