"""Top-K / ranking operators.

The reference's only ranking construct is the newest-first global
sort + limit with per-topic merge (reference: db.go:242-315,
time_window.go:220-330). On Spark both shapes compile to
TakeOrderedAndProject / window + filter — no driver-side loops.

Scale notes: ``orderBy(desc).limit(k)`` becomes per-partition top-K +
a single K-row merge on the driver (TakeOrderedAndProject) — no full
sort, no full shuffle. Per-key top-K shuffles once on the key; for
skewed keys AQE skew-join/salting applies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def newest_first_topk(df: DataFrame, k: int, order_col: str = "seq") -> DataFrame:
    """Global newest-first top-K (db.go:242-315's sort+limit+refill;
    exact filters make the refill loop unnecessary — SURVEY §2.4)."""
    return df.orderBy(F.desc(order_col)).limit(k)


def topk_per_key(
    df: DataFrame,
    keys: list[str],
    k: int,
    order: Column | None = None,
    rank_name: str = "rn",
) -> DataFrame:
    """K newest rows per key via row_number over a partitioned window.

    One shuffle on ``keys``; rank column retained (callers may project
    it away). Deterministic given a total ``order``.
    """
    w = Window.partitionBy(*keys).orderBy(order if order is not None else F.desc("seq"))
    return df.withColumn(rank_name, F.row_number().over(w)).filter(F.col(rank_name) <= k)
