"""OLAP shape operators: multi-level aggregation, pivot, running windows.

The reference's aggregation surface is flat per-topic counters
(/root/reference/metrics/timeseries.go keeps one histogram per metric);
these are the multi-dimensional shapes an analytics user expects on
top of the same data, expressed so Catalyst keeps them one-pass:

- rollup_agg / cube_agg: Spark's native ROLLUP/CUBE — ONE shuffle
  computes every grouping level (the Expand node multiplies rows
  map-side, partial aggs still combine before the exchange), vs the
  naive union-of-groupbys which scans and shuffles once per level.
- pivot_counts: groupBy().pivot() with an EXPLICIT value list — an
  unlisted pivot makes Spark run a distinct-scan job first to discover
  values; at 100 TB that is a full extra pass over the fact table.
- running_agg: per-key cumulative/moving window functions. One
  shuffle on the partition key, one per-partition sort; rows-between
  frames so Spark uses the streaming (unbounded-preceding) frame
  evaluator, never materializing the whole partition per row.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rollup_agg(
    df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """GROUP BY ROLLUP(keys): every aggregation prefix level
    (k1,k2,...), (k1,...), ..., () in one shuffle. A ``grouping_id``
    column disambiguates subtotal rows from genuine-NULL key values."""
    # grouping_id() is only resolvable inside the grouping-sets
    # aggregate itself, so it rides along as an extra agg expression
    return df.rollup(*keys).agg(
        *aggs, F.grouping_id().cast("long").alias("grouping_id")
    )


def cube_agg(
    df: DataFrame, keys: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """GROUP BY CUBE(keys): all 2^len(keys) grouping sets, one shuffle."""
    return df.cube(*keys).agg(
        *aggs, F.grouping_id().cast("long").alias("grouping_id")
    )


def pivot_counts(
    df: DataFrame,
    row_key: Column | str,
    pivot_col: str,
    values: Sequence[str],
    agg: Column | None = None,
) -> DataFrame:
    """Pivot ``pivot_col`` into one column per value in ``values``.

    ``values`` is required, not discovered: an implicit pivot runs a
    separate distinct job over the fact table first. With the list
    given, the whole pivot is a single groupBy shuffle whose partial
    aggregation happens map-side per pivot value.
    """
    agg = F.count(F.lit(1)) if agg is None else agg
    return df.groupBy(row_key).pivot(pivot_col, list(values)).agg(agg)


def running_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    moving_n: int = 3,
) -> DataFrame:
    """Per-key running sum, moving average over the trailing
    ``moving_n`` rows, and previous-row delta, ordered by
    ``order_cols`` (include a unique tiebreaker for determinism).

    One hash shuffle on ``key_cols`` + one per-partition sort serves
    all three window functions (same WindowSpec ⇒ one Window physical
    node). Frames are ROWS-based so evaluation is streaming — state
    per row is O(moving_n), independent of partition size.
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    v = F.col(value_col).cast("double")
    return df.select(
        *key_cols,
        *order_cols,
        v.alias(value_col),
        F.sum(v).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "running_sum"
        ),
        F.avg(v).over(w.rowsBetween(-(moving_n - 1), 0)).alias(
            f"moving_avg_{moving_n}"
        ),
        (v - F.lag(v, 1).over(w)).alias("delta_prev"),
    )


def decile_stats(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    order_cols: list[str],
    n_buckets: int = 10,
) -> DataFrame:
    """Per-key quantile-bucket profile: ntile(n) over the
    (value, order)-sorted rows, then per-bucket count/bounds/mean —
    the distribution panel behind score-threshold decisions (e.g.
    "keep the top 3 quality deciles").

    ntile's fill rule (equal buckets, remainder to the leading ones)
    is standard SQL and identical across engines; the tie-break order
    makes bucket assignment deterministic. The per-bucket mean is a
    round-6 DECIMAL sum over exact bucket membership — order-free.

    One window shuffle on the key + one (key, bucket) partial agg.

    Output: keys + (decile, n, lo, hi, mean_r).
    """
    w = Window.partitionBy(*keys).orderBy(
        F.col(value_col).asc(), *[F.col(c).asc() for c in order_cols]
    )
    bucketed = df.filter(F.col(value_col).isNotNull()).withColumn(
        "decile", F.ntile(n_buckets).over(w)
    )
    v6 = F.round(F.col(value_col), 6).cast("decimal(18,6)")
    return bucketed.groupBy(*keys, "decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(value_col).alias("lo"),
        F.max(value_col).alias("hi"),
        F.round(
            F.sum(v6).cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("mean_r"),
    )
