"""As-of and range joins — time-series operators the north star adds.

The reference has no joins at all (SURVEY §2.4); these are the standard
time-series analytics companions, built shuffle-conscious:

- asof_join: "for each left row, the latest right row with
  right.ts <= left.ts (within tolerance), per key" — implemented as a
  union + single window pass: one shuffle on the key, NO range-explode,
  no per-row subquery. This is the scalable formulation (a lateral/
  broadcast approach would be O(n*m) or driver-bound).
- range_join_bucketed: inequality join ts in [lo, hi) accelerated by
  equi-joining on coarse time buckets first (turns a cross join into
  a bucket-local join, the classic interval-bucketing trick).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts_col: str = "ts",
    tolerance_seconds: float | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: latest right row at-or-before each left row per key.

    One shuffle on ``by`` + one ordered window pass over the union —
    the same cost profile as a window function, independent of how
    many right rows precede each left row.

    ``direction='backward'`` (default): latest right.ts <= left.ts;
    ``direction='forward'``: earliest right.ts >= left.ts (same single
    window pass, reversed ordering). Output: every left row + matched
    right columns (suffixed), NULL when nothing matches within
    tolerance.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    rcols = right_cols or [c for c in right.columns if c not in by and c != ts_col]

    lt = left.withColumn("_side", F.lit(1))
    rt = right.withColumn("_side", F.lit(0))
    # the matched right row travels as ONE struct column: last(...,
    # ignorenulls) then selects whole rows atomically — per-column
    # fills would backfill a NULL field of the matched row with a
    # stale value from an older right row
    rrow_type = (
        "struct<_rts:timestamp,"
        + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in rcols)
        + ">"
    )
    lt2 = lt.select(
        *by, F.col(ts_col), "_side",
        F.lit(None).cast(rrow_type).alias("_rrow"),
        *[F.col(c) for c in left.columns if c not in by and c != ts_col],
    )
    rt2 = rt.select(
        *by, F.col(ts_col), "_side",
        F.struct(F.col(ts_col).alias("_rts"), *[F.col(c) for c in rcols]).alias("_rrow"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in by and c != ts_col
        ],
    )
    u = lt2.unionByName(rt2)
    # right rows sort before left rows at equal ts so ties match;
    # forward = the same pass over reversed time order
    ts_order = F.col(ts_col).asc() if direction == "backward" else F.col(ts_col).desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(ts_order, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = F.last("_rrow", ignorenulls=True).over(w)
    filled = u.select(
        *by,
        ts_col,
        "_side",
        matched.getField("_rts").alias("_matched_ts"),
        *[matched.getField(c).alias(c + suffix) for c in rcols],
        *[F.col(c) for c in left.columns if c not in by and c != ts_col],
    )
    out = filled.filter(F.col("_side") == 1).drop("_side")
    if tolerance_seconds is not None:
        gap = (
            F.col(ts_col).cast("double") - F.col("_matched_ts").cast("double")
            if direction == "backward"
            else F.col("_matched_ts").cast("double") - F.col(ts_col).cast("double")
        )
        within = F.col("_matched_ts").isNotNull() & (gap <= tolerance_seconds)
        out = out.select(
            *by,
            ts_col,
            F.when(within, F.col("_matched_ts")).alias("_matched_ts"),
            *[F.when(within, F.col(c + suffix)).alias(c + suffix) for c in rcols],
            *[F.col(c) for c in left.columns if c not in by and c != ts_col],
        )
    return out.withColumnRenamed("_matched_ts", "matched_ts" + suffix)


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_lo: str,
    right_hi: str,
    bucket_seconds: int,
    extra_on: Column | None = None,
) -> DataFrame:
    """Interval join left.ts in [right.lo, right.hi) via bucket
    equi-join: each right interval is exploded onto the coarse buckets
    it spans (bounded by interval length / bucket), then the join is
    bucket-local. Shuffle key = bucket, so cost ~ matches, not |L|x|R|.

    Column names shared by both sides (other than the join machinery)
    would make the range predicate ambiguous — refuse loudly instead
    of failing later inside Catalyst.
    """
    overlap = (set(left.columns) & set(right.columns)) - set()
    if overlap:
        raise ValueError(
            f"range_join_bucketed: rename overlapping columns first: {sorted(overlap)}"
        )
    lb = left.withColumn(
        "_bkt", (F.unix_timestamp(F.col(left_ts)) / bucket_seconds).cast("long")
    )
    rb = right.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(right_lo)) / bucket_seconds).cast("long"),
                (F.unix_timestamp(F.col(right_hi)) / bucket_seconds).cast("long"),
            )
        ),
    )
    cond = (
        (F.col(left_ts) >= F.col(right_lo))
        & (F.col(left_ts) < F.col(right_hi))
    )
    if extra_on is not None:
        cond = cond & extra_on
    return lb.join(rb, on=["_bkt"]).filter(cond).drop("_bkt")
