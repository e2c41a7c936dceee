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
    window pass, reversed ordering); ``direction='nearest'``: whichever
    of the two is closer in time, ties to backward — two window passes
    over ONE exchange (same partition keys, so Catalyst reuses the
    shuffle and only adds the second sort). Output: every left row +
    matched right columns (suffixed), NULL when nothing matches within
    tolerance.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be 'backward', 'forward' or 'nearest'")
    if direction == "nearest":
        return _asof_nearest(
            left, right, by, ts_col, tolerance_seconds, right_cols, suffix
        )
    rcols = right_cols or [c for c in right.columns if c not in by and c != ts_col]

    lt = left.withColumn("_side", F.lit(1))
    rt = right.withColumn("_side", F.lit(0))
    # the matched right row travels as ONE struct column: last(...,
    # ignorenulls) then selects whole rows atomically — per-column
    # fills would backfill a NULL field of the matched row with a
    # stale value from an older right row
    # field list built uniformly so an empty rcols (caller only wants
    # matched_ts) yields valid DDL, not a trailing-comma ParseException
    rrow_type = "struct<" + ",".join(
        ["_rts:timestamp"]
        + [f"{c}:{right.schema[c].dataType.simpleString()}" for c in rcols]
    ) + ">"
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


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts_col: str,
    tolerance_seconds: float | None,
    right_cols: list[str] | None,
    suffix: str,
) -> DataFrame:
    """Nearest-in-time as-of: per left row the closer of the backward /
    forward matches (tie → backward). Both matches come from window
    passes over the SAME union and partitioning — one shuffle, two
    sorts; tolerance gates each side BEFORE the choice, so a too-far
    backward match still yields a within-tolerance forward one."""
    rcols = right_cols or [c for c in right.columns if c not in by and c != ts_col]
    lt = left.withColumn("_side", F.lit(1))
    rt = right.withColumn("_side", F.lit(0))
    # field list built uniformly so an empty rcols (caller only wants
    # matched_ts) yields valid DDL, not a trailing-comma ParseException
    rrow_type = "struct<" + ",".join(
        ["_rts:timestamp"]
        + [f"{c}:{right.schema[c].dataType.simpleString()}" for c in rcols]
    ) + ">"
    lcols = [c for c in left.columns if c not in by and c != ts_col]
    lt2 = lt.select(
        *by, F.col(ts_col), "_side",
        F.lit(None).cast(rrow_type).alias("_rrow"),
        *[F.col(c) for c in lcols],
    )
    rt2 = rt.select(
        *by, F.col(ts_col), "_side",
        F.struct(F.col(ts_col).alias("_rts"), *[F.col(c) for c in rcols]).alias("_rrow"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    u = lt2.unionByName(rt2)
    w_b = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_f = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col).desc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    mb = F.last("_rrow", ignorenulls=True).over(w_b)
    mf = F.last("_rrow", ignorenulls=True).over(w_f)
    ts_d = F.col(ts_col).cast("double")
    gap_b = ts_d - mb.getField("_rts").cast("double")
    gap_f = mf.getField("_rts").cast("double") - ts_d
    valid_b = mb.isNotNull() & (
        F.lit(True) if tolerance_seconds is None else gap_b <= tolerance_seconds
    )
    valid_f = mf.isNotNull() & (
        F.lit(True) if tolerance_seconds is None else gap_f <= tolerance_seconds
    )
    winner = (
        F.when(valid_b & (~valid_f | (gap_b <= gap_f)), mb)
        .when(valid_f, mf)
        .otherwise(F.lit(None).cast(rrow_type))
    )
    filled = u.select(
        *by,
        ts_col,
        "_side",
        winner.getField("_rts").alias("matched_ts" + suffix),
        *[winner.getField(c).alias(c + suffix) for c in rcols],
        *[F.col(c) for c in lcols],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")


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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_seconds: int,
    extra_on: Column | None = None,
) -> DataFrame:
    """Interval × interval OVERLAP join (half-open: overlap iff
    l_lo < r_hi AND r_lo < l_hi) — the co-presence / conflict /
    double-booking question that `range_join_bucketed` (point in
    interval) can't ask.

    Both sides explode onto the coarse time buckets their intervals
    span, the join is bucket-local, and each overlapping pair is kept
    EXACTLY ONCE without a distinct shuffle: the match is attributed
    to the single bucket containing the overlap's START
    (max(l_lo, r_lo)) — every overlapping pair has exactly one such
    bucket, so no dedup pass exists in the plan. Shuffle key =
    bucket; cost tracks interval span / bucket_seconds × matches,
    never |L|·|R|. Long intervals fan onto span/bucket rows — pick
    ``bucket_seconds`` near the typical interval length.

    Inputs use integer-second columns (unix seconds, the repo's
    interval convention); refuses overlapping column names loudly
    like `range_join_bucketed`.
    """
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"interval_overlap_join: rename overlapping columns first: {sorted(overlap)}"
        )
    # floor, not truncate-toward-zero: pre-1970 (negative-epoch)
    # intervals must bucket consistently with the attribution test
    def bkt(c):
        return F.floor(c / F.lit(bucket_seconds)).cast("long")

    lb = left.withColumn(
        "_bkt",
        F.explode(F.sequence(bkt(F.col(left_lo)), bkt(F.col(left_hi)))),
    )
    rb = right.withColumn(
        "_bkt",
        F.explode(F.sequence(bkt(F.col(right_lo)), bkt(F.col(right_hi)))),
    )
    cond = (
        (F.col(left_lo) < F.col(right_hi))
        & (F.col(right_lo) < F.col(left_hi))
        # exactly-once: only the bucket holding the overlap start
        & (F.col("_bkt") == bkt(F.greatest(F.col(left_lo), F.col(right_lo))))
    )
    if extra_on is not None:
        cond = cond & extra_on
    return lb.join(rb, on=["_bkt"]).filter(cond).drop("_bkt")


def interval_lookup(
    facts: DataFrame,
    intervals: DataFrame,
    by: list[str],
    t_col: str,
    from_col: str = "valid_from_us",
    to_col: str = "valid_to_us",
    attr_cols: list[str] | None = None,
) -> DataFrame:
    """Point-in-interval (temporal) lookup: for each fact row, the
    interval containing its time instant — the join that makes an
    SCD-2 dimension (``scd2_intervals``) queryable ("what was this
    user's state WHEN the event happened", not "now").

    Same shape as the as-of join, not a range join: with
    non-overlapping intervals per key (the SCD-2 invariant), the
    containing interval is the LAST one starting at-or-before t — one
    union, one (key, time) window pass, one shuffle; then a bound
    check against ``to_col`` (NULL = open interval). A fact landing
    exactly on ``from_col`` belongs to the NEW interval (t >= from,
    closed-open semantics), enforced by sorting interval rows before
    fact rows on time ties.

    Times are integer (epoch-microsecond) columns end to end — no
    timestamp arithmetic, exact on any engine.

    Output: every fact row + matched attr_cols (NULL when no interval
    contains t) + ``in_interval`` flag.
    """
    attrs = attr_cols or [
        c for c in intervals.columns
        if c not in by and c not in (from_col, to_col)
    ]
    iv = intervals.select(
        *by,
        F.col(from_col).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(from_col).alias("_from"),
            F.col(to_col).alias("_to"),
            *[F.col(c).alias(c) for c in attrs],
        ).alias("_ivl"),
    )
    fact_cols = facts.columns
    ft = facts.select(
        *fact_cols,
        F.col(t_col).cast("long").alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(iv.schema["_ivl"].dataType.simpleString()).alias(
            "_ivl"
        ),
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = iv.select(
        *[F.lit(None).cast(facts.schema[c].dataType.simpleString()).alias(c)
          for c in fact_cols if c not in by],
        *by, "_t", "_side", "_ivl",
    ).unionByName(
        ft.select(
            *[c for c in fact_cols if c not in by],
            *by, "_t", "_side", "_ivl",
        )
    )
    filled = merged.withColumn(
        "_m", F.last("_ivl", ignorenulls=True).over(w)
    ).filter(F.col("_side") == 1)
    hit = F.col("_m").isNotNull() & (
        F.col("_m._to").isNull() | (F.col("_t") < F.col("_m._to"))
    )
    out = filled.select(
        *fact_cols,
        *[F.when(hit, F.col(f"_m.{c}")).alias(c) for c in attrs],
        hit.alias("in_interval"),
    )
    return out


def multitouch_attribution(
    conversions: DataFrame,
    touches: DataFrame,
    by: list[str],
    conv_ts: str = "ts",
    touch_ts: str = "ts",
    conv_id: str = "conv_id",
    touch_id: str = "touch_id",
    window_seconds: int = 86400,
    model: str = "linear",
) -> DataFrame:
    """Multi-touch attribution: distribute each conversion's credit
    across the touchpoints in its lookback window — the step past
    last-click (`asof_join`) every marketing/causal pipeline takes.

    Models (weights in exact integer ppm, floor'd; the remainder goes
    to the LAST touch so every conversion's credit sums to exactly
    1e6 — auditable, no float leakage):
      - 'linear': 1/n each;
      - 'u_shaped': 40/40/20 — 40% first, 40% last, the middle 20%
        split linearly (first-touch gets it all when n <= 2... n=1 ->
        100%, n=2 -> 50/50).

    Shape: the (touch, conversion) pairing is the bucketed interval
    join discipline (`range_join_bucketed`'s key insight) — here the
    per-key join with a window-bound predicate; pair counts per
    conversion ride one window over the pair relation.

    Output: (conv_id, touch_id, n_touches, touch_rank, weight_ppm).
    """
    if model not in ("linear", "u_shaped"):
        raise ValueError("model must be 'linear' or 'u_shaped'")
    c = conversions.select(
        *[F.col(k).alias(f"_k{i}") for i, k in enumerate(by)],
        F.col(conv_id).alias("conv_id"),
        F.unix_micros(conv_ts).alias("_ct"),
    )
    t = touches.select(
        *[F.col(k).alias(f"_k{i}") for i, k in enumerate(by)],
        F.col(touch_id).alias("touch_id"),
        F.unix_micros(touch_ts).alias("_tt"),
    )
    keys = [f"_k{i}" for i in range(len(by))]
    pairs = c.join(t, keys).filter(
        (F.col("_tt") <= F.col("_ct"))
        & (F.col("_tt") >= F.col("_ct") - F.lit(window_seconds * 1_000_000))
    )
    # partition by the join keys TOO: conv_id need only be unique
    # within a key (per-user sequence numbers are legal), and a shared
    # conv_id across keys must not pool touches
    w = Window.partitionBy(*keys, "conv_id").orderBy(
        F.col("_tt").asc(), F.col("touch_id").asc()
    )
    w_all = Window.partitionBy(*keys, "conv_id")
    ranked = pairs.withColumn("touch_rank", F.row_number().over(w)).withColumn(
        "n_touches", F.count(F.lit(1)).over(w_all)
    )
    n = F.col("n_touches")
    r = F.col("touch_rank")
    if model == "linear":
        base = F.floor(F.lit(1_000_000) / n)
    else:
        mid = F.greatest(n - 2, F.lit(0))
        base = (
            F.when(n == 1, F.lit(1_000_000))
            .when((r == 1) | (r == n), F.when(n == 2, F.lit(500_000))
                  .otherwise(F.lit(400_000)))
            .otherwise(F.floor(F.lit(200_000) / mid))
        )
    # exact-sum invariant: the last touch absorbs the floor remainder
    others_sum = F.sum(F.when(r < n, base)).over(w_all)
    weight = F.when(
        r == n, F.lit(1_000_000) - F.coalesce(others_sum, F.lit(0))
    ).otherwise(base)
    return ranked.select(
        "conv_id", "touch_id", "n_touches", "touch_rank",
        weight.cast("long").alias("weight_ppm"),
    )
