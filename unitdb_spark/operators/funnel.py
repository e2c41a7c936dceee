"""Ordered event funnels with completion windows.

The unconstrained funnel (`__spark_entry__.q_events_funnel`) asks "did
the user EVER do step k after step k-1"; real conversion questions are
time-bounded — "purchased within 72 h of the click". This operator
generalizes both: an ordered step list with an optional per-step
completion window.

Semantics: earliest-attempt chains (the product-analytics
convention) — t1 = the user's first step-1 event; t_k = the first
step-k event strictly after t_{k-1} (and within ``within_seconds`` of
it when bounded). Greedy-earliest is deterministic and SQL-replayable;
it is NOT maximal-completion (a later step-1 occurrence could enable
a chain the earliest one misses) — documented, standard, and the
variant every funnel dashboard actually computes.

Scale shape: per stage, one filter + one same-key join + one groupBy
min — every relation keyed by the user column, so at scale the whole
funnel is co-partitioned on one shuffle key and AQE reuses the
exchange; nothing is ever ordered globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_within(
    df: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: float | None = None,
) -> DataFrame:
    """Per-stage completion counts for the ordered ``steps``.

    ``within_seconds`` bounds EACH step relative to the previous one
    (None = unbounded, the classic funnel). Epoch comparison uses the
    double-cast convention shared with `sessionize_ids` (sub-second
    exact, oracle-replayable via epoch()).

    Output: (stage_n, stage, n_users), one row per step.
    """
    if not steps:
        raise ValueError("funnel_within: need at least one step")
    prev: DataFrame | None = None
    stage_frames: list[tuple[int, str, DataFrame]] = []
    for i, step in enumerate(steps, 1):
        cur = df.filter(F.col(type_col) == step).select(
            key_col, F.col(ts_col).alias("_ts")
        )
        if prev is not None:
            cur = cur.join(prev, key_col).filter(F.col("_ts") > F.col("_pt"))
            if within_seconds is not None:
                cur = cur.filter(
                    F.col("_ts").cast("double")
                    <= F.col("_pt").cast("double") + F.lit(float(within_seconds))
                )
            cur = cur.drop("_pt")
        cur = cur.groupBy(key_col).agg(F.min("_ts").alias("_pt"))
        stage_frames.append((i, step, cur))
        prev = cur
    out: DataFrame | None = None
    for i, step, s in stage_frames:
        row = s.agg(
            F.lit(i).alias("stage_n"),
            F.lit(step).alias("stage"),
            F.count(F.lit(1)).alias("n_users"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def top_paths(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    order_cols: list[str] | None = None,
    k_steps: int = 3,
    max_gap_s: int = 1800,
    min_support: int = 5,
) -> DataFrame:
    """Frequent k-step behavioral paths: consecutive event-type
    sequences per user where EVERY hop happens within ``max_gap_s``
    seconds — the open-ended cousin of the funnel (which checks one
    fixed path) and of the transition matrix (which stops at pairs).

    One window per user delivers all k−1 lags in a single sort; the
    gap guard uses exact epoch-microsecond integers, so session
    boundaries are engine-identical. Output: (step_1..step_k, n,
    share_ppm) for paths with support ≥ ``min_support``; share_ppm is
    the floor-ppm share among ALL complete gap-valid k-paths (the
    denominator the support threshold does not bias).

    Scale: one shuffle on the user key; path counting is a partial
    agg on the (tiny) path-label relation.
    """
    if k_steps < 2:
        raise ValueError("top_paths: k_steps must be >= 2")
    from pyspark.sql import Window

    order_cols = order_cols or []
    w = Window.partitionBy(user_col).orderBy(ts_col, *order_cols)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))  # exact integer
    cols = [F.col(type_col).alias(f"step_{k_steps}"),
            us.alias(f"_t{k_steps}")]
    for back in range(1, k_steps):
        cols.append(
            F.lag(type_col, back).over(w).alias(f"step_{k_steps - back}")
        )
        cols.append(
            F.lag(us, back).over(w).alias(f"_t{k_steps - back}")
        )
    lagged = df.select(*cols).filter(F.col("step_1").isNotNull())
    gap_ok = F.lit(True)
    for i in range(1, k_steps):
        gap_ok = gap_ok & (
            (F.col(f"_t{i + 1}") - F.col(f"_t{i}"))
            <= F.lit(max_gap_s * 1_000_000)
        )
    valid = lagged.filter(gap_ok)
    counts = valid.groupBy(
        *[f"step_{i}" for i in range(1, k_steps + 1)]
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").alias("_N"))
    return (
        counts.filter(F.col("n") >= min_support)
        .join(F.broadcast(tot))
        .select(
            *[f"step_{i}" for i in range(1, k_steps + 1)],
            "n",
            F.floor(F.col("n") * F.lit(1_000_000) / F.col("_N"))
            .cast("long").alias("share_ppm"),
        )
    )
