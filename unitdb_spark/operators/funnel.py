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


def shapley_attribution(
    df: DataFrame,
    conversion: str,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """EXACT Shapley-value channel attribution (Shapley '53 applied to
    multi-touch conversion credit, the coalition-game formulation of
    e.g. Zhao et al. '18): each non-conversion event type is a
    player, a user's coalition is the SET of channels they touched
    strictly before their first conversion (all their touches if they
    never convert), the characteristic function v(S) is the exact
    conversion rate (ppm) of users whose touched-set is EXACTLY S,
    and channel i's credit is the Shapley value

        φ_i = Σ_{S ∌ i} |S|!·(k−|S|−1)!/k! · (v(S∪{i}) − v(S)).

    The last-touch / linear heuristics (`q_events_multitouch`) answer
    "who was nearest the conversion"; Shapley answers "who MOVED the
    conversion rate", with the only symmetric, efficient, null-player
    credit assignment. Efficiency here: Σφ_i = (Σ_observed-S≠∅ terms)
    telescopes so that credits sum to v over the touched population
    minus the no-touch baseline — pinned by the unit tests.

    NO 2^k subset enumeration (the textbook form): with v(S) ≡ 0 for
    unobserved coalitions, split the sum per observed mask T —
        φ_scaled(i) = Σ_{T ∋ i} (|T|−1)!·(k−|T|)!·v(T)
                    − Σ_{S ∌ i} |S|!·(k−|S|−1)!·v(S)
    over OBSERVED masks only, so the plan is: one distinct-touch
    aggregation, one node... user-sized mask groupBy, then a
    (observed_masks × k channels) join against a broadcast channel
    relation — |masks| ≤ min(users, 2^k) rows, k rows broadcast.
    Arithmetic is exact integers end to end: v in floor-ppm,
    factorials via the engines' exact BIGINT factorial(), products in
    DECIMAL(38,0), final φ_ppm = floor-div by k!. Deterministic and
    bitwise SQL-replayable; unobserved-S v=0 is part of the pinned
    definition (the standard data-driven simplification).

    Scale: everything is keyed by user or by (mask ≤ 2^k); the only
    user-data shuffles are the distinct and the two groupBys. The
    channel list is a bounded control-plane read (≤ #event types —
    the centroid/vocab-cap idiom).

    Output: (channel, n_users_touched, shapley_ppm), one row per
    non-conversion channel, sorted by nothing (caller orders).
    """
    u = F.col(user_col)
    ev = df.select(
        u.alias("_u"),
        F.col(type_col).alias("_t"),
        F.col(ts_col).alias("_ts"),
    ).filter(F.col("_u").isNotNull() & F.col("_t").isNotNull())
    conv = (
        ev.filter(F.col("_t") == conversion)
        .groupBy("_u")
        .agg(F.min("_ts").alias("_cts"))
    )
    users = ev.select("_u").distinct().join(
        conv.select("_u", F.lit(1).alias("_conv")), "_u", "left"
    ).select("_u", F.coalesce("_conv", F.lit(0)).alias("_conv"))
    touches = (
        ev.filter(F.col("_t") != conversion)
        .join(conv, "_u", "left")
        .filter(F.col("_cts").isNull() | (F.col("_ts") < F.col("_cts")))
        .select("_u", "_t")
        .distinct()
    )
    # channel -> bit index: bounded control-plane read (#event types)
    chans = sorted(
        r["_t"] for r in touches.select("_t").distinct().collect()
    )
    k = len(chans)
    if k == 0:
        raise ValueError(
            "shapley_attribution: no non-conversion touches in the data"
        )
    if k > 20:
        # factorial(21) overflows BIGINT — Spark would return NULL
        # silently; with 2^20+ possible coalitions the exact game is
        # the wrong tool anyway (sample permutations instead).
        raise ValueError(
            f"shapley_attribution: {k} channels exceeds the exact "
            "BIGINT factorial bound (20)"
        )
    spark = df.sparkSession
    chan_df = spark.createDataFrame(
        [(c, 1 << i) for i, c in enumerate(chans)],
        "channel string, bit long",
    )
    masks = (
        users.join(
            touches.join(F.broadcast(chan_df), touches["_t"] == chan_df["channel"])
            .groupBy("_u")
            .agg(F.sum("bit").cast("long").alias("_mask")),
            "_u",
            "left",
        )
        .select("_u", "_conv", F.coalesce("_mask", F.lit(0)).alias("_mask"))
        .groupBy("_mask")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum("_conv").cast("long").alias("_c"),
        )
        .select(
            "_mask",
            "_n",
            F.expr("bit_count(_mask)").cast("int").alias("_pc"),
            F.expr("(_c * 1000000L) div _n").alias("_v_ppm"),
        )
    )
    terms = masks.crossJoin(F.broadcast(chan_df)).select(
        "channel",
        F.when((F.expr("_mask div bit") % 2) == 1, F.col("_n"))
        .otherwise(F.lit(0))
        .alias("_touched_n"),
        F.expr(
            f"""CASE WHEN (_mask div bit) % 2 = 1 THEN
                  CAST(factorial(_pc - 1) AS DECIMAL(38,0))
                  * factorial({k} - _pc) * _v_ppm
                ELSE
                  - CAST(factorial(_pc) AS DECIMAL(38,0))
                  * factorial({k} - _pc - 1) * _v_ppm
                END"""
        ).alias("_term"),
    )
    return terms.groupBy("channel").agg(
        F.sum("_touched_n").cast("long").alias("n_users_touched"),
        F.expr(
            f"CAST(SUM(_term) div CAST(factorial({k}) AS DECIMAL(38,0))"
            " AS BIGINT)"
        ).alias("shapley_ppm"),
    )
