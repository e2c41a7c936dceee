"""Leakage-free training-table construction (point-in-time features).

The step every ML-on-events pipeline gets wrong first: building a
training table where some feature silently peeks past the label
cutoff. The discipline here is explicit:

- ONE cutoff T splits time. Features aggregate STRICTLY ts <= T;
  labels come STRICTLY from (T, T + horizon]. Nothing else touches
  the clock.
- T and the horizon derive from the data's own span by integer
  arithmetic (deterministic, engine-replayable) or are passed in as
  epoch micros.

Reference parity: unitdb has no feature surface (SURVEY §2.4 — the
analytics extensions); the point-in-time rule matches what its
`?last=` cutoff semantics enforce for reads (query.go:61).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def training_table(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    label_type: str = "purchase",
    cutoff_ppm: int = 700_000,
    horizon_ppm: int = 150_000,
) -> DataFrame:
    """Point-in-time training table over an event log.

    The cutoff T sits ``cutoff_ppm`` of the way through the observed
    span (integer micros: T = mn + (mx−mn)·ppm div 10⁶); the label
    window is the following ``horizon_ppm`` of the span. Features are
    per-user aggregates over events with ts ≤ T ONLY:

        n_events, per-type counts (pivoted to fixed columns),
        cents (Σ value in exact cents), recency_s (T − last event),
        tenure_s (T − first event)

    and label = 1 iff the user has a ``label_type`` event inside
    (T, T + H]. Users with no pre-cutoff events produce NO row — a
    model can't score a user it has never seen (scoring-time parity).

    Everything is exact integer arithmetic; the only float column is
    none at all. Type pivot columns come from the PRE-CUTOFF data
    (sorted, so the schema is deterministic given the corpus).

    Output: (user id, n_events, n_<type>..., cents, recency_s,
    tenure_s, label).

    Scale: one filtered scan + per-user agg for features (map-side
    combined), one filtered scan + semi-join-shaped agg for labels;
    the pivot is over the type-cardinality relation. The cutoff is
    computed from a 1-row bounds agg (broadcast). At 100 TB both
    scans prune on the partition clock column — the same pushdown
    `?last=` rides.
    """
    if not (0 < cutoff_ppm < 1_000_000 and 0 < horizon_ppm
            and cutoff_ppm + horizon_ppm <= 1_000_000):
        raise ValueError("cutoff/horizon ppm must split the unit span")
    base = df.select(
        F.col(user_col).alias("_u"),
        F.unix_micros(F.col(ts_col)).alias("_t"),
        F.col(type_col).cast("string").alias("_ty"),
        F.expr(
            f"CAST(CAST({value_col} AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("_cents"),
    )
    bounds = base.agg(
        F.min("_t").alias("_mn"), F.max("_t").alias("_mx")
    ).select(
        "_mn", "_mx",
        (
            F.col("_mn")
            + F.expr(f"((_mx - _mn) * {int(cutoff_ppm)}) div 1000000")
        ).alias("_cut"),
        F.expr(f"((_mx - _mn) * {int(horizon_ppm)}) div 1000000").alias("_hz"),
    )
    wb = base.crossJoin(F.broadcast(bounds))
    pre = wb.filter(F.col("_t") <= F.col("_cut"))
    types = sorted(
        r["_ty"] for r in pre.select("_ty").distinct().collect()
    )
    feats = pre.groupBy("_u").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        *[
            F.count(F.when(F.col("_ty") == t, 1))
            .cast("long").alias(f"n_{t}")
            for t in types
        ],
        F.coalesce(F.sum("_cents"), F.lit(0)).cast("long").alias("cents"),
        F.first("_cut").alias("_cutv"),
        F.max("_t").alias("_last"),
        F.min("_t").alias("_first"),
    ).select(
        "*",
        # integer div, never a double quotient's knife-edge floor
        F.expr("CAST((_cutv - _last) div 1000000 AS BIGINT)")
        .alias("recency_s"),
        F.expr("CAST((_cutv - _first) div 1000000 AS BIGINT)")
        .alias("tenure_s"),
    )
    lab = (
        wb.filter(
            (F.col("_t") > F.col("_cut"))
            & (F.col("_t") <= F.col("_cut") + F.col("_hz"))
            & (F.col("_ty") == F.lit(label_type))
        )
        .select("_u")
        .distinct()
        .withColumn("label", F.lit(1))
    )
    return (
        feats.join(lab, "_u", "left")
        .select(
            F.col("_u").alias(user_col),
            "n_events", *[f"n_{t}" for t in types], "cents",
            "recency_s", "tenure_s",
            F.coalesce(F.col("label"), F.lit(0)).cast("int").alias("label"),
        )
    )
