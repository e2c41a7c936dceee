"""Poisson bootstrap — distribution-free confidence intervals that
survive 100 TB.

The classic bootstrap resamples n rows WITH replacement per replicate —
at cluster scale that is a B-fold shuffle of indexes against the
corpus. The Poisson bootstrap (Hanley & MacGibbon '06; Chamandy,
Muralidharan, Najmi & Naidu '12 — Google's "Estimating uncertainty for
massive data streams") replaces multinomial resampling with an
independent Poisson(1) weight per (row, replicate): a SINGLE pass, no
index joins, map-side-combinable partial sums, and the replicate count
distribution converges to the multinomial one at any realistic n.

Determinism contract (the repo's literal-table idiom): the Poisson(1)
inverse CDF is quantized ONCE in Python to ppm thresholds
(`POISSON1_PPM`, module import time, pure math) and injected as CASE
literals into BOTH engines; the uniform variate is the portable
`md5_int60(...) % 1e6`. No engine evaluates a transcendental, no RNG
state exists — the "random" weights are a pure function of
(row id, replicate, salt), so any engine replays them bitwise.

Reference parity: unitdb has no sampling/uncertainty surface at all
(Varz stops at counters/percentiles, server/varz.go); this is SURVEY
§2.4 experiment-review machinery.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from unitdb_spark.functions.portable_hash import md5_int60

_PPM = 1_000_000


def _poisson1_ppm_thresholds(kmax: int = 9) -> list[int]:
    """Cumulative Poisson(1) CDF at k = 0..kmax−1, floored to ppm.

    P(K ≥ kmax) ≈ 1.1e-7 for kmax = 9 — below ppm resolution, so the
    ELSE arm (weight kmax) is reachable only by the thresholds' own
    quantization and the weight distribution is ppm-exact.
    """
    out, acc, term = [], 0.0, math.exp(-1.0)
    for k in range(kmax):
        acc += term
        out.append(math.floor(acc * _PPM))
        term /= k + 1
    return out


#: Poisson(1) inverse-CDF table in ppm — THE shared literal source:
#: the Spark CASE and every DuckDB oracle must be built from this list
#: (single point of truth, same discipline as md5_int60).
POISSON1_PPM = _poisson1_ppm_thresholds()


def poisson_weight(u_ppm) -> F.Column:
    """Poisson(1) weight from a uniform ppm variate via the shared
    literal threshold table (smallest k with u < cdf[k])."""
    expr = F.lit(len(POISSON1_PPM))
    for k in range(len(POISSON1_PPM) - 1, -1, -1):
        expr = F.when(u_ppm < F.lit(POISSON1_PPM[k]), F.lit(k)).otherwise(
            expr
        )
    return expr


def poisson_weight_sql(u_expr: str) -> str:
    """The identical weight as DuckDB SQL, built from the same table."""
    arms = " ".join(
        f"WHEN {u_expr} < {t} THEN {k}"
        for k, t in enumerate(POISSON1_PPM)
    )
    return f"CASE {arms} ELSE {len(POISSON1_PPM)} END"


def bootstrap_partials(
    df: DataFrame,
    group_col: str,
    id_col: str,
    cents_col: str,
    b: int = 40,
    salt: str = "pb",
) -> DataFrame:
    """The bootstrap's MERGEABLE layer: per-(group, replicate) partial
    sums (_g, _b, _s, _wn), where replicate 0 carries identity
    weights (the full sample) and replicates 1..B carry the
    deterministic Poisson(1) weights. Partials from any row split
    merge by SUM — the property the streaming twin commits on — and
    `bootstrap_finish` turns the merged relation into the CI report.

    Products lift to DECIMAL(38,0) before summing: at the
    billions-of-rows envelope Σ w·cents wraps int64 silently in Spark
    while DuckDB promotes (gate divergence).
    """
    base = df.select(
        F.col(group_col).alias("_g"),
        F.col(id_col).cast("string").alias("_id"),
        F.col(cents_col).cast("long").alias("_c"),
    ).filter(F.col("_c").isNotNull())
    reps = base.sparkSession.range(0, int(b) + 1).select(
        F.col("id").cast("long").alias("_b")
    )
    u = (
        md5_int60(
            F.concat(
                F.col("_id"), F.lit(":"),
                F.col("_b").cast("string"), F.lit(":" + salt),
            )
        )
        % _PPM
    )
    w = F.when(F.col("_b") == 0, F.lit(1)).otherwise(poisson_weight(u))
    weighted = base.crossJoin(F.broadcast(reps)).select(
        "_g", "_b", "_c", w.cast("long").alias("_w")
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    return weighted.groupBy("_g", "_b").agg(
        F.sum(d38(F.col("_w")) * d38(F.col("_c"))).alias("_s"),
        F.sum("_w").cast("long").alias("_wn"),
    )


def bootstrap_finish(
    partials: DataFrame,
    group_col: str,
    tail_permille: int = 25,
) -> DataFrame:
    """CI report from the (merged) partial-sum relation: replicate
    means are floor((Σw·cents)·1e6 / Σw) — ONE pinned double each,
    integer after — and the bounds are order statistics over the B
    integer means (positions floor(B·tail‰)+1 / B − floor(B·tail‰),
    drop-a-tail, deterministic (mean, b) tie order). Replicate 0 IS
    the full sample, so n and mean_e6 come from the same formula.
    Zero-weight replicates (probability e^-n) are excluded; `b_eff`
    reports survivors.

    Output: (group, n, b_eff, mean_e6, lo_e6, hi_e6).
    """
    mean_of = F.floor(
        F.col("_s").cast("double")
        * F.lit(1_000_000.0)
        / F.col("_wn").cast("double")
    ).cast("long")
    sums = (
        partials.filter((F.col("_b") >= 1) & (F.col("_wn") > 0))
        .select("_g", "_b", mean_of.alias("_m"))
    )
    wo = Window.partitionBy("_g").orderBy("_m", "_b")
    wg = Window.partitionBy("_g")
    ranked = sums.select(
        "_g", "_m",
        F.row_number().over(wo).alias("_rn"),
        F.count(F.lit(1)).over(wg).alias("b_eff"),
    )
    lo_pos = F.floor(F.col("b_eff") * tail_permille / 1000) + 1
    hi_pos = F.col("b_eff") - F.floor(F.col("b_eff") * tail_permille / 1000)
    bounds = ranked.groupBy("_g").agg(
        F.max("b_eff").cast("long").alias("b_eff"),
        F.max(F.when(F.col("_rn") == lo_pos, F.col("_m"))).alias("lo_e6"),
        F.max(F.when(F.col("_rn") == hi_pos, F.col("_m"))).alias("hi_e6"),
    )
    full = partials.filter(F.col("_b") == 0).select(
        "_g",
        F.col("_wn").alias("n"),
        mean_of.alias("mean_e6"),
    )
    return full.join(bounds, "_g").select(
        F.col("_g").alias(group_col),
        "n", "b_eff", "mean_e6", "lo_e6", "hi_e6",
    )


def poisson_bootstrap_ci(
    df: DataFrame,
    group_col: str,
    id_col: str,
    cents_col: str,
    b: int = 40,
    tail_permille: int = 25,
    salt: str = "pb",
) -> DataFrame:
    """Per-group percentile bootstrap CI for the mean, via B Poisson
    replicates: `bootstrap_partials` (the mergeable layer) composed
    with `bootstrap_finish` (the order-statistic report) — the same
    two stages the streaming twin commits and reads.

    Scale: the ×(B+1) fan-out happens AFTER row projection to
    (group, id, cents) and aggregates map-side into (B+1)×groups
    partial sums — no index join, no corpus shuffle; the
    order-statistic window is over B rows per group (control-plane
    sized). B is the explicit cost knob; at extreme scale drop B,
    not rows.
    """
    return bootstrap_finish(
        bootstrap_partials(df, group_col, id_col, cents_col, b, salt),
        group_col,
        tail_permille,
    )
