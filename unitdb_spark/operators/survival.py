"""Kaplan-Meier survival estimation over DataFrames.

Time-to-event questions (signup → first conversion, first touch →
churn) need censoring-aware estimates — a plain mean of observed
durations is biased the moment any subject hasn't converted yet. The
KM product-limit estimator is the standard answer; here it reduces to
one per-subject aggregation plus arithmetic on the DAY relation, which
is bounded by the observation span (≤ a few hundred rows) no matter
how many subjects flow in.

Cross-engine determinism: the survival product is sequential by
nature, so instead of a float cumulative product (whose exp/sum(ln)
replay is order- and libm-sensitive) the curve is computed in EXACT
integer fixed-point: s₀ = 1e12, sᵢ = ⌊sᵢ₋₁·(nᵢ−dᵢ)/nᵢ⌋ — a recursion
both engines replay bit-for-bit (DuckDB via a recursive CTE, Spark
via an arbitrary-precision Python fold over the tiny step relation).

Reference parity: unitdb has no survival surface (its analytics stop
at Varz counters, /root/reference/server/varz.go:140); this extends
SURVEY §2.4's experiment-review family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SCALE = 10**12

_OUT_SCHEMA = (
    "t_day long, n_risk long, d long, c long, surv_e12 long"
)


def kaplan_meier(
    df: DataFrame, duration_col: str, event_col: str
) -> DataFrame:
    """Product-limit survival curve from per-subject rows.

    Input: one row per subject with an integer duration (days until
    event or censoring) and a boolean event flag (True = event
    observed, False = right-censored). Output: one row per EVENT time
    (standard KM support) with the at-risk count, events d, censored
    c at that time, and the fixed-point survival
    ``surv_e12 = ⌊s·(n−d)/n⌋`` folded over prior steps (1e12 = 1.0).

    Shuffle budget: the subject relation aggregates once onto the day
    relation (≤ observation-span rows); the at-risk counts are a
    cumulative window over that tiny relation, and the sequential
    fold runs in ONE applyInPandas task over the step rows — a few
    hundred integers, regardless of subject count.
    """
    days = (
        df.select(
            F.col(duration_col).cast("long").alias("t"),
            F.col(event_col).cast("boolean").alias("_e"),
        )
        .groupBy("t")
        .agg(
            F.count(F.when(F.col("_e"), 1)).alias("d"),
            F.count(F.when(~F.col("_e"), 1)).alias("c"),
        )
    )
    # at risk at t = subjects whose duration >= t: cumulative sum over
    # the day relation from the LARGEST duration down
    w = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = days.select(
        "t", "d", "c",
        F.sum(F.col("d") + F.col("c")).over(w).alias("n_risk"),
    )
    steps = risk.filter(F.col("d") > 0).select("t", "n_risk", "d", "c")

    def fold(pdf):
        import pandas as pd

        pdf = pdf.sort_values("t")
        s = _SCALE
        out = []
        for r in pdf.itertuples(index=False):
            # python ints: exact at any magnitude
            n, d = int(r.n_risk), int(r.d)
            s = s * (n - d) // n
            out.append((int(r.t), n, d, int(r.c), s))
        return pd.DataFrame(
            out, columns=["t_day", "n_risk", "d", "c", "surv_e12"]
        )

    return (
        steps.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(fold, _OUT_SCHEMA)
    )


def time_to_event(
    df: DataFrame,
    subject_col: str,
    ts_col: str,
    origin_filter,
    event_filter,
) -> DataFrame:
    """Per-subject (duration, event) rows for `kaplan_meier`.

    Origin = the subject's FIRST row matching ``origin_filter``;
    event = the first row matching ``event_filter`` STRICTLY after the
    origin. Subjects without an event are right-censored at the corpus
    max timestamp. Durations are whole days between the DATE parts
    (engine-portable datediff).

    Output: (subject, duration_days, event). Two aggregations on the
    subject key + a broadcast 1-row corpus max.
    """
    base = df.select(
        F.col(subject_col).alias("_s"),
        F.col(ts_col).cast("timestamp").alias("_ts"),
        origin_filter.alias("_is_o"),
        event_filter.alias("_is_e"),
    )
    org = (
        base.filter(F.col("_is_o"))
        .groupBy("_s")
        .agg(F.min("_ts").alias("_t0"))
    )
    ev = (
        base.filter(F.col("_is_e"))
        .join(org, "_s")
        .filter(F.col("_ts") > F.col("_t0"))
        .groupBy("_s")
        .agg(F.min("_ts").alias("_tc"))
    )
    mx = base.agg(F.max("_ts").alias("_mx"))
    return (
        org.join(ev, "_s", "left")
        .join(F.broadcast(mx))
        .select(
            F.col("_s").alias("subject"),
            F.when(
                F.col("_tc").isNotNull(),
                F.datediff(F.to_date("_tc"), F.to_date("_t0")),
            )
            .otherwise(F.datediff(F.to_date("_mx"), F.to_date("_t0")))
            .cast("long")
            .alias("duration_days"),
            F.col("_tc").isNotNull().alias("event"),
        )
    )


def logrank_test(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    arm_col,
) -> DataFrame:
    """One-row log-rank (Mantel-Cox) test between two arms — the
    survival family's hypothesis test: does arm 0 convert/churn on a
    different time curve than arm 1, accounting for censoring? The
    whole-curve complement of `kaplan_meier`'s point estimates, and
    the censoring-aware cousin of `mann_whitney_u`.

    At each pooled event time t (d_t > 0):

        E1 += d_t · n1_t / n_t
        V  += d_t · n1_t · n2_t · (n_t − d_t) / (n_t² · (n_t − 1))

    with the at-risk counts n1/n2 from per-arm descending cumulative
    sums over the pooled DAY relation. Each per-time term is ONE
    pinned double floored into micro-units (the chi-squared
    discipline), so the accumulations are exact BIGINT sums; the
    z-statistic (O1 − E1)/√V is the single pinned float finish, NULL
    when V = 0. Double-exactness envelope: d·n1·n2·n products must
    stay inside 2⁵³ — fine to ~10⁵ subjects per time; past that lift
    the products to DECIMAL(38,0) in the same pinned shape.

    ``arm_col`` is a 0/1 column expression (hash-assign units like
    `ab_test_report`).

    Output: (n_a, n_b, o1, o2, e1_micro, v_micro, z_r).

    Scale: one subject aggregation onto the pooled day relation
    (≤ observation-span rows); the at-risk windows run over that tiny
    relation (the `events_survival` allowlist class).
    """
    base = df.select(
        F.col(duration_col).cast("long").alias("_t"),
        F.col(event_col).cast("boolean").alias("_e"),
        arm_col.cast("int").alias("_a"),
    ).filter(F.col("_t").isNotNull() & F.col("_a").isNotNull())
    days = base.groupBy("_t").agg(
        F.count(F.when(F.col("_e") & (F.col("_a") == 0), 1)).alias("d1"),
        F.count(F.when(~F.col("_e") & (F.col("_a") == 0), 1)).alias("c1"),
        F.count(F.when(F.col("_e") & (F.col("_a") == 1), 1)).alias("d2"),
        F.count(F.when(~F.col("_e") & (F.col("_a") == 1), 1)).alias("c2"),
    )
    w = Window.orderBy(F.col("_t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = days.select(
        "_t", "d1", "d2",
        F.sum(F.col("d1") + F.col("c1")).over(w).alias("n1"),
        F.sum(F.col("d2") + F.col("c2")).over(w).alias("n2"),
    )
    steps = risk.filter(F.col("d1") + F.col("d2") > 0)
    d = (F.col("d1") + F.col("d2")).cast("double")
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    nd = (F.col("n1") + F.col("n2")).cast("double")
    e1m = F.floor(d * n1d * F.lit(1_000_000.0) / nd).cast("long")
    vm = F.when(
        F.col("n1") + F.col("n2") > 1,
        F.floor(
            d * n1d * n2d * (nd - d) * F.lit(1_000_000.0)
            / (nd * nd * (nd - F.lit(1.0)))
        ).cast("long"),
    ).otherwise(F.lit(0))
    per = steps.select(
        "d1", "d2", e1m.alias("_e1m"), vm.alias("_vm")
    )
    arms = base.agg(
        F.count(F.when(F.col("_a") == 0, 1)).cast("long").alias("n_a"),
        F.count(F.when(F.col("_a") == 1, 1)).cast("long").alias("n_b"),
    )
    acc = per.agg(
        F.coalesce(F.sum("d1"), F.lit(0)).cast("long").alias("o1"),
        F.coalesce(F.sum("d2"), F.lit(0)).cast("long").alias("o2"),
        F.coalesce(F.sum("_e1m"), F.lit(0)).cast("long").alias("e1_micro"),
        F.coalesce(F.sum("_vm"), F.lit(0)).cast("long").alias("v_micro"),
    )
    z = (
        (
            F.col("o1").cast("double")
            - F.col("e1_micro").cast("double") / F.lit(1_000_000.0)
        )
        / F.sqrt(F.col("v_micro").cast("double") / F.lit(1_000_000.0))
    )
    return arms.join(acc).select(
        "n_a", "n_b", "o1", "o2", "e1_micro", "v_micro",
        F.when(F.col("v_micro") > 0, F.round(z, 6)).alias("z_r"),
    )


def cox_score_test(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    x_col: str,
) -> DataFrame:
    """One-row Cox proportional-hazards SCORE test at β = 0 (Breslow
    tie handling) for an integer covariate — the CONTINUOUS-covariate
    generalization of `logrank_test` (which is this test for a 0/1
    x): does higher x come with faster event occurrence, accounting
    for censoring, without fitting the full partial likelihood (the
    score test needs no iteration, so it stays one aggregation pass —
    the standard screening statistic; fitted-β estimation is the
    documented iterative extension, out of one-pass scope).

    ``x_col`` must be an exact NON-NEGATIVE integer (keeps every
    floor division on non-negative operands — the cross-engine
    negative-division trap never arises). At each event day t with
    d_t events, risk set R(t) = subjects with duration ≥ t:

        u_t = Sx_ev(t)·1e6 − d_t · ⌊Sx_R(t)·1e6 / n_R(t)⌋
        v_t = d_t · ( ⌊Sxx_R(t)·1e6 / n_R(t)⌋
                      − ⌊Sx_R(t)²·1e6 / n_R(t)²⌋ )

    — every term an EXACT integer (DECIMAL(38,0) lifts before the
    products; no float until the end), v_t ≥ 0 by floor monotonicity
    over Cauchy-Schwarz. U = Σu_t, V = Σv_t;
    z = (U/1e6)/√(V/1e6) is the single pinned float finish (NULL
    when V = 0 — a constant covariate is reported, not divided by).

    Output: (n_subjects, n_events, u_micro, v_micro, z_r). Positive
    z = higher x, higher hazard (earlier events).

    Scale: one subject aggregation onto the pooled DAY relation; the
    at-risk sums are descending cumulative windows over that tiny
    relation (the `events_survival` allowlist class); x/x² partial
    sums are map-side combined.
    """
    base = df.select(
        F.col(duration_col).cast("long").alias("_t"),
        F.col(event_col).cast("boolean").alias("_e"),
        F.col(x_col).cast("long").alias("_x"),
    ).filter(F.col("_t").isNotNull() & (F.col("_x") >= 0))
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    days = base.groupBy("_t").agg(
        F.count(F.lit(1)).alias("a_t"),
        F.count(F.when(F.col("_e"), 1)).alias("d_t"),
        F.sum(F.when(F.col("_e"), F.col("_x")).otherwise(F.lit(0)))
        .alias("sx_ev"),
        F.sum("_x").alias("sx_all"),
        F.sum(d38(F.col("_x")) * d38(F.col("_x"))).alias("sxx_all"),
    )
    w = Window.orderBy(F.col("_t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = days.select(
        "_t", "d_t", "sx_ev",
        F.sum("a_t").over(w).alias("n_r"),
        F.sum("sx_all").over(w).alias("sx_r"),
        F.sum("sxx_all").over(w).alias("sxx_r"),
    )
    steps = risk.filter(F.col("d_t") > 0)
    terms = steps.select(
        F.expr(
            "CAST(sx_ev AS DECIMAL(38,0)) * 1000000"
            " - CAST(d_t AS DECIMAL(38,0))"
            "   * ((CAST(sx_r AS DECIMAL(38,0)) * 1000000) div n_r)"
        ).alias("_u"),
        F.expr(
            "CAST(d_t AS DECIMAL(38,0)) * ("
            " (CAST(sxx_r AS DECIMAL(38,0)) * 1000000) div n_r"
            " - (CAST(sx_r AS DECIMAL(38,0)) * sx_r * 1000000)"
            "   div (CAST(n_r AS DECIMAL(38,0)) * n_r))"
        ).alias("_v"),
    )
    subj = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_subjects"),
        F.count(F.when(F.col("_e"), 1)).cast("long").alias("n_events"),
    )
    acc = terms.agg(
        F.coalesce(F.sum("_u"), F.lit(0)).cast("long").alias("u_micro"),
        F.coalesce(F.sum("_v"), F.lit(0)).cast("long").alias("v_micro"),
    )
    z = (
        F.col("u_micro").cast("double") / F.lit(1_000_000.0)
    ) / F.sqrt(F.col("v_micro").cast("double") / F.lit(1_000_000.0))
    return subj.join(F.broadcast(acc)).select(
        "n_subjects", "n_events", "u_micro", "v_micro",
        F.when(F.col("v_micro") > 0, F.round(z, 6)).alias("z_r"),
    )


def km_greenwood(
    df: DataFrame, duration_col: str, event_col: str
) -> DataFrame:
    """Kaplan-Meier curve WITH the Greenwood standard error — the
    CI-ready reading of `kaplan_meier` (a survival point estimate
    without its uncertainty band is half a tool): alongside the
    fixed-point survival fold, the fold accumulates Greenwood's
    cumulative variance term

        g_t = Σ_{t'≤t} ⌊d·1e12 / (n·(n−d))⌋        (exact integers)

    and emits se_r = round(S(t)·√(g_t/1e12), 6) — ONE pinned float
    per step; Var[S] = S²·g is Greenwood (1926). When a step exhausts
    the risk set (n = d, S hits 0) the term is undefined — g and se
    are NULL from that step on (reported, not fabricated).

    Deliberately a STANDALONE fold rather than a flag on
    `kaplan_meier`: that operator feeds the live driver-window twin
    (streamed_survival) and stays byte-frozen; this one adds columns.

    Output: kaplan_meier's rows + (g_e12, se_r).

    Scale: identical to `kaplan_meier` — one subject aggregation onto
    the day relation, cumulative window over it, ONE applyInPandas
    task over the few-hundred-row step relation.
    """
    days = (
        df.select(
            F.col(duration_col).cast("long").alias("t"),
            F.col(event_col).cast("boolean").alias("_e"),
        )
        .groupBy("t")
        .agg(
            F.count(F.when(F.col("_e"), 1)).alias("d"),
            F.count(F.when(~F.col("_e"), 1)).alias("c"),
        )
    )
    w = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = days.select(
        "t", "d", "c",
        F.sum(F.col("d") + F.col("c")).over(w).alias("n_risk"),
    )
    steps = risk.filter(F.col("d") > 0).select("t", "n_risk", "d", "c")

    def fold(pdf):
        import pandas as pd

        pdf = pdf.sort_values("t")
        s = _SCALE
        g = 0
        out = []
        for r in pdf.itertuples(index=False):
            n, d = int(r.n_risk), int(r.d)
            s = s * (n - d) // n
            if g is not None and n > d:
                g = g + d * _SCALE // (n * (n - d))
            else:
                g = None
            out.append((int(r.t), n, d, int(r.c), s, g))
        return pd.DataFrame(
            out,
            columns=["t_day", "n_risk", "d", "c", "surv_e12", "g_e12"],
        )

    folded = (
        steps.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(
            fold,
            "t_day long, n_risk long, d long, c long, surv_e12 long, "
            "g_e12 long",
        )
    )
    # the fold stays pure-integer; the ONE pinned float (JVM round,
    # half-up — the engine-portable mode) happens here
    se = F.round(
        (F.col("surv_e12").cast("double") / F.lit(1e12))
        * F.sqrt(F.col("g_e12").cast("double") / F.lit(1e12)),
        6,
    )
    return folded.select(
        "t_day", "n_risk", "d", "c", "surv_e12", "g_e12",
        F.when(F.col("g_e12").isNotNull(), se).alias("se_r"),
    )


def nelson_aalen(
    df: DataFrame, duration_col: str, event_col: str
) -> DataFrame:
    """Nelson-Aalen cumulative hazard — the ADDITIVE sibling of
    `kaplan_meier`'s multiplicative survival fold (H(t) = Σ d/n; the
    estimator of choice when hazard RATES, not survival fractions,
    are the deliverable, and the better-behaved one in small risk
    sets). Because the fold is a SUM, no sequential product is needed
    at all: per-step terms quantize to exact e12 integers

        h_term = ⌊d·1e12 / n⌋        v_term = ⌊d·1e12 / n²⌋

    and one cumulative window adds them (integer sums are order-free
    — this estimator needs no applyInPandas fold, unlike KM). The
    variance is Aalen's Σ d/n²; se_r = round(√(v/1e12), 6) is the one
    pinned float per step.

    Output: (t_day, n_risk, d, c, hazard_e12, var_e12, se_r).

    Scale: the `kaplan_meier` shape — one subject aggregation onto
    the per-day event-time relation, two cumulative windows over it
    (the events_survival bounded class).
    """
    days = (
        df.select(
            F.col(duration_col).cast("long").alias("t"),
            F.col(event_col).cast("boolean").alias("_e"),
        )
        .groupBy("t")
        .agg(
            F.count(F.when(F.col("_e"), 1)).alias("d"),
            F.count(F.when(~F.col("_e"), 1)).alias("c"),
        )
    )
    w = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = days.select(
        "t", "d", "c",
        F.sum(F.col("d") + F.col("c")).over(w).alias("n_risk"),
    )
    steps = risk.filter(F.col("d") > 0).selectExpr(
        "t", "n_risk", "d", "c",
        "CAST((CAST(d AS DECIMAL(38,0)) * 1000000000000)"
        " div n_risk AS BIGINT) AS h_term",
        "CAST((CAST(d AS DECIMAL(38,0)) * 1000000000000)"
        " div (CAST(n_risk AS DECIMAL(38,0)) * n_risk) AS BIGINT)"
        " AS v_term",
    )
    wa = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = steps.select(
        F.col("t").alias("t_day"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("d"),
        F.col("c").cast("long").alias("c"),
        F.sum("h_term").over(wa).cast("long").alias("hazard_e12"),
        F.sum("v_term").over(wa).cast("long").alias("var_e12"),
    )
    return out.selectExpr(
        "t_day", "n_risk", "d", "c", "hazard_e12", "var_e12",
        "round(sqrt(CAST(var_e12 AS DOUBLE) / 1000000000000.0), 6)"
        " AS se_r",
    )
