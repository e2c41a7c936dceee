"""First-order Markov-chain analysis over per-key event sequences.

The events table is a stream of (user, ts, event_type); the natural
sequence question — "what does a user do NEXT after X?" — is a lag-1
self-pairing: order each user's events by time, pair each event with
its successor, and aggregate the (src, dst) transition counts into a
row-stochastic matrix. `funnel.top_paths` answers the *k-step prefix*
question; this module answers the *conditional next-step* question
(the transition matrix is the object you'd feed a next-event
recommender, a session simulator, or an anomaly scorer that flags
improbable transitions).

Spark shape: one partitioned window (lag over user, ordered by a
total order — parallel across users, never a global sort) and one
partial-agg shuffle on (src, dst). The matrix itself is
|states|² ≤ tiny, so every downstream consumer broadcasts it.

Determinism contract: the per-key order is (ts, tiebreak) — a total
order, so the lag pairing is unique; probabilities are floor-ppm
integers (same convention as the rest of the repo), so the DuckDB
oracle replays bitwise.

The reference engine has no sequence surface (opaque payloads,
db_internal.go:59-60); north-star analytics per the builder brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transition_counts(
    df: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Lag-1 transition counts per (src, dst) state pair.

    Each key's events are ordered by (ts, tiebreak) — callers must
    pass a tiebreak making the order total, else the pairing is
    ambiguous. The window is partitioned by ``key_col`` (parallel;
    per-task cost is the largest single key's event count — the same
    per-key bound as `window_agg.sessionize_ids`). The final
    transition count is NULL-free: the first event of each key has no
    predecessor and is dropped.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    paired = df.select(
        F.lag(F.col(state_col)).over(w).alias("src"),
        F.col(state_col).alias("dst"),
    ).filter(F.col("src").isNotNull())
    return paired.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def transition_matrix(
    df: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Row-stochastic transition matrix in floor-ppm.

    (src, dst, n, row_total, p_ppm) with
    p_ppm = floor(n * 1e6 / row_total) — integer arithmetic end to
    end. The row totals are a window over the counts relation
    (|states|² rows — tiny by construction), partitioned by src.
    """
    counts = transition_counts(df, key_col, state_col, ts_col, tiebreak_col)
    w_src = Window.partitionBy("src")
    return counts.select(
        "src",
        "dst",
        "n",
        F.sum("n").over(w_src).cast("long").alias("row_total"),
    ).select(
        "src",
        "dst",
        "n",
        "row_total",
        # exact integer `div` (not floor over a double '/'): stays
        # exact past the 2^53 double envelope
        F.expr("(n * 1000000L) div row_total")
        .cast("long")
        .alias("p_ppm"),
    )


def sequence_typicality(
    df: DataFrame,
    matrix: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per-key typicality of its own transition sequence under a
    (possibly other-cohort) transition matrix — the Markov anomaly
    surface: keys whose behaviour the matrix finds improbable.

    A true log-likelihood needs ln() — a transcendental whose floor
    boundaries the repo's cross-engine exactness rules forbid
    (driver-conventions: inject literal gain tables or stay integer).
    The matrix here is data-dependent, so no literal table exists at
    oracle-authoring time; instead the score stays in exact integer
    ppm space: sum, min and unseen-count of the per-transition
    probabilities. Low sum / low min / high unseen = anomalous, and
    every column is BIGINT so the oracle matches bitwise.

    The matrix side is broadcast (|states|² rows — never a shuffle).
    Output: (key, n_trans, sum_p_ppm, min_p_ppm, n_unseen).
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    paired = df.select(
        F.col(key_col).alias("k"),
        F.lag(F.col(state_col)).over(w).alias("src"),
        F.col(state_col).alias("dst"),
    ).filter(F.col("src").isNotNull())
    m = matrix.select("src", "dst", "p_ppm")
    scored = paired.join(F.broadcast(m), ["src", "dst"], "left")
    return scored.groupBy(F.col("k")).agg(
        F.count(F.lit(1)).cast("long").alias("n_trans"),
        F.sum(F.coalesce(F.col("p_ppm"), F.lit(0)))
        .cast("long")
        .alias("sum_p_ppm"),
        F.min(F.coalesce(F.col("p_ppm"), F.lit(0)))
        .cast("long")
        .alias("min_p_ppm"),
        F.sum(
            F.when(F.col("p_ppm").isNull(), F.lit(1)).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("n_unseen"),
    )


def transition_counts2(
    df: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Second-order transition counts: (prev2, prev1) -> current,
    from two lags over the SAME per-key window sort (one shuffle —
    Spark reuses the partitioned sort for both lag frames). The
    context relation is |states|³ — still broadcast-sized for any
    realistic state alphabet. First two events of each key drop
    (no full context)."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    paired = df.select(
        F.lag(F.col(state_col), 2).over(w).alias("src2"),
        F.lag(F.col(state_col), 1).over(w).alias("src1"),
        F.col(state_col).alias("dst"),
    ).filter(F.col("src2").isNotNull())
    return paired.groupBy("src2", "src1", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def transition_matrix2(
    df: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Row-stochastic second-order matrix in floor-ppm: context =
    (src2, src1). The order-2 vs order-1 probability gap is the
    sequence-memory signal (how much the next event depends on more
    than the last one)."""
    counts = transition_counts2(
        df, key_col, state_col, ts_col, tiebreak_col
    )
    w_ctx = Window.partitionBy("src2", "src1")
    return counts.select(
        "src2",
        "src1",
        "dst",
        "n",
        F.sum("n").over(w_ctx).cast("long").alias("ctx_total"),
    ).select(
        "src2",
        "src1",
        "dst",
        "n",
        "ctx_total",
        # exact integer `div` — see transition_matrix
        F.expr("(n * 1000000L) div ctx_total")
        .cast("long")
        .alias("p_ppm"),
    )


def stationary_distribution(
    matrix: DataFrame,
    iterations: int = 4,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Stationary distribution of a transition matrix by fixed-round
    power iteration in exact BIGINT fixed-point: pi_{k+1}(dst) =
    Σ_src pi_k(src) · p_ppm(src, dst) div 1e6, then L1-rescaled by
    the integer quotient q = max(1, total div scale) (the
    `hits_bipartite` trick — no decimal division, bitwise SQL
    replay). Starts uniform over the observed source states. The
    long-run share of time the chain spends in each state — the
    Markov family's closing number.

    Every relation is |states|-sized (control-plane); ``matrix`` is
    `transition_matrix` output (needs src, dst, p_ppm). States with
    no outgoing row leak mass by construction (p_ppm rows only) —
    with the lag-derived matrix every observed src has a row, so the
    leak is only the floor loss (< |states| ppm per step).

    Output: (state, pi) — fixed-point mass per state, total ~scale.
    """
    m = matrix.select("src", "dst", "p_ppm")
    states = m.select(F.col("src").alias("state")).distinct()
    n = states.count()
    if n == 0:
        raise ValueError("stationary_distribution: empty matrix")
    pi = states.withColumn(
        "pi", F.lit(int(scale) // n).cast("long")
    )
    for _ in range(iterations):
        nxt = (
            m.join(pi.withColumnRenamed("state", "src"), "src")
            .groupBy(F.col("dst").alias("state"))
            .agg(
                F.sum(
                    F.expr("(pi * p_ppm) div 1000000")
                )
                .cast("long")
                .alias("_raw")
            )
        )
        tot = nxt.agg(F.sum("_raw").cast("long").alias("_t"))
        pi = (
            nxt.crossJoin(F.broadcast(tot))
            .select(
                "state",
                F.expr(f"(_raw * {int(scale)}L) div greatest(1L, _t)")
                .cast("long")
                .alias("pi"),
            )
            .localCheckpoint(eager=False)
        )
    return pi


def entropy_rate(matrix: DataFrame, pi: DataFrame) -> DataFrame:
    """Entropy rate of the Markov chain (Shannon '48, eq. 7):

        H = Σ_src π(src) · H(src),   H(src) = −Σ_dst p log₂ p

    — the bits-per-event information density of the stream, the
    Markov family's single-number summary: a chain whose next event
    is predictable (low H) needs no per-event attention; rising H on
    a dashboard means behavior is genuinely changing, not just
    shifting between known patterns.

    ``matrix`` is `transition_matrix` output (src, dst, n,
    row_total); ``pi`` is `stationary_distribution` output (state,
    pi). Per-row log₂ uses the EXACT count rationals n/row_total
    (not the ppm-quantized p) — one round-6 log per (src, dst) TYPE,
    DECIMAL(18,6); per-src sums are exact decimal; each H(src) is
    floored to micro from one pinned double; the final weighting is
    exact integer products (DECIMAL(38,0) lift) with ONE pinned
    round-6 division.

    Output: (state, pi, h_micro, entropy_rate_r) — per-state
    conditional entropy plus the chain's (repeated) rate. States are
    the inner join of the π relation and the outgoing-transition
    relation (identical sets with the lag-derived matrix).

    Scale: every relation is |states|²-bounded (control-plane).
    """
    lg = F.round(
        F.log2(F.col("n").cast("double") / F.col("row_total").cast("double")),
        6,
    ).cast("decimal(18,6)")
    hs = (
        matrix.select("src", "n", "row_total", lg.alias("_lg"))
        .groupBy("src")
        .agg(
            F.max("row_total").cast("long").alias("_rt"),
            F.sum(F.col("n").cast("decimal(18,0)") * F.col("_lg"))
            .alias("_s"),
        )
    )
    hm = hs.select(
        "src",
        F.floor(
            (-F.col("_s").cast("double"))
            * F.lit(1_000_000.0)
            / F.col("_rt").cast("double")
        ).cast("long").alias("h_micro"),
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    j = pi.join(hm, pi["state"] == hm["src"]).select(
        "state", "pi", "h_micro"
    )
    tot = j.agg(
        F.sum(d38(F.col("pi")) * d38(F.col("h_micro"))).alias("_num"),
        F.sum("pi").cast("long").alias("_den"),
    )
    return j.join(F.broadcast(tot)).select(
        "state", "pi", "h_micro",
        F.round(
            F.col("_num").cast("double")
            / (F.col("_den").cast("double") * F.lit(1_000_000.0)),
            6,
        ).alias("entropy_rate_r"),
    )


def markov_attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    order_col: str,
    state_col: str,
    conv,
    iters: int = 40,
) -> DataFrame:
    """Markov removal-effect attribution (Anderl et al. 2014) — the
    DATA-DRIVEN credit assignment the positional models can't give:
    `multitouch_attribution` splits credit by rule (linear over the
    lookback); here each channel's credit is how much the corpus-wide
    conversion probability DROPS when journeys can no longer pass
    through it.

    Journeys: per user, the ``state_col`` sequence ordered by
    (ts, order_col) strictly BEFORE the first ``conv`` row, opened by
    the synthetic 'start' state and closed by the absorbing 'conv'
    (user converted) or 'null' terminal. First-order transition
    counts cnt(a→b) come from one partitioned lead window.

    Absorption: P(conv | a) is the fixpoint v(a) = Σ_b cnt(a,b)·
    val(b) div tot(a) with val(conv) = 10⁶, val(null) = 0 — iterated
    ``iters`` times from v = 0 in ppm fixed-point with truncating
    division (the pagerank discipline: monotone from below,
    deterministic, engine-replayable). The removal scenario for
    channel c forces val(c) = 0 — journeys entering c die, the
    standard removal semantics. All |channels|+1 scenarios solve
    jointly.

    The chain itself is a levels²-sized relation BY CONSTRUCTION
    (distinct journey states squared), so after the one corpus pass
    that builds the counts, the solve runs driver-side in exact
    Python integers — the sanctioned BPE pattern (collect a
    vocab-sized relation, never per-iteration Spark jobs). The
    collect is a bounded control-plane read, documented here.

    Output per channel: (channel, p_base_ppm, p_removed_ppm,
    removal_effect_ppm, share_ppm) — share = effect·10⁶ div
    Σ effects (NULL when no channel has any effect).

    Scale: the heavy work is the sequence window (partitioned by
    user) and one (a, b) count shuffle; everything after operates on
    the levels² relation. 100 TB note: journeys with millions of
    events per user would skew the window — cap per-user history
    upstream if that ever applies.
    """
    spark = df.sparkSession
    w = Window.partitionBy("_u").orderBy("_ts", "_o")
    seq = df.select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.col(order_col).alias("_o"),
        F.col(state_col).cast("string").alias("_s"),
        conv.cast("boolean").alias("_cv"),
    ).select("_u", "_s", "_cv", F.row_number().over(w).alias("_rn"))
    fb = (
        seq.filter(F.col("_cv"))
        .groupBy("_u")
        .agg(F.min("_rn").alias("_frn"))
    )
    users = seq.select("_u").distinct().join(fb, "_u", "left").select(
        "_u",
        F.when(F.col("_frn").isNotNull(), F.lit("conv"))
        .otherwise(F.lit("null")).alias("_t"),
        "_frn",
    )
    pre = (
        seq.join(fb, "_u", "left")
        .filter(F.col("_frn").isNull() | (F.col("_rn") < F.col("_frn")))
        .select("_u", "_s", "_rn")
    )
    aug = pre.unionByName(
        users.select("_u", F.lit("start").alias("_s"), F.lit(0).alias("_rn"))
    )
    w2 = Window.partitionBy("_u").orderBy("_rn")
    tr = (
        aug.select("_u", "_s", F.lead("_s").over(w2).alias("_nxt"))
        .join(users.select("_u", "_t"), "_u")
        .select(
            F.col("_s").alias("a"),
            F.coalesce(F.col("_nxt"), F.col("_t")).alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    # levels²-sized by construction: bounded control-plane read
    edges = [(r["a"], r["b"], int(r["cnt"])) for r in tr.collect()]
    tot: dict[str, int] = {}
    # out-edges indexed by source ONCE: each fixpoint iteration walks
    # every edge exactly once, not |states| x |edges| (the naive
    # rescan grows cubically in the state alphabet across removal
    # scenarios; same outputs, levels²-per-iteration cost)
    out: dict[str, list[tuple[str, int]]] = {}
    for a, b, c in edges:
        tot[a] = tot.get(a, 0) + c
        out.setdefault(a, []).append((b, c))
    channels = sorted(
        ({a for a, _, _ in edges} | {b for _, b, _ in edges})
        - {"start", "conv", "null"}
    )
    PPM = 1_000_000

    def solve(removed: str | None) -> int:
        v = {a: 0 for a in tot}
        for _ in range(int(iters)):
            nv = {}
            for a, outs in out.items():
                acc = 0
                for eb, c in outs:
                    if eb == "conv":
                        val = PPM
                    elif eb == "null" or eb == removed:
                        val = 0
                    else:
                        val = v.get(eb, 0)
                    acc += c * val
                nv[a] = acc // tot[a]
            v = nv
        return v.get("start", 0)

    base = solve(None)
    rows = []
    effects = {c: max(0, base - solve(c)) for c in channels}
    s_eff = sum(effects.values())
    for c in channels:
        rows.append(
            (
                c,
                base,
                base - effects[c],
                effects[c],
                effects[c] * PPM // s_eff if s_eff > 0 else None,
            )
        )
    return spark.createDataFrame(
        rows,
        "channel string, p_base_ppm long, p_removed_ppm long, "
        "removal_effect_ppm long, share_ppm long",
    )
