"""Data profiling: one-pass per-column statistics for any table.

The reference has no profiling surface (its introspection stops at
``Varz`` counters, reference: db.go:454-472); a training-data pipeline
needs a cheap "what is in this table" pass before heavier operators —
null rates decide filters, distinct counts decide join strategies and
salting, min/max bounds decide partition layouts.

Spark-first shape: ONE aggregation over the table computes every
column's stats (count/nulls/distinct/min/max) in a single scan, then a
``stack`` unpivot turns the one wide row into one row per column — the
unpivot runs on a single row, so its cost is zero. Min/max land in a
typed slot (numeric → double, string → string, timestamp → epoch
seconds) instead of a stringly-typed union, so results are exact and
engine-portable (no float-rendering drift between engines).

Scale: with ``exact_distinct=True`` Spark plans the multi-column
COUNT(DISTINCT) via an Expand (rows × distinct-columns, one shuffle)
— fine up to mid scale but the expand multiplies the shuffle by the
number of profiled columns. At 100 TB pass ``exact_distinct=False``:
``approx_count_distinct`` (HLL++) keeps the plan a plain single-pass
partial agg with no Expand and ~0.6 KB of state per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def table_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Profile ``columns`` (default: all) in one scan.

    Returns one row per column:
    ``column, n_rows, n_nonnull, n_distinct, min_num, max_num,
    min_str, max_str, min_ts_s, max_ts_s`` — the min/max slot that
    doesn't apply to the column's type is NULL.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = columns if columns is not None else list(fields)
    unknown = [c for c in cols if c not in fields]
    if unknown:
        raise ValueError(f"unknown columns: {unknown}")

    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        dt = fields[c]
        aggs.append(F.count(c).alias(f"__nn_{c}"))
        if exact_distinct:
            aggs.append(F.countDistinct(c).alias(f"__nd_{c}"))
        else:
            aggs.append(F.approx_count_distinct(c).alias(f"__nd_{c}"))
        if isinstance(dt, _NUMERIC):
            aggs.append(F.min(c).cast("double").alias(f"__mn_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"__mx_{c}"))
        elif isinstance(dt, T.TimestampType):
            aggs.append(F.unix_timestamp(F.min(c)).alias(f"__mn_{c}"))
            aggs.append(F.unix_timestamp(F.max(c)).alias(f"__mx_{c}"))
        elif isinstance(dt, T.StringType):
            aggs.append(F.min(c).alias(f"__mn_{c}"))
            aggs.append(F.max(c).alias(f"__mx_{c}"))
        else:
            # opaque types (binary, array, struct): presence stats only
            aggs.append(F.lit(None).alias(f"__mn_{c}"))
            aggs.append(F.lit(None).alias(f"__mx_{c}"))
    wide = df.agg(*aggs)

    def slot(c: str, kind: str, field: str):
        dt = fields[c]
        is_num = isinstance(dt, _NUMERIC)
        is_ts = isinstance(dt, T.TimestampType)
        is_str = isinstance(dt, T.StringType)
        want = {"num": is_num, "ts": is_ts, "str": is_str}[kind]
        if not want:
            return "CAST(NULL AS DOUBLE)" if kind == "num" else (
                "CAST(NULL AS BIGINT)" if kind == "ts" else "CAST(NULL AS STRING)"
            )
        cast = {"num": "DOUBLE", "ts": "BIGINT", "str": "STRING"}[kind]
        return f"CAST(`__{field}_{c}` AS {cast})"

    rows = ", ".join(
        f"'{c}', CAST(`__nn_{c}` AS BIGINT), CAST(`__nd_{c}` AS BIGINT), "
        f"{slot(c, 'num', 'mn')}, {slot(c, 'num', 'mx')}, "
        f"{slot(c, 'str', 'mn')}, {slot(c, 'str', 'mx')}, "
        f"{slot(c, 'ts', 'mn')}, {slot(c, 'ts', 'mx')}"
        for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {rows}) AS (column, n_nonnull, n_distinct, "
        "min_num, max_num, min_str, max_str, min_ts_s, max_ts_s)",
        "CAST(`__n_rows` AS BIGINT) AS n_rows",
    ).select(
        "column", "n_rows", "n_nonnull", "n_distinct",
        "min_num", "max_num", "min_str", "max_str", "min_ts_s", "max_ts_s",
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Reconciliation between two snapshots of one logical table: per
    compared column plus the row-level summary, how many keys were
    added, removed, or changed — the audit a backfill/migration runs
    before swapping tables.

    One full-outer join on the key; presence flags and per-column
    null-safe inequality counts fold into a single aggregation over
    the joined relation (one scan each side, one shuffle on the key).
    Exact integer counts.

    Output rows: ('_rows', n_added, n_removed, n_changed) + one
    ('col', 0, 0, n_changed) per compared column — n_changed counting
    keys present on BOTH sides whose value differs (null-safe).
    """
    o = old.select(
        *[F.col(c).alias(f"_k_{c}") for c in key_cols],
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        *[F.col(c).alias(f"_k_{c}") for c in key_cols],
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
        F.lit(1).alias("_in_new"),
    )
    j = o.join(n, [f"_k_{c}" for c in key_cols], "full_outer")
    both = F.col("_in_old").isNotNull() & F.col("_in_new").isNotNull()
    col_changed = {
        c: both & ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
        for c in compare_cols
    }
    any_changed = None
    for expr in col_changed.values():
        any_changed = expr if any_changed is None else (any_changed | expr)
    aggs = [
        F.count(F.when(F.col("_in_old").isNull(), 1)).alias("n_added"),
        F.count(F.when(F.col("_in_new").isNull(), 1)).alias("n_removed"),
        F.count(F.when(any_changed, 1)).alias("n_changed_rows"),
    ] + [
        F.count(F.when(col_changed[c], 1)).alias(f"n_ch_{c}")
        for c in compare_cols
    ]
    wide = j.agg(*aggs)
    rows = F.array(
        F.struct(
            F.lit("_rows").alias("entity"),
            F.col("n_added").alias("n_added"),
            F.col("n_removed").alias("n_removed"),
            F.col("n_changed_rows").alias("n_changed"),
        ),
        *[
            F.struct(
                F.lit(c).alias("entity"),
                F.lit(0).cast("long").alias("n_added"),
                F.lit(0).cast("long").alias("n_removed"),
                F.col(f"n_ch_{c}").alias("n_changed"),
            )
            for c in compare_cols
        ],
    )
    return wide.select(F.explode(rows).alias("kv")).select("kv.*")


def concentration_report(
    df: DataFrame, key_col: str, top_k: int = 10, weight_col: str | None = None
) -> DataFrame:
    """One-row key-concentration audit: the "will this key skew my
    join/groupBy?" question answered BEFORE the 100 TB run.

    Output: (n_rows, n_keys, top1_share_ppm, topk_share_ppm, hhi_ppm)
    — the heaviest key's share, the top-k cumulative share, and the
    Herfindahl-Hirschman index floor(Σ n_k² · 1e6 / N²) (1e6 = one
    key owns everything; 1e6/n_keys = perfectly uniform). All
    integer-exact.

    Scale: one partial-agg shuffle on the key; every metric over the
    counts relation is either an aggregate (HHI — NO sort needed:
    Σ n_k² is order-free) or a TakeOrderedAndProject top-k heap
    (never a global single-partition sort).

    Overflow discipline (this audit targets exactly the scales where
    naive integer ppm wraps): Σ n² accumulates in DECIMAL(38,0) —
    exact and order-free up to n ≈ 10¹⁹ — and every ppm ratio is ONE
    pinned double expression (value × 1e6 / N), never an integer
    product that can exceed BIGINT; pinned order keeps the doubles
    engine-identical.

    ``weight_col`` switches the mass from row COUNTS to a value sum
    (exact DECIMAL cents — e.g. revenue concentration per customer
    instead of event concentration per user). Weights must be
    non-negative: shares of a signed mass are not shares.
    """
    if weight_col is None:
        mass = F.count(F.lit(1)).alias("_n")
    else:
        mass = F.expr(
            f"CAST(SUM(CAST({weight_col} AS DECIMAL(18,2))) * 100 AS BIGINT)"
        ).alias("_n")
    counts = df.groupBy(F.col(key_col).alias("_k")).agg(mass)
    return concentration_from_counts(counts, top_k)


def concentration_from_counts(counts: DataFrame, top_k: int = 10) -> DataFrame:
    """The report half of `concentration_report`, over an
    already-aggregated (_k, _n) mass relation — shared verbatim by the
    batch operator and the streaming twin's committed per-key state
    (streaming.continuous.continuous_key_counts), so 'streamed state
    == batch groupBy' immediately gives 'streamed report == batch
    report'. Same math, same pinned expressions."""
    topk = (
        counts.orderBy(F.col("_n").desc(), "_k")
        .limit(top_k)
        .agg(F.sum("_n").alias("_topk"))
    )
    nd = F.col("_n").cast("decimal(19,0)")
    agg = counts.agg(
        F.sum("_n").alias("_N"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("_n").alias("_top1"),
        F.sum(nd * nd).alias("_sq"),
    )
    ppm = F.lit(1_000_000.0)
    nD = F.col("_N").cast("double")
    return agg.join(topk).select(
        F.col("_N").alias("n_rows"),
        "n_keys",
        F.floor(F.col("_top1").cast("double") * ppm / nD)
        .cast("long")
        .alias("top1_share_ppm"),
        F.floor(F.col("_topk").cast("double") * ppm / nD)
        .cast("long")
        .alias("topk_share_ppm"),
        F.floor(F.col("_sq").cast("double") * ppm / (nD * nD))
        .cast("long")
        .alias("hhi_ppm"),
    )


def group_shares(df: DataFrame, key_col: str) -> DataFrame:
    """Per-group share table (the dataset-card balance panel): every
    group's row count, floor-ppm share of the corpus, and rank by
    (count DESC, key).

    The rank window is GLOBAL over the group relation — right when
    groups are dataset-card-sized (sources, languages, splits);
    for high-cardinality keys use `concentration_report`, whose
    metrics need no sort at all.
    """
    counts = df.groupBy(F.col(key_col).alias(key_col)).agg(
        F.count(F.lit(1)).alias("n")
    )
    from pyspark.sql import Window

    tot = counts.agg(F.sum("n").alias("_N"))
    w = Window.orderBy(F.col("n").desc(), key_col)
    return (
        counts.join(tot)
        .select(
            key_col,
            "n",
            F.floor(F.col("n") * F.lit(1_000_000) / F.col("_N"))
            .cast("long")
            .alias("share_ppm"),
            F.row_number().over(w).alias("rank"),
        )
    )


# Benford expected first-digit mass, floor(log10(1 + 1/d) * 1e6).
# The nine constants sum to exactly 1_000_000; both engines take them
# as literals, so the expectation side is integer by construction.
BENFORD_PPM = (301030, 176091, 124939, 96910, 79181, 66947, 57992,
               51153, 45757)


def benford_report(df: DataFrame, amount_col: str) -> DataFrame:
    """First-significant-digit audit against Benford's law — the
    classic fabricated-numbers / broken-ETL smell test for financial
    amount columns.

    Amounts go through the repo's exact-cents idiom (DECIMAL(18,2) ×
    100), the first digit is the leading character of the positive
    cents integer (no float log10 anywhere), and all nine digits are
    emitted even at zero observed count. Per-digit deviation is
    obs_ppm − exp_ppm on floor-ppm integers; the chi-squared-style
    per-digit contribution uses the same pinned integer form as
    `stats_tests.chi_square_independence` with the EXPECTED counts
    coming from the ppm constants: e·1e6 = total·exp_ppm exactly.

    Output: (digit, n, total, obs_ppm, exp_ppm, dev_ppm,
    chi2_micro) — one row per digit 1–9; Σ chi2_micro is the audit
    statistic and is an exact BIGINT sum.

    Scale: one shuffle on the digit (9 groups); the digit extraction
    is a scan-side string op on the cents integer.
    """
    digits = benford_digit_counts(df, amount_col)
    return benford_finish(digits)


def benford_digit_counts(df: DataFrame, amount_col: str) -> DataFrame:
    """The MERGEABLE Benford state: per-digit counts over the exact
    cents integers — a plain sum, so the streaming twin's fold equals
    the one-shot aggregation bit for bit. Shared with
    `streaming.continuous.continuous_benford`."""
    cents = (F.col(amount_col).cast("decimal(18,2)") * 100).cast("long")
    return (
        df.select(cents.alias("_c"))
        .filter(F.col("_c") > 0)
        .select(
            F.substring(F.col("_c").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def benford_finish(digits: DataFrame) -> DataFrame:
    """Project digit counts into the audit report — shared by the
    batch operator and the streaming twin's read path."""
    from pyspark.sql import Window

    nine = F.explode(
        F.array(*[
            F.struct(F.lit(d + 1).alias("digit"),
                     F.lit(int(p)).alias("exp_ppm"))
            for d, p in enumerate(BENFORD_PPM)
        ])
    )
    frame = digits.sparkSession.range(1).select(nine.alias("kv")).select("kv.*")
    joined = frame.join(digits, "digit", "left").select(
        "digit", "exp_ppm", F.coalesce("n", F.lit(0)).alias("n")
    )
    tot = F.sum("n").over(Window.partitionBy())
    t = joined.select(
        "digit", "exp_ppm", "n", tot.alias("total")
    )
    obs_ppm = F.floor(
        F.col("n") * F.lit(1_000_000) / F.greatest(F.col("total"), F.lit(1))
    ).cast("long")
    # chi2 cell on exact integers: (o·1e6 − total·exp_ppm)² /
    # (total·exp_ppm·1e6), floored into micro-units — same pinned
    # shape as chi_square_independence
    oM = F.col("n").cast("double") * F.lit(1_000_000.0)
    eM = F.col("total").cast("double") * F.col("exp_ppm").cast("double")
    chi_cell = F.floor(
        (oM - eM) * (oM - eM) * F.lit(1_000_000.0)
        / (eM * F.lit(1_000_000.0))
    ).cast("long")
    return t.select(
        F.col("digit").cast("long").alias("digit"),
        F.col("n").cast("long").alias("n"),
        F.col("total").cast("long").alias("total"),
        obs_ppm.alias("obs_ppm"),
        F.col("exp_ppm").cast("long").alias("exp_ppm"),
        (obs_ppm - F.col("exp_ppm")).cast("long").alias("dev_ppm"),
        chi_cell.alias("chi2_micro"),
    )


def gini_by_group(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group Gini coefficient over a money column, integer-exact.

    The concentration_report's HHI weighs squared SHARES (top-heavy
    sensitivity); Gini is the full-Lorenz-curve inequality measure
    auditors and dataset cards expect. Sorted-formula form on exact
    cents: G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ) with xᵢ ascending,
    i = 1..n. Both Σ accumulate in DECIMAL(38,0) (order-free); ties
    in x are order-independent by algebra (equal x swap freely), so
    the row_number tiebreak cannot change the value. gini_ppm is the
    single pinned floor.

    Output: (group, n, sum_cents, gini_ppm).

    Scale: ONE shuffle — the rank window partitions by group and
    sorts within it; partial aggregation reuses the same exchange.
    Gini is undefined below zero, so negative cents are filtered out
    and the report covers the non-negative mass.
    """
    from pyspark.sql import Window

    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    base = df.select(
        F.col(group_col).alias("g"), cents.alias("x")
    ).filter(F.col("x") >= 0)
    # ties in x take arbitrary row_numbers; Σ i·x is invariant under
    # any permutation of equal x, so the OUTPUT is still deterministic
    w = Window.partitionBy("g").orderBy("x")
    ranked = base.select(
        "g", "x", F.row_number().over(w).alias("i")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = ranked.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        # operands lift to DECIMAL BEFORE the product — i·x in int64
        # wraps silently at the huge-group envelope
        F.sum(dec(F.col("i")) * dec(F.col("x"))).alias("six"),
    )
    num = (
        F.lit(2.0) * F.col("six").cast("double")
        - (F.col("n").cast("double") + F.lit(1.0))
        * F.col("sx").cast("double")
    )
    den = F.col("n").cast("double") * F.col("sx").cast("double")
    return agg.select(
        F.col("g").alias("group"),
        F.col("n").cast("long").alias("n"),
        F.col("sx").cast("long").alias("sum_cents"),
        F.when(
            F.col("sx") > 0,
            F.floor(num * F.lit(1_000_000.0) / den).cast("long"),
        ).alias("gini_ppm"),
    )


def robust_mean_report(
    df: DataFrame, group_col: str, value_col: str, trim_ppm: int = 50_000
) -> DataFrame:
    """Per-group trimmed and winsorized means on exact cents — the
    robust location estimates a metrics pipeline needs next to the
    plain mean, which one whale order can drag arbitrarily.

    k = ⌊n·trim_ppm/1e6⌋ rows are cut from EACH tail by value rank
    (ties are value-identical under trimming, so the arbitrary
    row_number among equals cannot change any sum); winsorizing
    replaces each cut tail with k copies of the surviving boundary
    value. Every sum accumulates in DECIMAL(38,0) cents; the three
    means are floor micro-cents (cents·1e6/n) — integer-exact end to
    end, no float accumulation anywhere.

    Output: (group, n, k_trim, n_kept, mean_micro, trimmed_micro,
    winsor_micro).

    Scale: ONE shuffle — the rank window partitions by group; the
    aggregation reuses the exchange.
    """
    from pyspark.sql import Window

    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    base = df.select(
        F.col(group_col).alias("g"), cents.alias("x")
    ).filter(F.col("x").isNotNull())
    w = Window.partitionBy("g").orderBy("x")
    wn = Window.partitionBy("g")
    ranked = base.select(
        "g", "x",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(wn).alias("n"),
    ).withColumn(
        "k", F.floor(F.col("n") * F.lit(trim_ppm) / F.lit(1_000_000))
        .cast("long")
    )
    kept = (F.col("i") > F.col("k")) & (F.col("i") <= F.col("n") - F.col("k"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = ranked.groupBy("g").agg(
        F.max("n").alias("n"),
        F.max("k").alias("k"),
        F.sum(dec(F.col("x"))).alias("s_all"),
        F.sum(F.when(kept, dec(F.col("x")))).alias("s_kept"),
        F.count(F.when(kept, 1)).alias("n_kept"),
        F.max(F.when(F.col("i") == F.col("k") + 1, F.col("x")))
        .alias("lo"),
        F.max(F.when(F.col("i") == F.col("n") - F.col("k"), F.col("x")))
        .alias("hi"),
    )
    ws = (
        F.col("s_kept")
        + dec(F.col("k")) * dec(F.col("lo"))
        + dec(F.col("k")) * dec(F.col("hi"))
    )
    micro = F.lit(1_000_000)
    return agg.select(
        F.col("g").alias("group"),
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k_trim"),
        F.col("n_kept").cast("long").alias("n_kept"),
        F.floor(F.col("s_all").cast("double") * micro / F.col("n"))
        .cast("long").alias("mean_micro"),
        F.floor(
            F.col("s_kept").cast("double") * micro
            / F.greatest(F.col("n_kept"), F.lit(1))
        ).cast("long").alias("trimmed_micro"),
        F.floor(ws.cast("double") * micro / F.col("n"))
        .cast("long").alias("winsor_micro"),
    )


def lorenz_deciles(
    df: DataFrame, unit_col: str, value_col: str
) -> DataFrame:
    """Lorenz-curve decile table: units ranked by their value into
    ntile(10) bins, each bin's share and cumulative share of the
    total — the "top 10% of customers drive X% of revenue" readout
    that `gini_by_group` summarizes into one number.

    Exact cents per unit (DECIMAL sums), deterministic decile
    assignment (value, unit id) — equal-valued units may land in
    either of two adjacent bins but BOTH engines pick identically —
    and floor-ppm shares. Output: (decile, n, sum_cents, share_ppm,
    cum_share_ppm).

    Scale: one unit aggregation + a global sort for ntile; at 100 TB
    swap ntile for approx-quantile boundaries exactly like the
    calibration report (documented there).
    """
    from pyspark.sql import Window

    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    per_unit = (
        df.select(F.col(unit_col).alias("_u"), cents.alias("_c"))
        .groupBy("_u")
        .agg(F.sum("_c").alias("_c"))
    )
    w = Window.orderBy("_c", "_u")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    binned = per_unit.select(
        F.ntile(10).over(w).alias("decile"), "_c"
    )
    per_bin = binned.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("_c")).alias("s"),
    )
    wall = Window.partitionBy()
    wcum = (
        Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per_bin.select(
        F.col("decile").cast("long").alias("decile"),
        F.col("n").cast("long").alias("n"),
        F.col("s").cast("long").alias("sum_cents"),
        F.floor(
            F.col("s").cast("double") * F.lit(1_000_000.0)
            / F.sum("s").over(wall).cast("double")
        ).cast("long").alias("share_ppm"),
        F.floor(
            F.sum("s").over(wcum).cast("double") * F.lit(1_000_000.0)
            / F.sum("s").over(wall).cast("double")
        ).cast("long").alias("cum_share_ppm"),
    )


def kanonymity_report(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
) -> DataFrame:
    """One-row k-anonymity / l-diversity audit before a data release:
    group rows by the quasi-identifier columns and measure how much of
    the table sits in equivalence classes smaller than ``k`` (re-
    identifiable) and how many classes carry a single sensitive value
    (attribute disclosure even when k holds).

    Output: (n_rows, n_classes, min_class, n_rows_below_k,
    share_below_k_ppm, min_l, n_classes_l1) — all exact integers /
    floor-ppm.

    Scale: ONE shuffle on the QI key computes class size and distinct
    sensitive count together; the summary is an aggregate over the
    class relation.
    """
    classes = df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.countDistinct(sensitive_col).alias("_l"),
    )
    return classes.agg(
        F.sum("_n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("_n").cast("long").alias("min_class"),
        F.coalesce(
            F.sum(F.when(F.col("_n") < k, F.col("_n"))), F.lit(0)
        ).cast("long").alias("n_rows_below_k"),
        F.floor(
            F.coalesce(
                F.sum(F.when(F.col("_n") < k, F.col("_n"))), F.lit(0)
            ) * F.lit(1_000_000) / F.sum("_n")
        ).cast("long").alias("share_below_k_ppm"),
        F.min("_l").cast("long").alias("min_l"),
        F.count(F.when(F.col("_l") == 1, 1)).cast("long")
        .alias("n_classes_l1"),
    )


def key_share_drift(
    df: DataFrame,
    key_col: str,
    post_col,
    top_k: int = 20,
) -> DataFrame:
    """Top-``top_k`` keys by absolute traffic-share shift between two
    periods — the per-key TRIAGE next to `population_stability`'s
    one-number PSI verdict: PSI says "the mix moved", this says WHO
    moved (the churned whale, the new bot, the key that quietly 10×d).
    ``post_col`` is a boolean column splitting the rows.

    Exact integer ppm shares per side (cross-multiplied divisions
    against each side's total), delta_ppm = share_post − share_pre;
    the cut is (|delta| DESC, key) via orderBy + limit — a
    TakeOrdered heap merge, NEVER a global sort or a single-partition
    rank window. Keys absent from one side report that side's share
    as 0 (absence is the signal).

    Output: (key, n_pre, n_post, share_pre_ppm, share_post_ppm,
    delta_ppm), ``top_k`` rows.

    Scale: one map-side-combined (key) aggregation; the totals
    broadcast; the heap cut carries top_k rows per partition to the
    driver.
    """
    base = df.select(
        F.col(key_col).alias("_k"),
        post_col.cast("boolean").alias("_p"),
    )
    per = base.groupBy("_k").agg(
        F.count(F.when(~F.col("_p"), 1)).alias("n_pre"),
        F.count(F.when(F.col("_p"), 1)).alias("n_post"),
    )
    return share_drift_from_counts(per, key_col, top_k)


def share_drift_from_counts(
    per: DataFrame,
    key_col: str,
    top_k: int = 20,
) -> DataFrame:
    """Finish `key_share_drift` from a pre-aggregated per-key
    (_k, n_pre, n_post) relation — split out so the streaming twin
    can fold mergeable count partials into the SAME ppm/TakeOrdered
    path (counts merge by SUM; shares are a read-time projection).
    Accepts the key under ``key_col`` or the internal ``_k``."""
    if "_k" not in per.columns:
        per = per.withColumnRenamed(key_col, "_k")
    tot = per.agg(
        F.sum("n_pre").alias("_tpre"), F.sum("n_post").alias("_tpost")
    )
    shared = per.join(F.broadcast(tot)).select(
        "_k",
        F.col("n_pre").cast("long").alias("n_pre"),
        F.col("n_post").cast("long").alias("n_post"),
        F.when(
            F.col("_tpre") > 0, F.expr("(n_pre * 1000000L) div _tpre")
        ).otherwise(F.lit(0)).cast("long").alias("share_pre_ppm"),
        F.when(
            F.col("_tpost") > 0,
            F.expr("(n_post * 1000000L) div _tpost"),
        ).otherwise(F.lit(0)).cast("long").alias("share_post_ppm"),
    ).select(
        "_k", "n_pre", "n_post", "share_pre_ppm", "share_post_ppm",
        (F.col("share_post_ppm") - F.col("share_pre_ppm"))
        .alias("delta_ppm"),
    )
    return (
        shared.orderBy(F.abs(F.col("delta_ppm")).desc(), "_k")
        .limit(top_k)
        .select(
            F.col("_k").alias(key_col),
            "n_pre", "n_post", "share_pre_ppm", "share_post_ppm",
            "delta_ppm",
        )
    )


def fd_audit(df: DataFrame, deps: list[tuple[str, str]]) -> DataFrame:
    """Functional-dependency audit — the data-profiling check behind
    every "X determines Y" modeling assumption (join keys, SCD
    grains, star-schema conformance): for each candidate lhs → rhs,
    how many lhs keys see MORE than one distinct rhs, and how bad is
    the worst key. Exact integers (count + count distinct per key);
    a dependency `holds` iff zero violating keys. NULL-safe: NULL
    rhs counts as a value (two keys agreeing on NULL still agree),
    NULL lhs groups like any other key — the SQL GROUP BY convention
    both engines share.

    Output: one row per candidate — (lhs, rhs, n_keys, n_violating,
    max_rhs_per_key, holds).

    Scale: one map-side-combinable (lhs, rhs) distinct + per-key agg
    per candidate; candidates are a literal list, so the audit is
    len(deps) bounded scans — run it on a sampled slice first at
    100 TB, then confirm on the full table for survivors.
    """
    outs = []
    for lhs, rhs in deps:
        per = (
            df.select(F.col(lhs).alias("_l"), F.col(rhs).alias("_r"))
            .distinct()
            .groupBy("_l")
            .agg(F.count(F.lit(1)).alias("_nr"))
        )
        outs.append(
            per.agg(
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.count(F.when(F.col("_nr") > 1, 1))
                .cast("long").alias("n_violating"),
                F.max("_nr").cast("long").alias("max_rhs_per_key"),
            ).withColumn("holds", F.col("n_violating") == 0)
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res
