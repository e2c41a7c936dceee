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


def basket_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 5,
) -> DataFrame:
    """Market-basket co-occurrence mining: item pairs appearing in the
    same basket, with support and lift — the a-priori first pass
    (frequent 2-itemsets) as a blocked self-join, the basket id being
    the natural block (pair explosion is per-basket O(b²), never
    corpus-wide).

    lift = (n_ab/N) / ((n_a/N)·(n_b/N)) evaluated in that pinned
    order (counts are exact integers; N = basket count), round-6 —
    lift > 1 means the pair co-occurs beyond independence.

    ``min_support`` prunes the pair tail BEFORE the item-frequency
    joins. Items are deduped within a basket first (a basket containing
    an item twice is one incidence).

    Output: (item_a, item_b, n_ab, n_a, n_b, lift_r) with
    item_a < item_b.
    """
    base = (
        df.select(F.col(basket_col).alias("_b"), F.col(item_col).alias("_i"))
        .distinct()
    )
    # the basket total rides the plan as a broadcast 1-row aggregate —
    # NO eager count() at plan build (the round-2 advisor's
    # eager-probe rule); empty input simply yields no pairs
    nb = base.agg(F.countDistinct("_b").alias("_nb"))
    item_counts = base.groupBy("_i").agg(F.count(F.lit(1)).alias("n_item"))
    a = base.select(F.col("_b"), F.col("_i").alias("item_a"))
    b = base.select(F.col("_b"), F.col("_i").alias("item_b"))
    pairs = (
        a.join(b, "_b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    joined = (
        pairs.join(
            item_counts.select(F.col("_i").alias("item_a"),
                               F.col("n_item").alias("n_a")), "item_a"
        )
        .join(
            item_counts.select(F.col("_i").alias("item_b"),
                               F.col("n_item").alias("n_b")), "item_b"
        )
    )
    n = F.col("_nb").cast("double")
    lift = (
        (F.col("n_ab").cast("double") / n)
        / (
            (F.col("n_a").cast("double") / n)
            * (F.col("n_b").cast("double") / n)
        )
    )
    return joined.join(F.broadcast(nb)).select(
        "item_a", "item_b", "n_ab", "n_a", "n_b",
        F.round(lift, 6).alias("lift_r"),
    )


def percent_rank_ppm(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    order_cols: list[str],
) -> DataFrame:
    """Percentile-rank normalization per key, in exact integer ppm:
    floor((rank − 1) · 1e6 / (n − 1)) over the (value, order)-sorted
    rows — maps any score distribution onto [0, 1e6] so thresholds
    compose across heterogeneous sources (the normalization step
    before mixing classifier scores). Single-row keys get 0.

    True SQL `percent_rank` TIE semantics — rank() over value alone,
    so equal scores get equal percentiles (row_number would split ties
    by an arbitrary order and a downstream threshold would keep one
    twin and drop the other) — floored to an integer so the result is
    engine-exact by construction. ``order_cols`` only carry through to
    the output for row identity.

    Output: order_cols + keys + (value, rank, n, pr_ppm).
    """
    w = Window.partitionBy(*keys).orderBy(F.col(value_col).asc())
    w_all = Window.partitionBy(*keys)
    ranked = df.filter(F.col(value_col).isNotNull()).withColumn(
        "rank", F.rank().over(w)
    ).withColumn("n", F.count(F.lit(1)).over(w_all))
    # rank is int: cast long BEFORE the 1e6 multiply (32-bit overflows
    # past ~2148 rows per key — ANSI mode then throws at bench scale)
    pr = F.when(F.col("n") > 1, F.floor(
        (F.col("rank").cast("long") - 1) * F.lit(1_000_000)
        / (F.col("n") - 1)
    )).otherwise(F.lit(0))
    return ranked.select(
        *order_cols, *keys, value_col, "rank", "n",
        pr.cast("long").alias("pr_ppm"),
    )


def rfm_segments(
    orders: DataFrame,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    r_days: tuple[int, int] = (365, 730),
    f_counts: tuple[int, int] = (15, 8),
    m_cents: tuple[int, int] = (180_000_000, 120_000_000),
) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary).

    The classic CRM cut: per customer, days since last order (vs the
    corpus max date — reproducible without wall clock), order count,
    and exact DECIMAL spend in cents; each banded 3/2/1 by FIXED
    thresholds (map-side — no global ntile sort, same scale argument
    as the curriculum bands) and composed into the familiar 3-digit
    segment code (333 = best).

    Integer-exact end to end: day diffs, counts, cents, scores.
    One partial-agg shuffle on the customer key; the corpus max date
    is a 1-row broadcast.
    """
    ref = orders.agg(F.max(date_col).alias("_ref"))
    per = orders.groupBy(F.col(cust_col).alias("_c")).agg(
        F.max(date_col).alias("_last"),
        F.count(F.lit(1)).alias("n_orders"),
        F.expr(
            f"CAST(SUM(CAST({amount_col} AS DECIMAL(18,2))) * 100 AS BIGINT)"
        ).alias("monetary_cents"),
    )
    j = per.join(ref)
    rec = F.datediff(F.col("_ref"), F.col("_last"))
    r_s = (
        F.when(rec <= r_days[0], 3).when(rec <= r_days[1], 2).otherwise(1)
    )
    f_s = (
        F.when(F.col("n_orders") >= f_counts[0], 3)
        .when(F.col("n_orders") >= f_counts[1], 2)
        .otherwise(1)
    )
    m_s = (
        F.when(F.col("monetary_cents") >= m_cents[0], 3)
        .when(F.col("monetary_cents") >= m_cents[1], 2)
        .otherwise(1)
    )
    return j.select(
        F.col("_c").alias(cust_col),
        rec.alias("recency_days"),
        "n_orders",
        "monetary_cents",
        r_s.alias("r_score"),
        f_s.alias("f_score"),
        m_s.alias("m_score"),
        (r_s * 100 + f_s * 10 + m_s).alias("segment"),
    )


def pinned_pearson(n, sx, sy, sxx, syy, sxy):
    """The repo's ONE pinned Pearson finish over exact moments: every
    argument must already be an exact integer/DECIMAL Column; the
    expression casts each to double once and evaluates

        (n·sxy − sx·sy) / sqrt((n·sxx − sx²)(n·syy − sy²))

    in this fixed order, round-6, NULL on zero variance. Shared by
    `correlation_matrix`, `stats_tests.spearman_corr`, and
    `timeseries.lag_correlation` so the oracle convention has exactly
    one Python source."""
    d = lambda c: c.cast("double")  # noqa: E731
    nD = d(n)
    num = nD * d(sxy) - d(sx) * d(sy)
    vx = nD * d(sxx) - d(sx) * d(sx)
    vy = nD * d(syy) - d(sy) * d(sy)
    return F.when((vx > 0) & (vy > 0), F.round(num / F.sqrt(vx * vy), 6))


def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pearson correlation for every column pair in ONE pass over the
    data: all sufficient moments (count, sums, pairwise product sums)
    come from a single aggregation — the exchange carries a handful of
    DECIMAL partials, the table is scanned once however many pairs are
    asked for.

    Cross-engine determinism: the moments are exact DECIMAL sums
    (order-free); the final corr = (n·Sxy − Sx·Sy) /
    sqrt((n·Sxx − Sx²)(n·Syy − Sy²)) is evaluated in ONE pinned
    double expression per pair, rounded to 6 — and NULL on a
    zero-variance column (matching the A/B readout's guard).

    Rows must be complete cases: NULL in any column drops the row
    (the one-pass moment set shares a single n). Output:
    (col_a, col_b, n, corr_r) for each unordered pair.
    """
    if len(cols) < 2:
        raise ValueError("correlation_matrix: need at least two columns")
    d = df.na.drop(subset=cols)
    dec = {c: F.col(c).cast("decimal(18,2)") for c in cols}
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(dec[c]).alias(f"_s_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i:]:
            aggs.append(F.sum(dec[a] * dec[b]).alias(f"_p_{a}_{b}"))
    m = d.agg(*aggs)

    rows = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            rows.append(
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    F.col("_n").alias("n"),
                    pinned_pearson(
                        F.col("_n"), F.col(f"_s_{a}"), F.col(f"_s_{b}"),
                        F.col(f"_p_{a}_{a}"), F.col(f"_p_{b}_{b}"),
                        F.col(f"_p_{a}_{b}"),
                    ).alias("corr_r"),
                )
            )
    return m.select(F.explode(F.array(*rows)).alias("kv")).select("kv.*")


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 5,
) -> DataFrame:
    """Directed association rules a→b over frequent 2-itemsets — the
    recommendation step after `basket_pairs`: same blocked self-join
    (per-basket O(b²), never corpus-wide), then each surviving
    unordered pair unions into both directions so confidence (which is
    asymmetric) reads directly.

    confidence_ppm = floor(n_ab·1e6/n_ante) and support_ppm =
    floor(n_ab·1e6/N) are exact integers; lift keeps `basket_pairs`'
    pinned (n_ab/N)/((n_a/N)·(n_b/N)) order, round-6 (symmetric, so
    both directions show the same lift — the confidence columns are
    what differ).

    Output: (ante, cons, n_ab, n_ante, n_cons, support_ppm,
    conf_ppm, lift_r).
    """
    base = (
        df.select(F.col(basket_col).alias("_b"), F.col(item_col).alias("_i"))
        .distinct()
    )
    nb = base.agg(F.countDistinct("_b").alias("_nb"))
    item_counts = base.groupBy("_i").agg(F.count(F.lit(1)).alias("n_item"))
    a = base.select(F.col("_b"), F.col("_i").alias("x"))
    b = base.select(F.col("_b"), F.col("_i").alias("y"))
    pairs = (
        a.join(b, "_b")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    directed = pairs.select(
        F.col("x").alias("ante"), F.col("y").alias("cons"), "n_ab"
    ).unionByName(
        pairs.select(
            F.col("y").alias("ante"), F.col("x").alias("cons"), "n_ab"
        )
    )
    joined = (
        directed.join(
            item_counts.select(F.col("_i").alias("ante"),
                               F.col("n_item").alias("n_ante")), "ante"
        )
        .join(
            item_counts.select(F.col("_i").alias("cons"),
                               F.col("n_item").alias("n_cons")), "cons"
        )
        .join(F.broadcast(nb))
    )
    n = F.col("_nb").cast("double")
    lift = (
        (F.col("n_ab").cast("double") / n)
        / (
            (F.col("n_ante").cast("double") / n)
            * (F.col("n_cons").cast("double") / n)
        )
    )
    return joined.select(
        "ante", "cons", "n_ab", "n_ante", "n_cons",
        F.floor(F.col("n_ab") * F.lit(1_000_000) / F.col("_nb"))
        .cast("long").alias("support_ppm"),
        F.floor(F.col("n_ab") * F.lit(1_000_000) / F.col("n_ante"))
        .cast("long").alias("conf_ppm"),
        F.round(lift, 6).alias("lift_r"),
    )


def json_field_stats(
    df: DataFrame, json_col: str, field: str, group_col: str
) -> DataFrame:
    """Semi-structured column profiling: extract one numeric field
    from a JSON string column JVM-side (`get_json_object` — no Python
    in the path) and aggregate presence/shape stats per group — the
    first question against any event-properties blob ("is this field
    always there, what range, how many distinct").

    Output per group: (group, n, n_missing, n_distinct, min_v, max_v,
    sum_v, mean_ppm) — all integer-exact (mean is the usual
    floor-ppm).

    Scale: extraction is a scan-side projection; one partial-agg
    shuffle on the group. At 100 TB the same expression serves as a
    materialized-column backfill (write the extracted field once,
    query the column forever).
    """
    base = df.select(
        F.col(group_col).alias("group"),
        json_field_expr(json_col, field).alias("v"),
    )
    agg = base.groupBy("group").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("v").isNull(), 1)).alias("n_missing"),
        F.countDistinct("v").cast("long").alias("n_distinct"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
        F.sum("v").alias("sum_v"),
    )
    return json_stats_finish(agg)


def json_field_expr(json_col: str, field: str):
    """The shared scan-side extraction expression (batch operator and
    streaming twin must hash the same longs)."""
    return F.get_json_object(F.col(json_col), f"$.{field}").cast("long")


def json_stats_finish(agg: DataFrame) -> DataFrame:
    """Derive mean_ppm from aggregated JSON-field partials — shared by
    the batch operator and the streaming twin's read path, so the
    rolling report IS the batch report on the same counts. Passes
    n_distinct through when present (it is not algebraically
    mergeable, so the streaming state does not carry it)."""
    cols = ["group", "n", "n_missing"]
    if "n_distinct" in agg.columns:
        cols.append("n_distinct")
    cols += ["min_v", "max_v", "sum_v"]
    return agg.select(
        *cols,
        F.floor(
            F.col("sum_v") * F.lit(1_000_000)
            / F.greatest(F.col("n") - F.col("n_missing"), F.lit(1))
        ).cast("long").alias("mean_ppm"),
    )


def audience_overlap(
    df: DataFrame, key_col: str, unit_col: str
) -> DataFrame:
    """Exact pairwise audience overlap: for every key pair, how many
    UNITS (users) both keys share, with the exact Jaccard — the
    ground-truth companion to the KMV sketch overlap (`sketch.
    kmv_set_algebra`), runnable whenever a full pass is affordable.

    Per-unit key sets explode into per-unit pairs (the unit is the
    natural block — fan-out is |keys-per-unit|², never corpus-wide),
    then one count per ordered pair. Output: (key_a, key_b, n_a, n_b,
    n_common, jaccard_ppm) with key_a < key_b, floor-ppm Jaccard on
    exact integers.
    """
    base = df.select(
        F.col(key_col).alias("_k"), F.col(unit_col).alias("_u")
    ).distinct()
    totals = base.groupBy("_k").agg(F.count(F.lit(1)).alias("n_units"))
    a = base.select("_u", F.col("_k").alias("key_a"))
    b = base.select("_u", F.col("_k").alias("key_b"))
    common = (
        a.join(b, "_u")
        .filter(F.col("key_a") < F.col("key_b"))
        .groupBy("key_a", "key_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    out = (
        common.join(
            totals.select(F.col("_k").alias("key_a"),
                          F.col("n_units").alias("n_a")), "key_a"
        )
        .join(
            totals.select(F.col("_k").alias("key_b"),
                          F.col("n_units").alias("n_b")), "key_b"
        )
    )
    union = F.col("n_a") + F.col("n_b") - F.col("n_common")
    return out.select(
        "key_a", "key_b", "n_a", "n_b", "n_common",
        F.floor(F.col("n_common") * F.lit(1_000_000) / union)
        .cast("long").alias("jaccard_ppm"),
    )


def quantile_map(
    df: DataFrame,
    id_col: str,
    value_col: str,
    ref_df: DataFrame,
    ref_value_col: str,
) -> DataFrame:
    """Quantile normalization: map each row's value onto the REFERENCE
    distribution's value at the same quantile — the score
    harmonization step when per-source scores live on incomparable
    scales ("this doc is source-X's 80th percentile; what would an
    80th-percentile doc score globally?").

    Rank side: SQL rank() ties (equal values share a quantile, the
    percent_rank_ppm convention), q_ppm = ⌊(rank−1)·1e6/(n−1)⌋
    exact. Reference side: the value at 1-indexed position
    ⌊q_ppm·(n_ref−1)/1e6⌋ + 1 of the sorted reference — nearest-below
    interpolation entirely in integers; tied reference values make
    the position ambiguous but the VALUE identical, so the output is
    engine-exact.

    Output: (id, value, q_ppm, mapped).

    Scale: two global sorts (input ranks, reference positions) — at
    100 TB pre-compute reference quantile boundaries once (tiny
    broadcast table) exactly like the calibration report's swap.

    Degenerate reference: an EMPTY ``ref_df`` raises (a silent
    zero-row result would read as "no input data" — same loud-failure
    contract as pagerank's empty edge list); a one-row reference is
    legal and maps every input to that single value. The emptiness
    probe is a LIMIT-1 scan of the reference only (the small,
    broadcast side), not a job over ``df``.
    """
    from pyspark.sql import Window

    if ref_df.isEmpty():
        raise ValueError("quantile_map: empty reference distribution")
    wa = Window.orderBy(value_col)
    na = df.select(F.count(F.lit(1)).alias("_na"))
    a = df.select(
        F.col(id_col).alias("id"),
        F.col(value_col).cast("double").alias("value"),
        F.rank().over(wa).alias("_ra"),
    ).join(F.broadcast(na))
    a = a.select(
        "id", "value",
        F.floor(
            (F.col("_ra") - 1) * F.lit(1_000_000)
            / F.greatest(F.col("_na") - 1, F.lit(1))
        ).cast("long").alias("q_ppm"),
    )
    wb = Window.orderBy(ref_value_col)
    nb = ref_df.select(F.count(F.lit(1)).alias("_nb"))
    b = ref_df.select(
        F.col(ref_value_col).cast("double").alias("mapped"),
        F.row_number().over(wb).alias("_rb"),
    ).join(F.broadcast(nb))
    keyed = a.join(F.broadcast(nb)).withColumn(
        "_idx",
        (
            F.floor(F.col("q_ppm") * (F.col("_nb") - 1) / F.lit(1_000_000))
            + 1
        ).cast("int"),
    ).drop("_nb")
    return keyed.join(
        b.select("_rb", "mapped"), keyed["_idx"] == b["_rb"]
    ).select("id", "value", "q_ppm", "mapped")


def cohort_ltv(
    df: DataFrame,
    unit_col: str,
    ts_col: str,
    value_expr,
    bucket: str = "week",
) -> DataFrame:
    """Cohort lifetime-value matrix: units grouped by their FIRST-seen
    period, revenue accumulated per period of age — the
    "how much is a January signup worth by week 4" table behind any
    LTV projection, and the revenue-weighted companion of the
    count-based retention matrix.

    Cohort and age are whole periods from exact date arithmetic
    (``trunc``/datediff — no float time); values are exact DECIMAL
    cents, plus the cumulative LTV per cohort as a running window over
    the (cohort, age) matrix relation. ``value_expr`` is the per-row
    revenue column/expression (cast to cents internally).

    Output: (cohort_start, age, n_units, revenue_cents,
    cum_revenue_cents).

    Scale: one shuffle for first-seen, one for the (cohort, age)
    cells; the cumulative window runs on the matrix relation
    (cohorts × ages, tiny).
    """
    from pyspark.sql import Window

    if bucket not in ("week", "month"):
        raise ValueError("cohort_ltv: bucket must be 'week' or 'month'")
    trunc_fmt = {"week": "week", "month": "month"}[bucket]
    base = df.select(
        F.col(unit_col).alias("_u"),
        F.to_date(F.col(ts_col)).alias("_d"),
        (value_expr.cast("decimal(18,2)") * 100).cast("long").alias("_c"),
    )
    first = base.groupBy("_u").agg(
        F.trunc(F.min("_d"), trunc_fmt).alias("_cohort")
    )
    j = base.join(first, "_u").select(
        "_u", "_c", "_cohort",
        F.floor(
            F.datediff(F.trunc(F.col("_d"), trunc_fmt), F.col("_cohort"))
            / F.lit(7 if bucket == "week" else 1)
        ).cast("long").alias("_age")
        if bucket == "week"
        else F.months_between(
            F.trunc(F.col("_d"), trunc_fmt), F.col("_cohort")
        ).cast("long").alias("_age"),
    )
    cells = j.groupBy("_cohort", "_age").agg(
        F.countDistinct("_u").alias("n_units"),
        F.sum("_c").alias("revenue_cents"),
    )
    w = Window.partitionBy("_cohort").orderBy("_age").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return cells.select(
        F.col("_cohort").alias("cohort_start"),
        F.col("_age").alias("age"),
        F.col("n_units").cast("long").alias("n_units"),
        F.col("revenue_cents").cast("long").alias("revenue_cents"),
        F.sum("revenue_cents").over(w).cast("long")
        .alias("cum_revenue_cents"),
    )


def abc_classification(
    df: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """ABC (Pareto) classification over a money column: keys ranked by
    revenue; class A while the running cumulative share stays ≤ 80%,
    B while ≤ 95%, C after — the inventory-policy cut behind "A items
    get daily counts, C items get yearly".

    Exact cents per key, deterministic (cents DESC, key) rank, and
    the band tests are integer cross-multiplications on the
    cumulative share EXCLUDING the current key
    ((cum−cents)·100 < total·80 — never a float share, and a single
    dominant key is class A, not pushed past its own band). share/
    cum_share ppm columns are the usual floors for display.

    Output: (key, cents, rank, cum_cents, share_ppm, cum_share_ppm,
    abc_class).

    Scale: one keyed aggregation + one global rank sort over the KEY
    relation (items, not rows) — swap in approx-quantile bands at
    extreme key cardinality like the calibration report.
    """
    per = abc_key_cents(df, key_col, value_col)
    return abc_finish(per)


def abc_key_cents(
    df: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """The MERGEABLE ABC state: exact cents per key (plain sums) —
    shared with `streaming.continuous.continuous_abc`, whose rolling
    state therefore equals the one-shot aggregation bit for bit; the
    rank/banding happens at read time in `abc_finish`."""
    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
    return (
        df.select(F.col(key_col).alias("key"), cents.alias("_c"))
        .groupBy("key")
        .agg(F.sum("_c").alias("cents"))
    )


def abc_finish(per: DataFrame) -> DataFrame:
    """Rank + band the per-key cents relation — shared by the batch
    operator and the streaming twin's read path."""
    from pyspark.sql import Window

    w = Window.orderBy(F.col("cents").desc(), "key")
    wall = Window.partitionBy()
    ranked = per.select(
        "key", "cents",
        F.row_number().over(w).alias("rank"),
        F.sum("cents").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum_cents"),
        F.sum("cents").over(wall).alias("_total"),
    )
    # band tests lift to DECIMAL before the cross-multiplication (the
    # review-fixes discipline: int64 would wrap past ~$9e14 totals);
    # banding on cum BEFORE the key keeps a dominant top item in A
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    before = F.col("cum_cents") - F.col("cents")
    a = d38(before) * 100 < d38(F.col("_total")) * 80
    b = d38(before) * 100 < d38(F.col("_total")) * 95
    return ranked.select(
        "key", "cents", "rank", "cum_cents",
        F.floor(F.col("cents").cast("double") * F.lit(1_000_000.0)
                / F.col("_total").cast("double")).cast("long")
        .alias("share_ppm"),
        F.floor(F.col("cum_cents").cast("double") * F.lit(1_000_000.0)
                / F.col("_total").cast("double")).cast("long")
        .alias("cum_share_ppm"),
        F.when(a, F.lit("A")).when(b, F.lit("B")).otherwise(F.lit("C"))
        .alias("abc_class"),
    )


def revenue_bridge(
    fact: DataFrame,
    key_col: str,
    date_col: str,
    qty_col: str,
    rev_col: str,
) -> DataFrame:
    """Revenue bridge (price/volume decomposition) between the two
    halves of the observed date span — the classic finance walk "why
    did revenue move": per key,

        ΔR = volume_effect + price_effect
        volume_effect = (q₁ − q₀) · p₀ = (q₁ − q₀)·r₀ div q₀
        price_effect  = ΔR − volume_effect

    The identity (q₁−q₀)p₀ + (p₁−p₀)q₁ = R₁ − R₀ holds exactly in
    rationals; the integer rendering keeps it exact BY CONSTRUCTION —
    the volume effect takes the truncating division and the price
    effect absorbs its remainder, so every row reconciles to its ΔR
    to the cent and the grand total walks (no "rounding plug" row).

    Quantities and revenue are exact cents (×100 DECIMAL lifts);
    the period split is the value-based midpoint of the date span
    (the training_table convention). Keys missing from either period
    (q₀ = 0 or q₁ = 0: no base price / no close price) report their
    ΔR with NULL effects — new and discontinued keys are mix, not
    price or volume, and pretending otherwise is how bridges lie.

    Output per key: (key, q0_c, q1_c, r0_c, r1_c, delta_c,
    volume_eff_c, price_eff_c).

    Scale: one (key, period) partial agg; the pivot to the two-period
    row is a second tiny agg over keys×2. No windows.
    """
    base = fact.select(
        F.col(key_col).alias("_k"),
        F.unix_date(F.to_date(F.col(date_col))).alias("_d"),
        F.expr(f"CAST(CAST({qty_col} AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .alias("_q"),
        F.expr(f"CAST(CAST({rev_col} AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .alias("_r"),
    )
    bounds = base.agg(
        F.min("_d").alias("_mn"), F.max("_d").alias("_mx")
    ).select(
        (F.col("_mn") + F.expr("(_mx - _mn) div 2")).alias("_mid")
    )
    per = (
        base.crossJoin(F.broadcast(bounds))
        .groupBy("_k")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("_d") <= F.col("_mid"), F.col("_q"))),
                F.lit(0),
            ).cast("long").alias("q0_c"),
            F.coalesce(
                F.sum(F.when(F.col("_d") > F.col("_mid"), F.col("_q"))),
                F.lit(0),
            ).cast("long").alias("q1_c"),
            F.coalesce(
                F.sum(F.when(F.col("_d") <= F.col("_mid"), F.col("_r"))),
                F.lit(0),
            ).cast("long").alias("r0_c"),
            F.coalesce(
                F.sum(F.when(F.col("_d") > F.col("_mid"), F.col("_r"))),
                F.lit(0),
            ).cast("long").alias("r1_c"),
        )
    )
    both = (F.col("q0_c") > 0) & (F.col("q1_c") > 0)
    vol = F.expr(
        "CAST((CAST(q1_c - q0_c AS DECIMAL(38,0)) * r0_c) div q0_c"
        " AS BIGINT)"
    )
    delta = F.col("r1_c") - F.col("r0_c")
    return per.select(
        F.col("_k").alias(key_col),
        "q0_c", "q1_c", "r0_c", "r1_c",
        delta.cast("long").alias("delta_c"),
        F.when(both, vol).alias("volume_eff_c"),
        F.when(both, delta - vol).cast("long").alias("price_eff_c"),
    )


def hill_tail_index(
    df: DataFrame,
    value_col,
    id_col: str,
    k: int = 100,
) -> DataFrame:
    """One-row Hill (1975) tail-index estimate over the k largest
    values — the heavy-tail diagnostic that completes the
    concentration panel (Gini/Lorenz say HOW unequal, HHI says how
    concentrated, Hill says how FAT the tail is: α ≈ 1 means
    infinite-variance Pareto, α > 2 a tame tail):

        α̂ = k / Σ_{i≤k} ln(x_(i) / x_(k+1))

    ``value_col`` must be a positive exact integer (cents); the
    (k+1)-set is the deterministic ORDER BY (value DESC, id) LIMIT
    k+1 — a TakeOrdered heap cut in Spark and the identical LIMIT in
    the oracle, never a global sort. Each of the k+1 values carries
    ONE round(log10·1e6) integer micro-log (the round-6-log idiom at
    the integer scale, so the long cast has no representation slack),
    making the denominator Σlog10(xᵢ) − k·log10(x_min) an exact
    integer sum and

        alpha_r = round((k · 1e6 / ln(10)) / denom_e6, 6)

    is the single pinned float finish (α = k/Σln(xᵢ/x_min) with the
    denominator carried in micro-log10 units; k·1e6/ln(10) is ONE
    full-precision literal both engines divide identically). NULL
    when fewer than k+1 positive values exist or the tail is flat
    (denom ≤ 0).

    Output: (n, k, xmin, denom_e6, alpha_r).

    Scale: one TakeOrdered heap cut (k+1 rows to the driver-side
    relation — control-plane); everything after runs on k+1 rows.
    """
    import math

    val = value_col if not isinstance(value_col, str) else F.col(value_col)
    base = df.select(
        val.cast("long").alias("_v"), F.col(id_col).alias("_id")
    ).filter(F.col("_v").isNotNull() & (F.col("_v") > 0))
    top = base.orderBy(F.col("_v").desc(), F.col("_id")).limit(k + 1)
    w = Window.orderBy(F.col("_v").desc(), F.col("_id"))
    # round at the INTEGER micro scale (round(log10·1e6)), not
    # round-6-then-multiply — the scaled round has no representation
    # slack for the long cast to truncate through
    ranked = top.select(
        "_v", F.row_number().over(w).alias("_rn"),
        F.round(F.log10(F.col("_v").cast("double")) * F.lit(1_000_000.0))
        .cast("long").alias("_lm"),
    )
    lmic = F.col("_lm")
    agg = ranked.agg(
        F.count(F.lit(1)).alias("_nt"),
        F.sum(F.when(F.col("_rn") <= k, lmic)).alias("_sl"),
        F.max(F.when(F.col("_rn") == k + 1, lmic)).alias("_lmin"),
        F.max(F.when(F.col("_rn") == k + 1, F.col("_v"))).alias("_xmin"),
    )
    n_total = base.agg(F.count(F.lit(1)).cast("long").alias("n"))
    denom = F.col("_sl") - F.lit(k) * F.col("_lmin")
    alpha = F.round(
        F.lit(float(k) * 1_000_000.0 / math.log(10))
        / F.col("denom_e6").cast("double"),
        6,
    )
    out = n_total.join(F.broadcast(agg)).select(
        "n", F.lit(k).cast("long").alias("k"),
        F.col("_xmin").alias("xmin"),
        F.when(F.col("_nt") == k + 1, denom).cast("long")
        .alias("denom_e6"),
    )
    return out.select(
        "n", "k", "xmin", "denom_e6",
        F.when(
            F.col("denom_e6").isNotNull() & (F.col("denom_e6") > 0), alpha
        ).alias("alpha_r"),
    )
