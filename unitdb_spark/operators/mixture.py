"""Data-mixture construction for multi-source training corpora.

The two standard levers when a corpus is assembled from N sources
(web crawl, code, books, ...) for LLM training:

- `source_mixture`: temperature-scaled sampling weights,
  w_s ∝ (tokens_s)^alpha — alpha=1 is proportional sampling, alpha→0
  flattens toward uniform (the multilingual/multi-source rebalancing
  rule used since GPT-3/XLM-R). Given a token budget, also emits the
  implied epochs-per-source (budget * w_s / tokens_s).
- `source_cap`: hard per-source token quota. Documents are admitted in
  deterministic content-hash order (same md5 idiom as
  `operators.sampling` — layout/engine independent) until the source's
  running token total exceeds the cap. Keeps head-heavy sources from
  swamping the mix before weighting even starts.

Scale shape: `source_mixture` is one map-side-combined aggregation to
N_source rows (the shuffle carries ~20 rows, not documents), plus a
one-row broadcast for the normalizer. `source_cap` is one shuffle on
source for the running-sum window — the same cost as any per-source
window; the md5 sort key means adding/removing executors or files
never changes which documents are admitted.

The reference has no multi-source surface (single store, contracts as
tenants, varz.go counters); this is north-star pipeline coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from unitdb_spark.functions.portable_hash import md5_int60
from unitdb_spark.functions.text import token_count


def source_mixture(
    docs: DataFrame,
    alpha: float = 0.5,
    budget_tokens: int | None = None,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source stats + temperature-scaled mixture weights.

    Output: (source, n_docs, n_tokens, weight[, epochs]) where
    weight = n_tokens^alpha / sum_s(n_tokens^alpha), rounded to 6
    decimals (pow is engine-portable IEEE, rounding absorbs the last
    ulp), and epochs = budget_tokens * weight / n_tokens.
    """
    per_src = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(text_col)).alias("n_tokens"),
    )
    raw = F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha)))
    scored = per_src.withColumn("_raw", raw)
    total = scored.agg(F.sum("_raw").alias("_total"))
    out = scored.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("_raw") / F.col("_total"), 6).alias("weight"),
    )
    if budget_tokens is not None:
        out = out.withColumn(
            "epochs",
            F.round(
                F.lit(float(budget_tokens))
                * (F.col("weight") / F.col("n_tokens").cast("double")),
                6,
            ),
        )
    return out


def source_cap(
    docs: DataFrame,
    cap_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Admit documents per source until the running token total passes
    ``cap_tokens``; admission order is the content-hash of the id, so
    the kept set is a deterministic function of the data alone.

    Output: (id, source, n_tokens, cum_tokens, kept). The first
    document of a source is always admitted even if it alone exceeds
    the cap (a quota that can admit nothing is useless); callers
    filter on ``kept``.
    """
    d = docs.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("source"),
        token_count(text_col).alias("n_tokens"),
    )
    order = md5_int60(F.col("id").cast("string"))
    w = (
        Window.partitionBy("source")
        .orderBy(order, "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = d.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return d.withColumn(
        "kept",
        (F.col("cum_tokens") <= cap_tokens)
        | (F.col("cum_tokens") == F.col("n_tokens")),
    )


def token_budget_allocation(
    df: DataFrame,
    source_col: str,
    weight_col: str,
    budget: int,
) -> DataFrame:
    """Water-filling token-budget allocation across sources: find the
    level L such that every source contributes min(its_tokens, L) and
    the total spends the budget — THE data-mixing computation when a
    training run has a token budget and no source may dominate.

    Exact integer solution on the source relation (tiny): sources
    sort ascending by weight; for each prefix j the candidate level
    is L_j = ⌊(B − P_j)/(S − j)⌋, and exactly one j satisfies
    w_j ≤ L_j < w_{j+1} (sentinels at the ends) — selected by filter,
    no iteration. If the budget covers everything, every source gets
    its full weight and the level reports the max. The ≤ S−j−1 token
    remainder left by the floor is reported, not silently spread.

    Output: (source, n_tokens, level, alloc, leftover) — leftover
    identical on every row (window over sources).

    Scale: one partial-agg shuffle for the per-source weights; the
    water-filling runs on the source relation (dataset-card-sized).
    """
    from pyspark.sql import Window

    per = df.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(F.col(weight_col)).cast("long").alias("w")
    )
    w_ord = Window.orderBy("w", "source")
    wall = Window.partitionBy()
    ranked = per.select(
        "source", "w",
        F.row_number().over(w_ord).alias("j"),
        F.sum("w").over(
            Window.orderBy("w", "source").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ).alias("pj"),
        F.count(F.lit(1)).over(wall).alias("s"),
        F.sum("w").over(wall).alias("total"),
    )
    # candidate level if every source with index > j-1 is capped;
    # j runs 1..S here, prefix EXCLUDING row j is pj - w
    cand = ranked.select(
        "*",
        F.floor(
            (F.lit(budget) - (F.col("pj") - F.col("w")))
            / (F.col("s") - F.col("j") + 1)
        ).cast("long").alias("lvl"),
    )
    # the valid row: previous weight <= lvl < own weight  ->  every
    # source before j is uncapped, j.. are capped at lvl
    prev_w = F.lag("w", 1).over(w_ord)
    valid = cand.select(
        "*", F.coalesce(prev_w, F.lit(-1)).alias("wprev")
    ).filter(
        (F.col("lvl") < F.col("w")) & (F.col("lvl") >= F.col("wprev"))
    ).orderBy("j").limit(1)
    # budget >= total: no capping anywhere — level = max weight
    fallback = ranked.filter(F.col("j") == F.col("s")).select(
        F.when(F.lit(budget) >= F.col("total"), F.col("w"))
        .alias("lvl_fb")
    )
    level = F.broadcast(
        valid.select(F.col("lvl").alias("_lvl"))
        .join(fallback, how="full")
        .select(F.coalesce("lvl_fb", "_lvl").alias("_lvl"))
    )
    alloc = F.least(F.col("w"), F.col("_lvl"))
    out = per.join(level).select(
        "source",
        F.col("w").alias("n_tokens"),
        F.col("_lvl").cast("long").alias("level"),
        alloc.cast("long").alias("alloc"),
    )
    wall2 = Window.partitionBy()
    spent = F.sum("alloc").over(wall2)
    spendable = F.least(F.lit(budget), F.sum("n_tokens").over(wall2))
    return out.select(
        "source", "n_tokens", "level", "alloc",
        (spendable - spent).cast("long").alias("leftover"),
    )


#: exact integer square root as a Column expression: floor(sqrt(n))
#: seeded by libm then CORRECTED at the boundaries, so the result is
#: the true isqrt regardless of either engine's sqrt rounding.
def _isqrt_expr(n: str) -> str:
    s0 = f"CAST(floor(sqrt(CAST({n} AS DOUBLE))) AS BIGINT)"
    return (
        f"(CASE WHEN {s0} * {s0} > {n} THEN {s0} - 1 "
        f"WHEN ({s0} + 1) * ({s0} + 1) <= {n} THEN {s0} + 1 "
        f"ELSE {s0} END)"
    )


def temperature_allocation(
    df: DataFrame,
    source_col: str,
    weight_col: str,
    budget: int,
    temperature: str = "sqrt",
) -> DataFrame:
    """Temperature-weighted token-budget split across sources:
    alloc_i ∝ n_i^α with α = 1/2 (``temperature="sqrt"`` — the
    standard multilingual up-sampling exponent) or α = 1
    (``"linear"`` — proportional). The water-filling allocator caps
    dominant sources at a level; the temperature allocator instead
    RESHAPES the whole distribution — flatter than proportional,
    heavier than uniform (Conneau '19 XLM-style sampling).

    Exactness: weights are EXACT integer square roots (libm-seeded,
    boundary-corrected — no perfect-square ulp risk), and the split
    is largest-remainder apportionment: base_i = B·w_i div W, then
    the leftover units go to the largest remainders (B·w_i mod W,
    ties to the smaller source key) — allocations are integers that
    sum to EXACTLY the budget, and every step is replayable SQL.

    Output: (source, n_tokens, w, alloc) — Σ alloc = budget.
    Scale: one partial-agg shuffle; apportionment runs on the source
    relation (dataset-card-sized; global windows allowlisted like
    `group_shares`). Overflow envelope: budget × max(w) must fit
    int64 — at α=1/2 that is budget × isqrt(max_tokens) < 9.2e18,
    comfortable for any real (budget, corpus) pair (1e12 tokens of
    budget against a 1e12-token source is 1e18).
    """
    per = df.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(F.col(weight_col)).cast("long").alias("n_tokens")
    )
    return temperature_allocation_from_counts(per, budget, temperature)


def temperature_allocation_from_counts(
    per: DataFrame,
    budget: int,
    temperature: str = "sqrt",
) -> DataFrame:
    """The apportionment over a pre-aggregated (source, n_tokens)
    relation — shared verbatim by the batch entry point and the
    streaming twin's read side (per-source counts are mergeable sums,
    so the rolled state finishes into the batch answer bitwise)."""
    from pyspark.sql import Window

    if temperature not in ("sqrt", "linear"):
        raise ValueError("temperature must be 'sqrt' or 'linear'")
    w_expr = (
        F.expr(_isqrt_expr("n_tokens"))
        if temperature == "sqrt"
        else F.col("n_tokens")
    )
    wall = Window.partitionBy()
    weighted = per.select(
        "source", "n_tokens", w_expr.cast("long").alias("w")
    ).select(
        "source", "n_tokens", "w", F.sum("w").over(wall).alias("_W")
    )
    b = F.lit(int(budget))
    based = weighted.select(
        "source",
        "n_tokens",
        "w",
        F.expr(f"({int(budget)} * w) div _W").cast("long").alias("_base"),
        ((b * F.col("w")) % F.col("_W")).cast("long").alias("_rem"),
    )
    w_rank = Window.orderBy(F.desc("_rem"), F.asc("source"))
    ranked = based.select(
        "*",
        F.row_number().over(w_rank).alias("_rk"),
        (b - F.sum("_base").over(wall)).cast("long").alias("_left"),
    )
    return ranked.select(
        "source",
        "n_tokens",
        "w",
        (
            F.col("_base")
            + F.when(F.col("_rk") <= F.col("_left"), F.lit(1)).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("alloc"),
    )
