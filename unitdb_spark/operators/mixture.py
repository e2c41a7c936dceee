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
