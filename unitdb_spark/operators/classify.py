"""Hashed linear text classifier (fastText-style scorer).

The standard cheap quality/safety gate in LLM data pipelines: a linear
model over hashed bag-of-ngram features (unigrams + word bigrams),
score = sigmoid(bias + mean of feature weights). The reference engine
has no ML surface (its analytics stop at counters, varz.go); this is
north-star pipeline coverage, not parity.

Two execution paths, chosen by whether a trained weight table exists:

- ``weights_df=None`` (hash-derived weights, e.g. for smoke-scoring or
  deterministic tests): the weight of bucket b is a pure md5 expression
  of b, so the whole scorer is ONE whole-stage-codegen projection —
  zero joins, zero shuffles, nothing leaves the JVM. The md5 idiom is
  `portable_hash.md5_int60`, so a SQL oracle replays it exactly.
- ``weights_df`` given (bucket long, weight double): features explode,
  broadcast-join the (bounded, ≤ n_buckets-row) weight table, and
  re-aggregate per document — one shuffle, map-side-combined to one
  row per doc before the exchange.

At 100 TB the hash path is embarrassingly parallel, and the trained
path's only exchange is the per-doc partial-agg output; the weight
table is capped by construction (hashing trick), so the broadcast
never outgrows the driver no matter the vocabulary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from unitdb_spark.functions.portable_hash import INT60_DENOM, md5_int60
from unitdb_spark.operators.dedup import raw_tokens


def hashed_features(tok_col: Column | str) -> Column:
    """Unigram + adjacent-bigram feature strings from a MATERIALIZED
    token-array column (bind tokens to a column first — an expression
    inlined here would re-tokenize per element, see
    dedup.shingles_from_tokens).  Bag semantics: duplicates kept."""
    toks = F.col(tok_col) if isinstance(tok_col, str) else tok_col
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def _bucket(feat: Column, n_buckets: int) -> Column:
    return F.pmod(md5_int60(feat), F.lit(n_buckets))


def _hash_weight(bucket: Column) -> Column:
    """Deterministic weight in [-0.5, 0.5) from the bucket id — the
    no-model path; replayable as
    CAST(('0x'||substr(md5(b),1,15)) AS BIGINT)/2^60 - 0.5."""
    return md5_int60(bucket.cast("string")) / F.lit(INT60_DENOM) - F.lit(0.5)


def classify_score(
    docs: DataFrame,
    weights_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1 << 18,
    bias: float = 0.0,
    threshold: float = 0.5,
) -> DataFrame:
    """Score documents with a hashed linear model.

    Output: (id, n_feats, score, label) where score =
    sigmoid(bias + sum(w[bucket(f)])/max(n_feats,1)) and label is the
    ``score >= threshold`` keep flag. Docs with zero features score
    sigmoid(bias).
    """
    d = docs.select(F.col(id_col).alias("id"), raw_tokens(text_col).alias("_tk"))
    d = d.select("id", hashed_features("_tk").alias("_f"))
    d = d.select("id", "_f", F.size("_f").alias("n_feats"))

    if weights_df is None:
        # pure-expression path: fold the weight sum inside the array
        wsum = F.aggregate(
            "_f",
            F.lit(0.0),
            lambda acc, x: acc + _hash_weight(_bucket(x, n_buckets)),
        )
        scored = d.select("id", "n_feats", wsum.alias("_wsum"))
    else:
        ex = d.select(
            "id", "n_feats", F.explode_outer("_f").alias("_feat")
        ).withColumn("bucket", _bucket(F.col("_feat"), n_buckets))
        joined = ex.join(F.broadcast(weights_df), on="bucket", how="left")
        scored = joined.groupBy("id", "n_feats").agg(
            F.sum(F.coalesce(F.col("weight"), F.lit(0.0))).alias("_wsum")
        )

    z = F.lit(bias) + F.col("_wsum") / F.greatest(F.col("n_feats"), F.lit(1))
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return scored.select(
        "id",
        "n_feats",
        score.alias("score"),
        (score >= F.lit(threshold)).alias("label"),
    )
