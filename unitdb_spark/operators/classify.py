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


def lr_fld(a: str, b: str, div: str) -> str:
    """Floor division of SQL expression ``a`` by positive ``b`` for
    either sign of ``a`` — the repo's nonneg-mod identity, rendered
    with the engine's truncating integer-division token (Spark 'div',
    DuckDB '//'; both truncate toward zero, so the identity text is
    otherwise shared)."""
    return f"((({a}) - ((({a}) % ({b})) + ({b})) % ({b})) {div} ({b}))"


def lr_step_exprs(
    w: list[str], xcols: list[str], ycol: str, div: str
) -> tuple[str, list[str]]:
    """One full-batch gradient-descent step of the integer logistic
    trainer as SQL text — shared between the Spark driver loop
    (weights as integer literals, div='div') and the DuckDB oracle
    (weights as CTE columns, div='//'):

        z_micro = fld(Σ w_j·x_j, 1000)           (x in permille)
        p_micro = round(1e6 / (1 + exp(−z_micro/1e6)))   [the ONE
            float touch per doc — micro-rounded, so the exact integer
            gradient sum is order-free and cross-engine identical]
        g_j     = fld((p_micro − y_micro)·x_j, 1000)

    Returns (p expression, per-feature gradient-term expressions over
    a column named ``_p``).
    """
    z = " + ".join(f"({wj} * {x})" for wj, x in zip(w, xcols))
    zf = lr_fld(z, "1000", div)
    p = (
        f"CAST(round(1000000.0 / (1.0 + exp(-(CAST({zf} AS DOUBLE)"
        f" / 1000000.0)))) AS BIGINT)"
    )
    gs = [lr_fld(f"(_p - {ycol}) * {x}", "1000", div) for x in xcols]
    return p, gs


def lr_update_expr(wexpr: str, gexpr: str, n_expr: str,
                   lr: tuple[int, int], div: str) -> str:
    """The weight update w' = w − fld(lr_num·G, lr_den·n) — exact
    integer micro-units, shared text (modulo the div token)."""
    return (
        f"({wexpr}) - "
        + lr_fld(f"{int(lr[0])} * ({gexpr})", f"{int(lr[1])} * ({n_expr})", div)
    )


def lr_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    steps: int = 3,
    lr: tuple[int, int] = (1, 2),
) -> DataFrame:
    """Train a logistic-regression quality classifier INSIDE the
    engine — full-batch gradient descent for a FIXED number of steps
    (the repo's iterative-operator determinism contract), on integer
    PERMILLE features and a micro-unit label, with EXACT integer
    weights: the only float touch is one micro-rounded sigmoid per
    document (`lr_step_exprs`), so gradient sums are order-free
    integers and a SQL oracle unrolling the same steps reproduces the
    trained weights BITWISE — cross-engine reproducible training, the
    property classic ML stacks give up first. The hashed scorer
    (`classify_score`) is the fixed-weight gate; this is the
    trainable one.

    Input: ``feature_cols`` integer columns in [0, 1000] (permille —
    include a constant-1000 bias column), ``label_col`` in
    {0, 1000000}. Learning rate lr[0]/lr[1]; update is the exact
    floor fld(lr_num·G_j, lr_den·n).

    Output: one row per feature — (feature, weight_micro) after
    ``steps`` full-batch steps.

    Scale: per step, ONE map-side-combined aggregation over the
    feature relation (current weights are plan literals — nothing is
    broadcast or joined); the driver holds d+1 longs per step, the
    classic bounded control-plane read. steps·1 passes total.
    """
    d = len(feature_cols)
    base = df.select(
        *[
            F.col(c).cast("long").alias(f"x{j + 1}")
            for j, c in enumerate(feature_cols)
        ],
        F.col(label_col).cast("long").alias("y"),
    )
    xcols = [f"x{j + 1}" for j in range(d)]
    w = [0] * d
    n = None
    for _ in range(int(steps)):
        p, gs = lr_step_exprs([str(v) for v in w], xcols, "y", "div")
        staged = base.selectExpr(*xcols, "y", f"{p} AS _p")
        agg = staged.selectExpr(
            *[f"{g} AS g{j + 1}" for j, g in enumerate(gs)]
        ).selectExpr(
            "CAST(count(*) AS BIGINT) AS n",
            *[f"CAST(sum(g{j + 1}) AS BIGINT) AS G{j + 1}" for j in range(d)],
        )
        row = agg.collect()[0]
        n = int(row["n"])
        if n == 0:
            break
        num, den = int(lr[0]), int(lr[1])
        for j in range(d):
            # python // floors for either sign — the identity's result
            w[j] -= (num * int(row[f"G{j + 1}"])) // (den * n)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(feature_cols[j], w[j]) for j in range(d)],
        "feature string, weight_micro long",
    )
