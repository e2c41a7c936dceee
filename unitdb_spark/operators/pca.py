"""Distributed first-principal-component PCA in exact integer
fixed-point — the decomposition member of the embedding family.

`similarity.py`/`pq.py` answer retrieval questions; PCA answers the
*structure* question a curation stack asks of an embedding corpus:
what is the dominant axis of variation, and where does each document
sit along it (drift monitoring, coarse clustering, diversity
sampling, outlier triage).

Scale shape — the textbook single-pass second-moment pattern:

1. **Partial outer products** (`mapInPandas`, Arrow-batched): each
   batch quantizes its embedding block to int64 and emits ONE d x d
   partial Gram matrix plus component sums and a row count — d² + d
   + 1 rows per batch regardless of batch size. The corpus never
   shuffles; only d²-sized partials do (d=64 → 4096 longs).
2. **Merge + center**: partials sum by (i, j); the centered moment
   uses the exact integer identity
   M_ij = Σxy − μ_i·s_j − μ_j·s_i + n·μ_i·μ_j with μ = s div n —
   "covariance about the floored mean", deterministic in any engine.
   M is then scaled to Md = M div n so every later product stays far
   inside int64 at any corpus size.
3. **Power iteration** over the d²-row Md relation: fixed rounds (no
   convergence test — the `pagerank` determinism contract), v0 = all
   ones x scale, re-normalized each round by the integer quotient
   q = max(1, max|w| div scale) (the `hits_bipartite` max-norm
   trick — no sqrt, no decimal division). Every iteration is a
   d²-row join + d-row agg: control-plane sized.
4. **Projection**: each row's score along v1 via a broadcast join —
   one pass, no shuffle beyond the final agg.

Exactness contract: quantization floor(double(x) * quant) is the
same correctly-rounded double op in Spark and DuckDB; everything
after is BIGINT with truncating division (Spark `div` == DuckDB `//`
== trunc, verified for negatives), so an unrolled-CTE oracle matches
bitwise.

The reference engine stores opaque payloads only
(db_internal.go:59-60); north-star analytics per the builder brief.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: embedding quantization step: values in [-1, 1] become ~1e4-unit
#: ints, keeping every downstream product provably inside int64
#: (see the overflow audit in second_moment / power_iteration).
PCA_QUANT = 10_000

#: fixed-point scale of the iterated eigenvector (max-norm ~ scale).
PCA_SCALE = 1_000_000


def _partials_fn(vec_col: str, dim: int, quant: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        gram = np.zeros((dim, dim), dtype=np.int64)
        sums = np.zeros(dim, dtype=np.int64)
        n = 0
        for b in batches:
            if not len(b):
                continue
            m = np.stack(
                [np.asarray(v, dtype=np.float64) for v in b[vec_col]]
            )
            q = np.floor(m * quant).astype(np.int64)
            gram += q.T @ q
            sums += q.sum(axis=0)
            n += q.shape[0]
        ii, jj = np.indices((dim, dim))
        out = pd.DataFrame(
            {
                "i": ii.ravel().astype("int64"),
                "j": jj.ravel().astype("int64"),
                "v": gram.ravel(),
            }
        )
        srow = pd.DataFrame(
            {"i": np.arange(dim, dtype="int64"), "j": -1, "v": sums}
        )
        nrow = pd.DataFrame({"i": [-1], "j": [-1], "v": [n]})
        yield pd.concat([out, srow, nrow], ignore_index=True)

    return fn


def gram_partials(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    quant: int = PCA_QUANT,
) -> DataFrame:
    """The summed (i, j, v) partial relation: Gram cells (i, j ≥ 0),
    component sums (j = −1), row count (i = j = −1). MERGEABLE by
    summation — the streaming twin folds exactly these rows into its
    commit-logged state."""
    partials = df.mapInPandas(
        _partials_fn(vec_col, dim, quant), schema="i long, j long, v long"
    )
    return partials.groupBy("i", "j").agg(
        F.sum("v").cast("long").alias("v")
    )


def second_moment(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    quant: int = PCA_QUANT,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Single-pass centered integer second moment.

    Returns (md, mu, nrel):
    - md: (i, j, m) with m = M_ij div n, M the centered moment about
      the floored means — d² rows;
    - mu: (i, mu) floored component means — d rows;
    - nrel: 1-row (n).
    Each batch ships d² + d + 1 longs; the corpus never shuffles.
    """
    return moment_finish(gram_partials(df, vec_col, dim, quant))


def moment_finish(
    tot: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Center + scale the summed partial relation (shared verbatim by
    the batch path and the streaming twin's read side, so the rolled
    state finishes into bit-identical results)."""
    nrel = tot.filter((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("v").alias("n")
    )
    s = tot.filter((F.col("j") == -1) & (F.col("i") >= 0)).select(
        "i", F.col("v").alias("s")
    )
    mu = s.crossJoin(F.broadcast(nrel)).select(
        "i", F.expr("s div n").cast("long").alias("mu"), "s"
    )
    gram = tot.filter(F.col("j") >= 0).select("i", "j", F.col("v").alias("sxy"))
    a = mu.select(
        F.col("i").alias("i"), F.col("mu").alias("mu_i"), F.col("s").alias("s_i")
    )
    b = mu.select(
        F.col("i").alias("j"), F.col("mu").alias("mu_j"), F.col("s").alias("s_j")
    )
    md = (
        gram.join(F.broadcast(a), "i")
        .join(F.broadcast(b), "j")
        .crossJoin(F.broadcast(nrel))
        .select(
            "i",
            "j",
            F.expr(
                "(sxy - mu_i * s_j - mu_j * s_i + n * mu_i * mu_j) div n"
            )
            .cast("long")
            .alias("m"),
        )
    )
    return md, mu.select("i", "mu"), nrel


def power_iteration(
    md: DataFrame,
    dim: int = 64,
    iterations: int = 3,
    scale: int = PCA_SCALE,
) -> DataFrame:
    """Fixed-round power iteration over the d²-row integer moment.

    v0 = all ones x scale; each round w = Md·v (d-row agg over a
    d²-row join), then v = w div max(1, max|w| div scale). Truncating
    integer division both rounds and both engines; the unrolled-CTE
    replay is bitwise. Returns (i, v) — the (unnormalized-sign)
    dominant eigenvector in fixed point.
    """
    spark = md.sparkSession
    v = spark.range(dim).select(
        F.col("id").cast("long").alias("i"),
        F.lit(int(scale)).cast("long").alias("v"),
    )
    for _ in range(iterations):
        w = (
            md.join(v.select(F.col("i").alias("j"), "v"), "j")
            .groupBy("i")
            .agg(F.sum(F.col("m") * F.col("v")).cast("long").alias("w"))
        )
        q = w.agg(
            F.expr(f"greatest(1L, max(abs(w)) div {int(scale)}L)")
            .cast("long")
            .alias("q")
        )
        v = (
            w.crossJoin(F.broadcast(q))
            .select("i", F.expr("w div q").cast("long").alias("v"))
            .localCheckpoint(eager=False)
        )
    return v


def pca_project(
    df: DataFrame,
    mu: DataFrame,
    v: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quant: int = PCA_QUANT,
) -> DataFrame:
    """Project every row onto the fixed-point component: proj =
    Σ_i (x_i − μ_i)·v_i over quantized values — one posexplode +
    two broadcast joins + one agg; |proj| ≤ d·2·quant·scale ≈ 1e12,
    comfortably in int64. Output: (id, proj)."""
    comp = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(vec_col).alias("i", "x"),
    ).select(
        "id",
        F.col("i").cast("long").alias("i"),
        F.floor(F.col("x").cast("double") * F.lit(int(quant)))
        .cast("long")
        .alias("x"),
    )
    return (
        comp.join(F.broadcast(mu), "i")
        .join(F.broadcast(v), "i")
        .groupBy("id")
        .agg(
            F.sum((F.col("x") - F.col("mu")) * F.col("v"))
            .cast("long")
            .alias("proj")
        )
    )
