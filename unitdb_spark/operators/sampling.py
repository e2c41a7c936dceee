"""Deterministic sampling and dataset splits for training pipelines.

`df.sample()` is seed-dependent *per partition layout* — the same seed
over a repartitioned table selects different rows, which is fatal for
reproducible training sets. These operators derive a uniform [0,1)
variate from a *content key* (md5 of the id — engine-portable, layout-
independent), so:

- the same row is always in the same sample/split, on any engine, any
  partitioning, any day;
- sampling is a pure map-side filter — no shuffle, no state, trivially
  correct at 100 TB;
- train/valid/test assignment is stable under re-runs and incremental
  appends (new rows hash into splits at the target ratios).

The variate is (first 15 hex chars of md5) / 2^60 — 60 uniform bits,
exactly reproducible in any SQL engine with md5 + hex casts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from unitdb_spark.functions.portable_hash import INT60_DENOM, md5_int60


def uniform_hash(key: Column | str, salt: str = "sample") -> Column:
    """Deterministic uniform [0,1) from a key column + salt.

    NULL keys hash via a sentinel instead of propagating NULL — a
    null-propagating concat would silently drop every null-key row
    from samples and dump them all into one split."""
    k = F.col(key) if isinstance(key, str) else key
    keyed = F.concat(
        F.coalesce(k.cast("string"), F.lit("\x00null")), F.lit(":" + salt)
    )
    return md5_int60(keyed).cast("double") / F.lit(INT60_DENOM)


def deterministic_sample(
    df: DataFrame, fraction: float, key_col: str, salt: str = "sample"
) -> DataFrame:
    """Keep ~fraction of rows, chosen by content hash (not layout)."""
    return df.filter(uniform_hash(key_col, salt) < F.lit(fraction))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    key_col: str,
    salt: str = "sample",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum sampling rates (e.g. downweight a dominant source in
    a training mix). The fractions map is inlined as a CASE expression —
    no join, still one map-side filter."""
    frac: Column = F.lit(float(default_fraction))
    for value, f in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == F.lit(value), F.lit(float(f))).otherwise(frac)
    return df.filter(uniform_hash(key_col, salt) < frac)



def _race_key(weight_col: str, key, salt: str, op_name: str):
    """The Efraimidis-Spirakis race key -ln(u)/w as ONE shared
    construction (null-key sentinel, (h+1)/2^60 uniform, round-6,
    nonpositive-weight raise) — `weighted_sample` and the per-stratum
    variant MUST stay bitwise identical (a cross-check test depends on
    it), so the contract lives here once.

    u = (h+1)/2^60 lands in (0, 1]: ln(0) is the degenerate corner,
    ln(1)=0 is fine (race key 0 sorts first — the "instant win" draw).
    """
    w = F.col(weight_col).cast("double")
    k = F.col(key) if isinstance(key, str) else key
    keyed = F.concat(
        F.coalesce(k.cast("string"), F.lit("\x00null")), F.lit(":" + salt)
    )
    u = (md5_int60(keyed).cast("double") + F.lit(1.0)) / F.lit(INT60_DENOM)
    race = F.round(-F.log(u) / w, 6)
    return k, F.when(w > 0, race).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"{op_name}: nonpositive weight for key "),
                k.cast("string"),
            )
        )
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    key_col: str,
    salt: str = "wsample",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis '06)
    — select ``n`` rows with inclusion probability proportional to
    ``weight_col``, deterministically.

    The exponential-race formulation: each row draws
    e_i = -ln(u_i) / w_i  ~  Exp(rate=w_i) with u_i the content-hash
    uniform (so the race is layout/engine-independent, like every
    sampler here); the n smallest e_i win. Equivalent to the paper's
    "take top-n by u^(1/w)" but numerically tamer for tiny weights.

    Cross-engine contract: u_i = (hash+1)/2^60 is an exact double on
    both engines; one ln() per row is the only libm call, and the race
    key is rounded to 6 decimals (repo convention) with the id as the
    tie-break, so an ulp of libm divergence cannot reorder the sample.

    Scale shape: key computation is pure map-side; the global smallest-n
    cut is orderBy+limit = TakeOrderedAndProject (per-partition top-n,
    then a driver-side merge of n-row heaps — no single-task window, no
    full sort). Weights must be > 0: nonpositive-weight rows raise at
    plan build (a silent filter would skew the advertised inclusion
    probabilities).

    Output: the winning rows + (race_r, sample_rank).
    """
    if n < 1:
        raise ValueError("weighted_sample: n must be >= 1")
    k, guarded = _race_key(weight_col, key_col, salt, "weighted_sample")
    from pyspark.sql.window import Window

    winners = df.withColumn("race_r", guarded).orderBy(
        F.col("race_r").asc(), k.asc()
    ).limit(n)
    # ranking the n winners is an n-row window — driver-result sized,
    # not data sized (the heavy cut already happened in TakeOrdered)
    return winners.withColumn(
        "sample_rank",
        F.row_number().over(Window.orderBy(F.col("race_r").asc(), k.asc())),
    )


def weighted_sample_per_stratum(
    df: DataFrame,
    n_per: int,
    weight_col: str,
    key_col: str,
    strata_col: str,
    salt: str = "wsample",
) -> DataFrame:
    """Per-stratum weighted sampling without replacement: the
    Efraimidis-Spirakis race run independently inside each stratum
    (e.g. n docs per source, weighted by length). Same deterministic
    race key as ``weighted_sample``; the cut is a rank window over
    (stratum, race) that Spark executes as WindowGroupLimit — a
    map-side partial top-n per stratum BEFORE the exchange, so the
    shuffle carries ≤ n_per rows per stratum per input partition.

    Output: winning rows + (race_r, stratum_rank).
    """
    if n_per < 1:
        raise ValueError("weighted_sample_per_stratum: n_per must be >= 1")
    from pyspark.sql.window import Window

    k, guarded = _race_key(
        weight_col, key_col, salt, "weighted_sample_per_stratum"
    )
    win = Window.partitionBy(strata_col).orderBy(
        F.col("race_r").asc(), k.asc()
    )
    return (
        df.withColumn("race_r", guarded)
        .withColumn("stratum_rank", F.row_number().over(win))
        .filter(F.col("stratum_rank") <= n_per)
    )


def split_assign(
    key: Column | str,
    ratios: dict[str, float],
    salt: str = "split",
) -> Column:
    """Stable train/valid/test label from cumulative hash ranges.

    ``ratios`` maps label -> weight (normalized internally). Iteration
    order is sorted-by-label for determinism: with {"train": .8,
    "valid": .1, "test": .1} the cumulative boundaries are
    u < 0.1 -> 'test', u < 0.9 -> 'train', else 'valid' (sorted order
    test, train, valid). The measure of each label always equals its
    normalized weight; only the u-interval layout depends on the
    label sort.
    """
    total = sum(ratios.values())
    u = uniform_hash(key, salt)
    expr: Column | None = None
    cum = 0.0
    items = sorted(ratios.items())
    for label, w in items[:-1]:
        cum += w / total
        cond = u < F.lit(cum)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    last_label = items[-1][0]
    return (expr.otherwise(F.lit(last_label)) if expr is not None else F.lit(last_label)).alias(
        "split"
    )


def cluster_balanced_sample(
    embeddings: DataFrame,
    k: int = 8,
    cap: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster-balanced selection over an embedding corpus: k-means
    cells as the diversity structure, at most ``cap`` vectors admitted
    per cell in content-hash order — the curation move that stops one
    dominant mode (boilerplate cluster, one topic) from eating the
    whole budget, where uniform sampling would reproduce the skew.

    Determinism end to end: the cells come from the md5-seeded
    deterministic Lloyd fit (`operators.kmeans.kmeans_lloyd`), the
    admission order is md5 of the id (`mixture.source_cap`'s
    convention) — the kept set is a function of the data alone, so a
    SQL oracle replays it exactly.

    Scale: the Lloyd fit's cost model (centroids broadcast, one scan
    per round); the cap is one per-cell window on the assignment
    relation (ids + cell, not vectors).

    Output: (vec_id, cell, admission, kept) — every vector keeps its
    row (the audit view); filter on ``kept`` for the sample.
    """
    from pyspark.sql.window import Window

    from unitdb_spark.operators.kmeans import kmeans_lloyd

    assign = kmeans_lloyd(embeddings, k=k, n_iters=1,
                          id_col=id_col, vec_col=vec_col)
    order = md5_int60(F.col(id_col).cast("string"))
    w = Window.partitionBy("cell").orderBy(order, id_col)
    return assign.select(
        id_col,
        "cell",
        F.row_number().over(w).alias("admission"),
    ).withColumn("kept", F.col("admission") <= cap)


def cluster_outlier_report(
    embeddings: DataFrame,
    k: int = 8,
    n_iters: int = 1,
    per_cell: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space outlier pruning: within each k-means cell, rank
    members by cosine similarity to their OWN centroid (ascending) and
    flag the ``per_cell`` farthest — the curation pass that drops
    mislabeled/garbage vectors before contrastive training, where a
    global distance threshold would be meaningless across cells of
    different tightness.

    Output: (vec_id, cell, far_rank, outlier) — integer/boolean only;
    the float similarity orders the rank window (ties → smaller id)
    but never leaves the plan, so the result is engine-exact without
    any rounding convention.

    Scale: the Lloyd fit's cost model (centroids broadcast/inlined,
    one scan per round); the rank window partitions by cell over the
    (id, cell, sim) relation — vectors never shuffle.
    """
    from pyspark.sql.window import Window

    from unitdb_spark.operators.kmeans import kmeans_lloyd

    assign = kmeans_lloyd(
        embeddings, k=k, n_iters=n_iters,
        id_col=id_col, vec_col=vec_col, sim_out="_sim",
    )
    # kmeans_lloyd normalizes the id column to "vec_id" in its output;
    # alias back to the caller's name on the way out
    w = Window.partitionBy("cell").orderBy(F.col("_sim").asc(), "vec_id")
    return (
        assign.select(
            F.col("vec_id").alias(id_col), "cell",
            F.row_number().over(w).alias("far_rank"),
        )
        .withColumn("outlier", F.col("far_rank") <= per_cell)
    )
