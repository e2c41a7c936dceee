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
