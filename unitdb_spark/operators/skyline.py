"""2-D skyline (Pareto frontier) — "best tradeoff" rows at scale.

The skyline of a table under (minimize A, maximize B) is the set of
rows no other row dominates (q dominates p iff q.A <= p.A and
q.B >= p.B with at least one strict). It's the classic "cheapest part
per quality tier" / "best price-size frontier" operator (Börzsönyi
'01) — a dominance NOT EXISTS in SQL, quadratic if evaluated
naively.

Scale shape — the distributive two-stage plan:

1. **Bucket-local skyline** (parallel): bucket rows by the minimized
   dimension; inside each bucket, dominance against same-bucket rows
   falls out of two partitioned RANGE windows (max of B over
   strictly-lower A, and over lower-or-equal A). Skylines are
   distributive — the global skyline is a subset of the union of
   local skylines over ANY partition of the rows — so stage 1 is a
   lossless pruning filter. Within a bucket the survivors form a
   strictly-decreasing staircase in B, so the survivor count per
   bucket is bounded by the number of distinct B values (p_size has
   ~50) — the stage-2 input is buckets × |distinct B|, thousands of
   rows at any corpus size, not corpus-sized.
2. **Global skyline** over the survivors: the same two windows,
   unpartitioned. This IS a single-partition window by construction
   over the provably tiny survivor relation (allowlisted in the
   plan-audit CI, same class as the global-total windows).

Exactness: transitivity of dominance means every globally dominated
row is dominated by some true skyline row, and true skyline rows are
never pruned — so stage 1 ∪ stage 2 reproduces the NOT EXISTS oracle
row-for-row. All comparisons are integer (cents / sizes), so the
match is bitwise.

The reference engine has no ranking surface; north-star analytics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dominated(min_col: str, max_col: str, part_cols: list[str]):
    """Dominance predicate via two RANGE windows ordered by the
    minimized column: strictly-lower-A rows with B >= mine, or
    lower-or-equal-A rows with B > mine (the latter excludes self
    automatically). Returns the boolean column."""
    if part_cols:
        base = Window.partitionBy(*part_cols).orderBy(
            F.col(min_col).cast("long")
        )
    else:
        base = Window.orderBy(F.col(min_col).cast("long"))
    w_strict = base.rangeBetween(Window.unboundedPreceding, -1)
    w_incl = base.rangeBetween(Window.unboundedPreceding, 0)
    return (
        F.max(F.col(max_col)).over(w_strict) >= F.col(max_col)
    ) | (F.max(F.col(max_col)).over(w_incl) > F.col(max_col))


def skyline2d(
    df: DataFrame,
    min_col: str,
    max_col: str,
    bucket_width: int = 1000,
) -> DataFrame:
    """Exact 2-D skyline of ``df`` under (minimize ``min_col``,
    maximize ``max_col``), both integer-typed. Duplicate (A, B)
    points do not dominate each other (dominance needs one strict
    inequality), so co-optimal duplicates are all kept — matching
    the SQL NOT EXISTS semantics.

    ``bucket_width`` controls stage-1 parallelism (bucket =
    A div width); it affects only the plan, never the result.
    """
    b = df.withColumn(
        "_bkt", (F.col(min_col).cast("long") / F.lit(int(bucket_width))).cast("long")
    )
    local = b.withColumn(
        "_dom", _dominated(min_col, max_col, ["_bkt"])
    ).filter(~F.coalesce(F.col("_dom"), F.lit(False)))
    survivors = local.drop("_dom", "_bkt")
    out = survivors.withColumn(
        "_dom", _dominated(min_col, max_col, [])
    ).filter(~F.coalesce(F.col("_dom"), F.lit(False)))
    return out.drop("_dom")
