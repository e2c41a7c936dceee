"""Declarative data-quality constraints over a DataFrame.

The dbt-tests / Great-Expectations core four — not_null, unique,
accepted_values, referential integrity — evaluated Spark-side so a
100 TB table is audited in ONE scan (plus one content-hash aggregate
per unique check and one broadcast anti-join per relationship), not one
query per constraint. The output is data (constraint, n_violations),
so pipelines gate on it like any other DataFrame.

Everything is exact integer counting — trivially oracle-replayable.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraints:
    """Declarative constraint set for one table.

    - ``not_null``: columns that must never be NULL.
    - ``unique``: column groups that must be row-unique.
    - ``accepted_values``: column -> allowed literal values.
    - ``relationships``: (local column, parent df, parent column) —
      every non-NULL local value must exist in the parent column.
    """

    not_null: list[str] = field(default_factory=list)
    unique: list[list[str]] = field(default_factory=list)
    accepted_values: dict[str, list] = field(default_factory=dict)
    relationships: list[tuple[str, DataFrame, str]] = field(
        default_factory=list
    )


def check_constraints(df: DataFrame, spec: Constraints) -> DataFrame:
    """One row per declared constraint: (constraint, n_violations).

    Scan shape: every not_null / accepted_values check is one
    conditional COUNT in a single aggregation over one scan of ``df``.
    A unique check is one groupBy on the key (counts rows beyond the
    first per key — the number of rows a dedup would drop). A
    relationship check is one left-anti join against the DISTINCT
    parent keys (aggregated parent side; broadcast when small).
    """
    pieces: list[DataFrame] = []
    aggs = []
    names = []
    for c in spec.not_null:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"_{len(names)}"))
        names.append(f"not_null:{c}")
    for c, vals in sorted(spec.accepted_values.items()):
        bad = (~F.col(c).isin(vals)) & F.col(c).isNotNull()
        aggs.append(F.count(F.when(bad, 1)).alias(f"_{len(names)}"))
        names.append(f"accepted_values:{c}")
    if aggs:
        wide = df.agg(*aggs)
        stack = F.explode(
            F.array(*[
                F.struct(
                    F.lit(n).alias("constraint"),
                    F.col(f"_{i}").alias("n_violations"),
                )
                for i, n in enumerate(names)
            ])
        ).alias("kv")
        pieces.append(wide.select(stack).select("kv.*"))
    for cols in spec.unique:
        name = "unique:" + ",".join(cols)
        dup_rows = (
            df.groupBy(*cols)
            .agg((F.count(F.lit(1)) - F.lit(1)).alias("_extra"))
            .agg(F.sum(F.greatest(F.col("_extra"), F.lit(0))).alias("n"))
            .select(
                F.lit(name).alias("constraint"),
                F.coalesce(F.col("n"), F.lit(0)).cast("long").alias(
                    "n_violations"
                ),
            )
        )
        pieces.append(dup_rows)
    for col, parent, parent_col in spec.relationships:
        name = f"relationship:{col}->{parent_col}"
        keys = parent.select(F.col(parent_col).alias(col)).distinct()
        orphans = (
            df.filter(F.col(col).isNotNull())
            .join(keys, col, "left_anti")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.lit(name).alias("constraint"),
                F.col("n").cast("long").alias("n_violations"),
            )
        )
        pieces.append(orphans)
    if not pieces:
        raise ValueError("check_constraints: the constraint spec is empty")
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out
