"""Data profiling: one-pass per-column statistics for any table.

The reference has no profiling surface (its introspection stops at
``Varz`` counters, reference: db.go:454-472); a training-data pipeline
needs a cheap "what is in this table" pass before heavier operators —
null rates decide filters, distinct counts decide join strategies and
salting, min/max bounds decide partition layouts.

Spark-first shape: ONE aggregation over the table computes every
column's stats (count/nulls/distinct/min/max) in a single scan, then a
``stack`` unpivot turns the one wide row into one row per column — the
unpivot runs on a single row, so its cost is zero. Min/max land in a
typed slot (numeric → double, string → string, timestamp → epoch
seconds) instead of a stringly-typed union, so results are exact and
engine-portable (no float-rendering drift between engines).

Scale: with ``exact_distinct=True`` Spark plans the multi-column
COUNT(DISTINCT) via an Expand (rows × distinct-columns, one shuffle)
— fine up to mid scale but the expand multiplies the shuffle by the
number of profiled columns. At 100 TB pass ``exact_distinct=False``:
``approx_count_distinct`` (HLL++) keeps the plan a plain single-pass
partial agg with no Expand and ~0.6 KB of state per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def table_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Profile ``columns`` (default: all) in one scan.

    Returns one row per column:
    ``column, n_rows, n_nonnull, n_distinct, min_num, max_num,
    min_str, max_str, min_ts_s, max_ts_s`` — the min/max slot that
    doesn't apply to the column's type is NULL.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = columns if columns is not None else list(fields)
    unknown = [c for c in cols if c not in fields]
    if unknown:
        raise ValueError(f"unknown columns: {unknown}")

    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        dt = fields[c]
        aggs.append(F.count(c).alias(f"__nn_{c}"))
        if exact_distinct:
            aggs.append(F.countDistinct(c).alias(f"__nd_{c}"))
        else:
            aggs.append(F.approx_count_distinct(c).alias(f"__nd_{c}"))
        if isinstance(dt, _NUMERIC):
            aggs.append(F.min(c).cast("double").alias(f"__mn_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"__mx_{c}"))
        elif isinstance(dt, T.TimestampType):
            aggs.append(F.unix_timestamp(F.min(c)).alias(f"__mn_{c}"))
            aggs.append(F.unix_timestamp(F.max(c)).alias(f"__mx_{c}"))
        elif isinstance(dt, T.StringType):
            aggs.append(F.min(c).alias(f"__mn_{c}"))
            aggs.append(F.max(c).alias(f"__mx_{c}"))
        else:
            # opaque types (binary, array, struct): presence stats only
            aggs.append(F.lit(None).alias(f"__mn_{c}"))
            aggs.append(F.lit(None).alias(f"__mx_{c}"))
    wide = df.agg(*aggs)

    def slot(c: str, kind: str, field: str):
        dt = fields[c]
        is_num = isinstance(dt, _NUMERIC)
        is_ts = isinstance(dt, T.TimestampType)
        is_str = isinstance(dt, T.StringType)
        want = {"num": is_num, "ts": is_ts, "str": is_str}[kind]
        if not want:
            return "CAST(NULL AS DOUBLE)" if kind == "num" else (
                "CAST(NULL AS BIGINT)" if kind == "ts" else "CAST(NULL AS STRING)"
            )
        cast = {"num": "DOUBLE", "ts": "BIGINT", "str": "STRING"}[kind]
        return f"CAST(`__{field}_{c}` AS {cast})"

    rows = ", ".join(
        f"'{c}', CAST(`__nn_{c}` AS BIGINT), CAST(`__nd_{c}` AS BIGINT), "
        f"{slot(c, 'num', 'mn')}, {slot(c, 'num', 'mx')}, "
        f"{slot(c, 'str', 'mn')}, {slot(c, 'str', 'mx')}, "
        f"{slot(c, 'ts', 'mn')}, {slot(c, 'ts', 'mx')}"
        for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {rows}) AS (column, n_nonnull, n_distinct, "
        "min_num, max_num, min_str, max_str, min_ts_s, max_ts_s)",
        "CAST(`__n_rows` AS BIGINT) AS n_rows",
    ).select(
        "column", "n_rows", "n_nonnull", "n_distinct",
        "min_num", "max_num", "min_str", "max_str", "min_ts_s", "max_ts_s",
    )
