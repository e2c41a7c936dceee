"""Bucketed-table support: shuffle-free co-located joins.

The reference co-locates a tenant's data by ring-hashing ``contract``
to a node (cluster.go:352-420); SURVEY §2.2 #25 maps that to Spark
partitioning. Partition columns solve pruning; BUCKETING solves the
other half — repeated joins/aggregations on the same key without
re-shuffling either side. A table written with ``bucketBy(n, key)``
records its hash-partitioning in the catalog, so a join of two tables
bucketed on the same key with the same bucket count needs NO Exchange
on either side: Catalyst sees the output partitioning already
satisfies the join's distribution requirement.

At 100 TB this is the difference between shuffling the fact table
once per query and never: bucket ``messages`` by contract for
tenant-scoped joins (sessions, ACL tables), bucket an IVF-assigned
embedding corpus by cell so every probe batch equi-joins its cells
in place.

Bucketed writes must go through ``saveAsTable`` (the bucket spec
lives in the catalog, not in the parquet footers) — plain
``.parquet(path)`` silently drops the spec. ``sortBy`` within buckets
additionally pre-sorts for sort-merge joins, removing the per-task
sort as well.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table bucketed on ``bucket_cols``.

    ``n_buckets`` must match between tables meant to co-join (Spark
    only elides the Exchange when both sides hash to the same bucket
    count). Rule of thumb: buckets ≈ cluster cores, fixed for the
    table's lifetime — repartition-by-key jobs can grow with data,
    bucket counts cannot (changing one is a rewrite).

    The input is repartitioned onto the bucket key first (r11):
    without it every input task writes its own file PER BUCKET —
    tasks × buckets tiny files (measured 64×32 = 2048 at sf0.1,
    tripling both write and downstream scan time); with it, one file
    per bucket and the writer's own hash does no further splitting.
    """
    writer = (
        df.repartition(n_buckets, *[df[c] for c in bucket_cols])
        .write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucket metadata rides along, so downstream joins
    on the bucket key skip their Exchange."""
    return spark.table(table)


def is_colocated_join_ready(
    spark: SparkSession, table_a: str, table_b: str, key: str
) -> bool:
    """Pre-flight check before betting a 100 TB join on the layout:
    True iff BOTH tables are bucketed on exactly ``key`` with equal
    bucket counts — the condition under which Catalyst elides the
    Exchange on both sides. A pipeline that can't assert this should
    plan the write-side repartition instead of discovering the double
    shuffle in production."""

    def spec(table: str) -> tuple[list[str], int] | None:
        rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
        cols: list[str] = []
        n = None
        for r in rows:
            if r["col_name"] == "Num Buckets":
                n = int(r["data_type"])
            elif r["col_name"] == "Bucket Columns":
                cols = [
                    c.strip(" `") for c in r["data_type"].strip("[]").split(",")
                ]
        return (cols, n) if n else None

    a, b = spec(table_a), spec(table_b)
    return (
        a is not None
        and b is not None
        and a[0] == [key]
        and b[0] == [key]
        and a[1] == b[1]
    )
