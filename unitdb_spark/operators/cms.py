"""Count-min sketch: frequency estimation for unbounded key spaces.

At 100 TB a per-key exact count of a high-cardinality column (tokens,
topics, user ids) costs a full shuffle of the key space. A count-min
sketch (Cormode & Muthukrishnan '05) bounds that to a fixed d×w grid:

- build: one pass, group by (row, hash_row(key) % width) — the shuffle
  carries at most d×w counter partials regardless of cardinality;
- estimate(key) = min over rows of grid[row][hash_row(key) % width] —
  an overestimate with error ≤ εN (ε = e/width) at probability 1-δ
  (δ = e^-depth).

Uses: hot-key detection feeding `operators.skew.salted_agg`, vocab
truncation before exact counting, streaming heavy-hitter monitors.

Hashing is md5-derived (first 15 hex chars → int, salted per row) so
the whole sketch — grid and estimates — is bit-reproducible in any SQL
engine: the DuckDB oracle replays it exactly. For a hot loop, swap
``_bucket_expr`` to xxhash64 (same structure, JVM-only hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_expr(key: Column, row: int, width: int) -> Column:
    from unitdb_spark.functions.portable_hash import md5_int60

    h = md5_int60(F.concat(key.cast("string"), F.lit(f"#{row}")))
    return F.pmod(h, F.lit(width))


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """One-pass sketch build. Output: (row, bucket, cnt), ≤ depth×width
    rows total — the exchange after map-side partial aggregation is
    bounded by the grid size, never by key cardinality."""
    key = F.col(key_col)
    rows = df.select(
        F.posexplode(
            F.array(*[_bucket_expr(key, r, width) for r in range(depth)])
        ).alias("row", "bucket")
    )
    return rows.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    grid: DataFrame, keys: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Point estimates for a (small) key set: broadcast the grid
    (≤ depth×width rows), join each key's d buckets, take the min.
    Output: (key, est_count)."""
    key = F.col(key_col)
    probes = keys.select(
        key.alias("key"),
        F.posexplode(
            F.array(*[_bucket_expr(key, r, width) for r in range(depth)])
        ).alias("row", "bucket"),
    )
    joined = probes.join(F.broadcast(grid), on=["row", "bucket"], how="left").select(
        "key", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    return joined.groupBy("key").agg(F.min("cnt").alias("est_count"))
