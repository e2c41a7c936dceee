"""Z-order (Morton) multi-dimensional layout clustering.

The reference prunes one dimension physically (topic-trie blocks over
time-ordered windows, unitdb's partition layout); at 100 TB a table is
usually filtered on TWO axes at once (tenant AND time, user AND hour),
and a single sort column gives locality on one axis only. Interleaving
the bits of both axes into one Morton key and range-partitioning on it
gives every output file a small bounding box in BOTH dimensions — so
Parquet min/max stats prune files for either predicate (the same trick
as Delta Lake's OPTIMIZE ZORDER, built here from plain DataFrame ops).

The interleave is pure integer bit arithmetic — 2×`bits` shift/mask
terms unrolled into one codegen expression, no UDF — and replays
exactly in any SQL engine with `>>`/`<<`/`&`/`|`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column | str, y: Column | str, bits: int = 16) -> Column:
    """Morton interleave of two non-negative ints clamped to
    [0, 2^bits): bit i of x lands at position 2i, bit i of y at 2i+1.
    2×bits unrolled shift/mask terms — one codegen projection."""
    if not 1 <= bits <= 31:
        raise ValueError("zorder_key: bits must be in [1, 31]")
    xc = (F.col(x) if isinstance(x, str) else x).cast("long")
    yc = (F.col(y) if isinstance(y, str) else y).cast("long")
    mask = (1 << bits) - 1
    xb = F.greatest(F.least(xc, F.lit(mask)), F.lit(0))
    yb = F.greatest(F.least(yc, F.lit(mask)), F.lit(0))
    z: Column = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(xb.bitwiseAND(F.lit(1 << i)), i)
        ).bitwiseOR(F.shiftleft(yb.bitwiseAND(F.lit(1 << i)), i + 1))
    return z


def zorder_layout(
    df: DataFrame,
    x: Column | str,
    y: Column | str,
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Cluster ``df`` for two-dimensional pruning: range-partition +
    sort on the Morton key, then drop it. Each output file's (x, y)
    bounding box is a small Z-curve segment, so a write of this frame
    prunes on min/max stats for predicates on EITHER column. This is a
    write-path operator — the one shuffle is the price of every future
    scan skipping most files."""
    keyed = df.withColumn("_zkey", zorder_key(x, y, bits))
    parted = (
        keyed.repartitionByRange(num_partitions, "_zkey")
        if num_partitions
        else keyed.repartitionByRange("_zkey")
    )
    return parted.sortWithinPartitions("_zkey").drop("_zkey")
