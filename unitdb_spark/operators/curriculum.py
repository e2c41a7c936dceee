"""Curriculum layout keys: quality-banded, hash-interleaved order.

The last step before training data hits the trainer is deciding the
ORDER it streams in. Two common asks: (a) curriculum — easier/cleaner
bands first; (b) within a band, thorough mixing so no source or
near-dup cluster clumps into one training window. Both reduce to a
SORT KEY, and like `operators/zorder.py` this module computes the key
and leaves the sort to the write path (a range-partitioned write, a
bucketed table, or the trainer's shard reader).

Scale contract: band assignment uses FIXED thresholds on the score —
a pure map-side projection, NO global rank/ntile (a global ntile is a
single-partition sort, the classic scale killer; fixed thresholds
cost nothing and are reproducible run to run). The within-band order
is the engine-portable content hash (`md5_int60`), so the interleave
is deterministic, layout-independent, and replayable by any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from unitdb_spark.functions.portable_hash import md5_int60


def curriculum_key(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    n_bands: int = 4,
    easy_first: bool = True,
) -> DataFrame:
    """(id, band, ord_key) — sort by (band, ord_key) to stream the
    corpus in curriculum order.

    ``score_col`` must be a [0, 1] quality score (higher = cleaner,
    e.g. `functions.text.quality_score`). ``easy_first`` puts the
    high-score band first (band 0). Out-of-range scores clamp into
    the edge bands. ``ord_key`` = content hash of the id — a
    deterministic shuffle within each band.
    """
    if n_bands < 1:
        raise ValueError(f"n_bands must be >= 1, got {n_bands}")
    s: Column = F.col(score_col).cast("double")
    raw = (F.lit(1.0) - s) if easy_first else s
    band = F.greatest(
        F.least(F.floor(raw * F.lit(float(n_bands))), F.lit(n_bands - 1)),
        F.lit(0),
    ).cast("int")
    ordk = md5_int60(F.concat(F.col(id_col).cast("string"), F.lit(":curr")))
    return df.select(
        F.col(id_col),
        band.alias("band"),
        ordk.alias("ord_key"),
    )
