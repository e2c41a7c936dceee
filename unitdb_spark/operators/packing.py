"""Sequence packing: assign documents to fixed-token training bins.

The concat-and-chunk packing used by GPT-style training pipelines:
documents are laid end-to-end in a deterministic order and the stream
is cut every ``ctx_tokens`` tokens; a document's bin is where its
first token lands. Pure window arithmetic — exactly reproducible in
SQL, no UDF.

Scale shape: packing is SHARD-LOCAL. A global document order would be
a single-partition window sort (the classic scale killer); instead
each shard (any deterministic key — here an id-derived one so the SQL
oracle can replay it) packs independently, so the one shuffle
partitions by shard and sorts within, and bins are (shard, bin_id)
pairs. Training runs consume shards independently anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from unitdb_spark.functions.text import token_count


def pack_sequences(
    df: DataFrame,
    ctx_tokens: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard: Column | None = None,
    n_shards: int = 8,
) -> DataFrame:
    """Assign each document a (shard, bin_id, bin_offset) placement.

    ``shard`` defaults to ``id % n_shards`` (engine-portable); pass any
    deterministic Column to shard by date/source/etc. Documents longer
    than ``ctx_tokens`` span bins — their bin is where they start,
    matching concat-and-chunk semantics.

    Output: (id, shard, n_tokens, bin_id, bin_offset).
    """
    id_c = F.col(id_col)
    shard_c = shard if shard is not None else F.pmod(id_c, F.lit(n_shards))
    t = df.select(
        id_c.alias("id"),
        shard_c.cast("long").alias("shard"),
        token_count(text_col).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("id")
    cum_before = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("_off")
    return t.select(
        "id",
        "shard",
        "n_tokens",
        F.floor(cum_before / F.lit(ctx_tokens)).cast("long").alias("bin_id"),
        F.pmod(cum_before, F.lit(ctx_tokens)).cast("long").alias("bin_offset"),
    )
