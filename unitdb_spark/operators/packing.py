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


def _default_shard(df: DataFrame, id_col: str, n_shards: int) -> Column:
    """Deterministic engine-portable shard key from the id column.

    ADVICE r11: `pmod(id, n)` on a non-numeric id is NULL for every
    row, silently collapsing the corpus into ONE NULL shard — the
    exact single-partition window the sharding exists to avoid.
    Dispatch on the id dtype: numeric ids keep the portable
    ``id % n_shards``; anything else shards by an md5-prefix integer
    (md5 exists verbatim in DuckDB, so oracles can replay it:
    ``conv(substring(md5(id),1,15),16,10) % n``).
    """
    id_c = F.col(id_col)
    dtype = dict(df.dtypes).get(id_col, "")
    numeric = dtype in (
        "tinyint", "smallint", "int", "bigint", "float", "double"
    ) or dtype.startswith("decimal")
    if numeric:
        return F.pmod(id_c, F.lit(n_shards))
    return F.pmod(
        F.conv(F.substring(F.md5(id_c.cast("string")), 1, 15), 16, 10)
        .cast("long"),
        F.lit(n_shards),
    )


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
    shard_c = shard if shard is not None else _default_shard(
        df, id_col, n_shards
    )
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


def pad_waste(
    df: DataFrame,
    batch_size: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard: Column | None = None,
    n_shards: int = 8,
) -> DataFrame:
    """Padding overhead of fixed-size batching, arrival-order vs
    length-sorted — the number that decides whether a training
    pipeline needs a length-bucketing stage: every sequence in a
    batch pads to the batch max, so padded cost = Σ_batches
    batch_max · |batch| and waste = padded − real tokens. Sorting by
    length before batching is the classic fix; this operator measures
    exactly how much it buys on THIS corpus.

    Same shard-local discipline as `pack_sequences` (a global order
    would be a single-partition window): documents shard by
    ``id % n_shards`` for numeric ids, an md5-prefix integer mod
    ``n_shards`` otherwise (see ``_default_shard``; or pass any
    deterministic ``shard`` column), each
    shard batches independently under both policies — (a) "arrival"
    = ordered by id, (b) "sorted" = ordered by (n_tokens, id) — and
    the last partial batch pads to its own max over its actual
    members (size < batch_size does NOT pad to a full batch: the
    collator ships the short batch).

    Exact integers end to end: token counts are the portable
    whitespace counts, waste_ppm = floor(waste · 1e6 / padded).

    Output: (policy, shard, n_docs, n_batches, real_tokens,
    padded_tokens, waste_ppm), one row per policy × shard.
    """
    id_c = F.col(id_col)
    shard_c = shard if shard is not None else _default_shard(
        df, id_col, n_shards
    )
    t = df.select(
        id_c.alias("id"),
        shard_c.cast("long").alias("shard"),
        token_count(text_col).cast("long").alias("n_tokens"),
    )

    def _policy(name: str, order: list[Column]) -> DataFrame:
        w = Window.partitionBy("shard").orderBy(*order)
        b = t.select(
            "shard",
            "n_tokens",
            (F.row_number().over(w) - F.lit(1))
            .cast("long")
            .alias("_rn0"),
        ).select(
            "shard",
            "n_tokens",
            # integer div, not float-div-and-cast (exactness convention)
            F.expr(f"_rn0 div {int(batch_size)}").alias("_batch"),
        )
        per_batch = b.groupBy("shard", "_batch").agg(
            F.count(F.lit(1)).cast("long").alias("_bn"),
            F.sum("n_tokens").cast("long").alias("_real"),
            F.max("n_tokens").cast("long").alias("_mx"),
        )
        return per_batch.groupBy("shard").agg(
            F.sum("_bn").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_batches"),
            F.sum("_real").cast("long").alias("real_tokens"),
            F.sum(F.col("_mx") * F.col("_bn"))
            .cast("long")
            .alias("padded_tokens"),
        ).select(
            F.lit(name).alias("policy"),
            "shard",
            "n_docs",
            "n_batches",
            "real_tokens",
            "padded_tokens",
            F.expr(
                "CASE WHEN padded_tokens > 0 THEN"
                " ((padded_tokens - real_tokens) * 1000000L)"
                " div padded_tokens END"
            ).alias("waste_ppm"),
        )

    arrival = _policy("arrival", [F.col("id")])
    srt = _policy("sorted", [F.col("n_tokens"), F.col("id")])
    return arrival.unionAll(srt)
