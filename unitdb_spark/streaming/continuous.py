"""Continuous aggregates: a rollup table maintained by the stream.

The batch ``operators.rollup.topic_rollup`` recomputes the whole topic
tree; at 100 TB of history that is the wrong cost model for a
dashboard refreshed every minute. The streaming formulation keeps a
materialized per-(contract, topic_prefix) aggregate table and folds
each micro-batch into it:

    new_partials = rollup(batch)           -- tiny: only touched keys
    table        = merge(table, partials)  -- algebraic re-aggregation

Only *algebraic* aggregates are maintained (count, sum, min, max —
anything whose partials merge associatively). Distinct-topic counts
are NOT (a distinct across batches is not a sum of per-batch
distincts); callers needing them run the batch rollup or an
approx-distinct sketch instead.

The merge cost per refresh is O(|table| + |touched prefixes|), never
O(history). The read-merge-write fold is NOT naturally idempotent (a
replayed batch would double-count), so the applied batch id is stored
next to the table and replays of already-applied batches are skipped —
the same applied-marker trick the reference's WAL release uses
(db_sync.go: segments freed only after sync completes).
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from unitdb_spark.operators.rollup import prefix_expr

AGG_COLS = ("n_msgs", "first_ts", "last_ts", "sum_value")


def _batch_partials(batch: DataFrame) -> DataFrame:
    val = F.col("value") if "value" in batch.columns else F.lit(0.0)
    ex = batch.filter(~F.col("is_pattern")).select(
        "contract",
        F.explode(prefix_expr()).alias("topic_prefix"),
        "ts",
        val.alias("value"),
    )
    return ex.groupBy("contract", "topic_prefix").agg(
        F.count(F.lit(1)).alias("n_msgs"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


def _merge(existing: DataFrame, partials: DataFrame) -> DataFrame:
    u = existing.unionByName(partials)
    return u.groupBy("contract", "topic_prefix").agg(
        F.sum("n_msgs").alias("n_msgs"),
        F.min("first_ts").alias("first_ts"),
        F.max("last_ts").alias("last_ts"),
        F.sum("sum_value").alias("sum_value"),
    )


def continuous_rollup(
    entries: DataFrame,
    agg_path: str,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Start the streaming query maintaining the rollup table at
    ``agg_path`` from a messages-schema stream (with derived topic
    columns). Returns the StreamingQuery."""
    spark = entries.sparkSession

    marker = Path(agg_path + ".applied")

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if marker.exists() and batch_id <= int(marker.read_text()):
            return  # replay of an already-applied batch: skip (idempotence)
        partials = _batch_partials(batch_df)
        live = Path(agg_path)
        if live.exists() and any(live.rglob("*.parquet")):
            merged = _merge(spark.read.parquet(agg_path), partials)
        else:
            merged = partials
        tmp = agg_path + ".staging"
        merged.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(agg_path, ignore_errors=True)
        Path(tmp).rename(agg_path)
        marker.write_text(str(batch_id))

    writer = (
        entries.writeStream.foreachBatch(fold)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
