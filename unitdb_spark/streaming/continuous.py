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
replayed batch would double-count), so the table is maintained as
versioned snapshots with a marker file as the commit point:

  read snapshot v(marker) -> merge batch b -> write snapshot v(b)
  -> atomically swap marker to b (tmp file + rename)

A crash anywhere before the marker swap leaves the old marker pointing
at the old snapshot, so the replayed batch re-merges from unchanged
state (no loss, no double-count) — the same commit discipline as the
reference's WAL release (db_sync.go: segments freed only after sync
completes). Superseded snapshots are pruned after the swap.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from unitdb_spark.operators.rollup import prefix_expr


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


def read_rollup(spark, agg_path: str) -> DataFrame:
    """Read the current committed rollup snapshot."""
    marker = Path(agg_path) / "_current"
    if not marker.exists():
        raise FileNotFoundError(f"no committed rollup snapshot under {agg_path}")
    return spark.read.parquet(str(Path(agg_path) / f"v{int(marker.read_text())}"))


def continuous_rollup(
    entries: DataFrame,
    agg_path: str,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Start the streaming query maintaining the versioned rollup
    table under ``agg_path`` (read it with ``read_rollup``) from a
    messages-schema stream (with derived topic columns). Returns the
    StreamingQuery."""
    spark = entries.sparkSession

    root = Path(agg_path)
    root.mkdir(parents=True, exist_ok=True)
    marker = root / "_current"

    def _applied() -> int | None:
        return int(marker.read_text()) if marker.exists() else None

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        applied = _applied()
        if applied is not None and batch_id <= applied:
            return  # replay of an already-applied batch: skip (idempotence)
        partials = _batch_partials(batch_df)
        if applied is not None:
            merged = _merge(spark.read.parquet(str(root / f"v{applied}")), partials)
        else:
            merged = partials
        snap = root / f"v{batch_id}"
        merged.write.mode("overwrite").parquet(str(snap))
        # commit point: atomic marker swap (tmp write + rename)
        tmp = root / "_current.tmp"
        tmp.write_text(str(batch_id))
        os.replace(tmp, marker)
        # prune superseded snapshots (best-effort; never the current one)
        for old in root.glob("v*"):
            if old.name != f"v{batch_id}":
                shutil.rmtree(old, ignore_errors=True)

    writer = (
        entries.writeStream.foreachBatch(fold)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
