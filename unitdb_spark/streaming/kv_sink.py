"""Streaming KV upsert sink: memdb semantics maintained continuously.

`operators.kv` answers point-in-time KV questions by re-reducing the
whole op-log; fine for audits, wrong cost model for a hot state table
refreshed per micro-batch at 100 TB of history. This sink folds each
batch of ops into a materialized current-state snapshot:

    batch_winners = last op per key IN THE BATCH     -- O(|batch|)
    state         = winner-per-key(state ∪ winners)  -- O(|state|+|batch|)

so per-refresh cost is bounded by live-key cardinality plus batch
size, never by op-log history. Delete winners are kept as tombstone
rows inside the snapshot (bounded by key cardinality) so a replayed or
out-of-order lower-`op_order` put can never resurrect a deleted key;
`read_kv` filters them out.

Crash safety reuses the versioned-snapshot + commit-log discipline of
`streaming.continuous` (snapshot keyed by (query-generation, batch);
commit-log append is the commit point — see commitlog.py for the
restart/fresh-checkpoint story, reference parity db_sync.go WAL
release).

Scale note: each refresh rewrites the full state snapshot. That is the
honest cost of crash-safe versioning over plain parquet; when live-key
cardinality itself is huge relative to batches, the right tool is a
transactional table format whose MERGE rewrites only touched files —
the fold logic here maps 1:1 onto such a sink.

Op-log schema (same as operators.kv): (key LONG, value BINARY,
op STRING ['put','delete'], op_order LONG).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from unitdb_spark import fs
from unitdb_spark.streaming.commitlog import CommitLog, latest_commit

_STATE_COLS = ["key", "value", "op", "op_order"]


def _winners(ops: DataFrame) -> DataFrame:
    """Last op per key (ties broken toward 'put' < 'delete' reversed —
    i.e. delete wins an exact op_order tie, the conservative choice)."""
    w = Window.partitionBy("key").orderBy(
        F.desc("op_order"), F.desc(F.col("op") == "delete")
    )
    return (
        ops.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*_STATE_COLS)
    )


def _snap_path(state_path: str, qid: str, batch_id: int) -> str:
    return f"{state_path.rstrip('/')}/v_{qid}_{batch_id}"


def read_kv(spark: SparkSession, state_path: str, include_tombstones: bool = False) -> DataFrame:
    """Current committed KV state. (key, value) of live keys — or the
    raw winner rows including delete tombstones when asked."""
    cur = latest_commit(spark, state_path)
    if cur is None:
        raise FileNotFoundError(f"no committed KV snapshot under {state_path}")
    snap = spark.read.parquet(_snap_path(state_path, *cur))
    if include_tombstones:
        return snap
    return snap.filter(F.col("op") == "put").select("key", "value")


def continuous_kv(
    oplog: DataFrame,
    state_path: str,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Start the streaming query maintaining the KV state table under
    ``state_path`` from an op-log stream. Returns the StreamingQuery."""
    spark = oplog.sparkSession
    fs.mkdirs(spark, state_path)
    log = CommitLog(spark, checkpoint, state_path)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if log.applied(batch_id):
            return  # replayed batch: already folded (idempotence)
        applied = log.last()
        winners = _winners(batch_df.select(*_STATE_COLS))
        if applied is not None:
            prior = spark.read.parquet(_snap_path(state_path, log.query_id, applied))
            merged = _winners(prior.unionByName(winners))
        else:
            merged = winners
        snap = _snap_path(state_path, log.query_id, batch_id)
        merged.write.mode("overwrite").parquet(snap)
        log.record(batch_id)  # commit point
        # retire stale generations' commit entries BEFORE their
        # snapshots so latest_commit never points at a deleted path
        log.prune_other_generations()
        keep = f"v_{log.query_id}_{batch_id}"
        for name, _, is_dir in fs.list_status(spark, state_path):
            if is_dir and name.startswith("v_") and name != keep:
                fs.delete(spark, f"{state_path.rstrip('/')}/{name}")

    writer = (
        oplog.writeStream.foreachBatch(fold)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
