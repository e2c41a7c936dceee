"""Applied-batch commit log for foreachBatch sinks.

Round 1 kept a single marker file beside the output table holding a
bare batch_id. Two failure modes:

- restarting a pipeline with a FRESH checkpoint resets batch ids to 0,
  so ``batch_id <= marker`` silently skipped every real batch until
  the old high-water id was passed — silent data loss;
- two streams writing one table clobbered each other's marker.

The commit log replaces the marker with one empty file per applied
batch, keyed by the streaming query's stable id:

    <log_root>/_applied/<query_id>/<batch_id>

The query id comes from ``<checkpoint>/metadata`` — Spark keeps it
constant across restarts of the same checkpoint and generates a new
one for a fresh checkpoint, so a new checkpoint can never match a
stale log, and concurrent writers (distinct checkpoints) never
collide. File creation is the commit point: no read-modify-write, no
rename, safe on object stores. All I/O is Hadoop-FS based (fs.py), so
any Spark-readable scheme works.

Replay semantics: a batch whose id is logged is skipped (exactly-once
within a checkpoint generation, closing Spark's replay-after-crash
window — same discipline as the reference's WAL release after sync,
db_sync.go). Restarting against an existing table with a *fresh*
checkpoint replays the whole source and appends again — at-least-once,
the honest answer for a non-transactional sink; true exactly-once
across generations needs a transactional table format.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession

from unitdb_spark import fs


class CommitLog:
    def __init__(self, spark: SparkSession, checkpoint: str, log_root: str) -> None:
        self.spark = spark
        self.checkpoint = checkpoint.rstrip("/")
        self.log_root = log_root.rstrip("/")
        self._qid: str | None = None
        # Round 1 wrote a plain marker FILE at log_root; the log needs a
        # directory tree there. Clear the stale file so restarting an
        # existing round-1 pipeline doesn't fail on mkdir-under-a-file —
        # but ONLY if it actually looks like a round-1 marker (a bare
        # batch id). Deleting anything else would destroy an unrelated
        # data file behind a misconfigured log_root.
        if fs.exists(spark, self.log_root) and not fs.is_dir(spark, self.log_root):
            content = fs.read_text(spark, self.log_root)
            body = (content or "").strip()
            if body.isdigit() and len(body) <= 19:  # bare int64 batch id
                fs.delete(spark, self.log_root)
            else:
                raise ValueError(
                    f"commit-log root {self.log_root} is an existing file that "
                    "is not a round-1 batch marker; refusing to delete it — "
                    "point log_root at a directory (or remove the file yourself)"
                )

    @property
    def query_id(self) -> str:
        """Stable id from the checkpoint metadata (lazy: the metadata
        file exists by the time the first micro-batch runs)."""
        if self._qid is None:
            meta = fs.read_text(self.spark, self.checkpoint + "/metadata")
            self._qid = json.loads(meta)["id"] if meta else "no-checkpoint"
        return self._qid

    def _dir(self) -> str:
        return f"{self.log_root}/_applied/{self.query_id}"

    def applied(self, batch_id: int) -> bool:
        return fs.exists(self.spark, f"{self._dir()}/{int(batch_id)}")

    def last(self) -> int | None:
        """Highest applied batch id for THIS query generation."""
        ids = [
            int(name)
            for name, _, _ in fs.list_status(self.spark, self._dir())
            if name.isdigit()
        ]
        return max(ids) if ids else None

    def record(self, batch_id: int, keep: int = 16) -> None:
        """Commit point: create the batch's file, prune old entries.

        ``keep`` bounds the log (Spark only ever replays the trailing
        uncommitted batch, so a short tail is ample)."""
        fs.write_text(self.spark, f"{self._dir()}/{int(batch_id)}", "")
        ids = sorted(
            int(name)
            for name, _, _ in fs.list_status(self.spark, self._dir())
            if name.isdigit()
        )
        for old in ids[:-keep]:
            fs.delete(self.spark, f"{self._dir()}/{old}")

    def applied_for(self, query_id: str, batch_id: int) -> bool:
        """`applied` for an EXPLICIT generation (resume paths touch
        other generations' entries — e.g. redelivering a crashed
        subscriber's in-flight batches, streaming.pubsub.ReliableSink)."""
        return fs.exists(
            self.spark, f"{self.log_root}/_applied/{query_id}/{int(batch_id)}"
        )

    def last_for(self, query_id: str) -> int | None:
        """`last` for an explicit generation (resume paths use it as
        the ack high-water mark when an old marker has been pruned)."""
        ids = [
            int(name)
            for name, _, _ in fs.list_status(
                self.spark, f"{self.log_root}/_applied/{query_id}"
            )
            if name.isdigit()
        ]
        return max(ids) if ids else None

    def record_for(self, query_id: str, batch_id: int) -> None:
        """`record` for an explicit generation (no pruning: the foreign
        generation's tail is not ours to manage)."""
        fs.write_text(
            self.spark, f"{self.log_root}/_applied/{query_id}/{int(batch_id)}", ""
        )

    def prune_other_generations(self) -> None:
        """Drop OTHER query generations' commit entries.

        For single-writer versioned-snapshot sinks (continuous rollup /
        KV state) that already prune other generations' snapshot dirs:
        without this, a stale generation's entry can win latest_commit's
        mtime tie-break on a coarse-mtime filesystem and point readers
        at a just-deleted snapshot. Do NOT call this for multi-writer
        logs (e.g. the ingest table log) — there, sibling generations
        belong to live concurrent writers."""
        base = f"{self.log_root}/_applied"
        for qid, _, is_dir in fs.list_status(self.spark, base):
            if is_dir and qid != self.query_id:
                fs.delete(self.spark, f"{base}/{qid}")


def latest_commit(spark: SparkSession, log_root: str) -> tuple[str, int] | None:
    """(query_id, batch_id) of the newest commit across generations —
    newest by file mtime, ties broken by batch id. Readers use this to
    find the current snapshot without knowing the checkpoint path."""
    base = f"{log_root.rstrip('/')}/_applied"
    best: tuple[int, int, str] | None = None
    for qid, _, is_dir in fs.list_status(spark, base):
        if not is_dir:
            continue
        for name, mtime, _ in fs.list_status(spark, f"{base}/{qid}"):
            if name.isdigit():
                cand = (mtime, int(name), qid)
                if best is None or cand > best:
                    best = cand
    return (best[2], best[1]) if best else None
