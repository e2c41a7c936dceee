"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Benches (BASELINE.md protocol):
  B1 ingest     — events -> messages-table Parquet write (rows/s in
                  `ingest_rows_per_s`, wall-sec in queries.ingest)
  B2 get_static — static-topic Get, newest-first top-K
  B3 get_wild   — wildcard Get ('*' and '...')
  B4 window_agg — tumbling + sliding window aggregation over events
  B5 analytics  — tpch_q1 + revenue join
  B6 pipeline   — dedup (exact + minhash-LSH) and ANN cosine top-K
  B7 heavyweight— iterative PageRank, prefix-filtered exact Jaccard
                  join, blocked record linkage (round-5 panel; the
                  BASELINE.md-comparable 14-query subtotal is emitted
                  as `legacy_total_sec`)

Each timed section runs after a warmup action so JVM/codegen startup
isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    import __spark_entry__ as entry
    from unitdb_spark.session import get_spark
    from unitdb_spark.sources.events import messages_from_events
    from unitdb_spark.table import MessagesTable

    spark = get_spark("unitdb-bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else -1.0
    timings: dict[str, float] = {}

    # warmup: touch every table + trigger codegen once
    msgs = messages_from_events(spark, SF_DIR)
    n_events = msgs.count()

    # B1 ingest: derived messages -> partitioned parquet append
    tmp = tempfile.mkdtemp(prefix="bench-messages-")
    t0 = time.time()
    MessagesTable(spark, tmp + "/messages").append(msgs)
    timings["ingest"] = time.time() - t0
    ingest_rate = n_events / timings["ingest"]

    def timed(name: str, fn) -> None:
        t = time.time()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = time.time() - t

    # B2/B3: Get against the materialized store (the real read path —
    # partition pruning on contract, pushed topic/ts/TTL filters)
    from unitdb_spark.core.model import Query
    from unitdb_spark.engine import Engine
    from unitdb_spark.sources.events import now_expr

    import datetime as dt

    eng = Engine(spark, tmp)
    now = now_expr(spark, SF_DIR).replace(tzinfo=dt.timezone.utc).timestamp()

    def timed_get(name: str, q: Query) -> None:
        t = time.time()
        eng.get_df(q, now=now).write.format("noop").mode("overwrite").save()
        timings[name] = time.time() - t

    timed_get("get_static", Query("events.click.u3", limit=1000))
    timed_get("get_last7d", Query("events.click.u3", last="168h", limit=100000))
    timed_get("get_wild_star", Query("events.*.u7", limit=100000))
    timed_get("get_wild_tail", Query("events.purchase...", limit=100000))

    qs = entry.queries()
    timed("topk_per_topic", qs["topk_per_topic"])
    timed("window_tumbling", qs["events_tumbling_daily"])
    timed("window_sliding", qs["events_sliding_6h"])
    timed("sessionize", qs["events_sessionize"])
    timed("tpch_q1", qs["tpch_q1"])
    timed("revenue_by_nation", qs["revenue_by_nation"])
    timed("doc_dedup_exact", qs["doc_dedup_exact"])
    timed("doc_minhash_lsh", qs["doc_minhash_lsh"])
    timed("ann_cosine_topk", qs["ann_cosine_topk"])

    # the 14 queries above are the round-1 protocol whose total is
    # comparable to BASELINE.md's recorded first-run 17.922s
    legacy_total = sum(timings.values())

    # B7 heavyweight panel (round 5): the most expensive plans in the
    # repo — iterative graph, unblocked prefix-filtered similarity
    # join, blocked record linkage — regression-visible per BASELINE.md
    # "Round-5 heavyweight panel" first-run numbers
    timed("parts_pagerank", qs["parts_pagerank"])
    timed("doc_prefix_jaccard", qs["doc_prefix_jaccard"])
    timed("customer_er", qs["customer_er"])

    shutil.rmtree(tmp, ignore_errors=True)

    total = sum(timings.values())
    out = {
        "metric": "headline_queries_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf,
        "legacy_total_sec": round(legacy_total, 3),
        "ingest_rows_per_s": round(ingest_rate),
        "n_events": n_events,
        "cpus": CPUS,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
