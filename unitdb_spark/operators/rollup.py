"""Topic-hierarchy rollup: aggregates at every level of the topic tree.

The reference maintains a topic trie whose every node is a prefix of
the dot-separated topic space (reference: trie.go:29-211,
message/topic.go:52-65) — but it only stores index offsets there, never
statistics. At analytics scale the natural extension is the *rollup*:
one aggregate row per (contract, topic-prefix), i.e. per trie node —
message counts, distinct leaf topics, freshness — the "hypertable
rollup" shape for hierarchical time-series.

Spark-first design: each message explodes to its `depth` prefixes
(JVM-side `transform`/`slice`/`array_join` — no UDF), then ONE
hash-aggregate shuffle on (contract, prefix). Map-side partial
aggregation collapses the ×depth row amplification within each input
partition before anything moves, so the exchange carries prefix
partials, not exploded messages — at 100 TB this is the same cost as
a plain groupBy(topic) up to the (bounded, ≤ max depth) fan-out
constant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def prefix_expr(parts: Column | str = "parts", depth: Column | str = "depth") -> Column:
    """Array of all dot-joined prefixes of `parts`: [a, a.b, a.b.c].

    Empty topics (depth 0) yield an empty array — sequence(1, 0) would
    otherwise step DOWNWARD to [1, 0] and fabricate two '' prefixes."""
    p = F.col(parts) if isinstance(parts, str) else parts
    d = F.col(depth) if isinstance(depth, str) else depth
    return F.when(d < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), d), lambda i: F.array_join(F.slice(p, F.lit(1), i), ".")
        )
    )


def topic_rollup(
    df: DataFrame,
    value_col: str | None = None,
) -> DataFrame:
    """Per-(contract, prefix) rollup over concrete topics.

    Output: (contract, topic_prefix, n_msgs, n_topics, first_ts,
    last_ts[, sum_value]) — one row per populated trie node. Pattern
    writes (wildcard topics) are excluded: they are routing entries,
    not tree leaves.
    """
    ex = df.filter(~F.col("is_pattern")).select(
        "contract",
        F.explode(prefix_expr()).alias("topic_prefix"),
        "topic",
        "ts",
        *([F.col(value_col)] if value_col else []),
    )
    aggs = [
        F.count(F.lit(1)).alias("n_msgs"),
        F.countDistinct("topic").alias("n_topics"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    ]
    if value_col:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double").alias("sum_value")
        )
    return ex.groupBy("contract", "topic_prefix").agg(*aggs)
