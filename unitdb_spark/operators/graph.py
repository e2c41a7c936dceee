"""Graph analytics over relational edges: co-occurrence + PageRank.

`operators/cluster.py` gave the repo its connected-components
primitive (dedup clusters). This module adds the other workhorse
graph operator a data-curation stack reaches for: PageRank-style
importance over a co-occurrence graph — which items anchor the
catalog, which documents sit central in a citation/link graph, which
sources dominate a crawl. Power-iteration maps directly onto Spark:
each iteration is one join (edges x ranks) and one partial-agg
shuffle on the destination key; `localCheckpoint` per round cuts the
growing lineage exactly as in `kmeans.py`/`cluster.py`.

Determinism contract: fixed iteration count (no float convergence
test), damping as an exact literal, output scaled by N and rounded
to 6 — the driver's DuckDB oracle replays the same unrolled
iterations and hash-matches.

The reference engine has no graph surface; north-star analytics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_edges(
    df: DataFrame, group_col: str, item_col: str
) -> DataFrame:
    """Symmetric distinct edges between items sharing a group.

    (src, dst) both directions, src != dst — e.g. parts co-purchased
    in one order, tokens co-occurring in one document. The self-join
    shuffles on the group key; per-group cost is |group|^2, so the
    group column plays the blocking role (same contract as the dedup
    family — cap group size upstream for pathological groups).
    """
    g = df.select(
        F.col(group_col).alias("_g"), F.col(item_col).alias("_i")
    ).distinct()
    a = g.select("_g", F.col("_i").alias("src"))
    b = g.select("_g", F.col("_i").alias("dst"))
    und = (
        a.join(b, "_g")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    return und.unionAll(und.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list.

    Returns (node, pr_r): rank scaled by N (mean 1.0 — readable and
    better round-6 resolution than raw 1/N-sized values) and rounded
    to 6 for the cross-engine hash convention.

    Node set = nodes appearing as a SOURCE (with symmetric edges from
    `cooccurrence_edges`, that is every connected node; isolated items
    never enter the graph — rank within the graph is the semantics).
    Every node needs out-edges (true for symmetric edge lists); with
    dangling nodes this formulation would leak their mass — callers
    with genuinely directed graphs must add back-edges or drop sinks.

    Per iteration: one shuffle joining ranks to edges on ``src`` and
    one partial-agg shuffle on ``dst``. The edges-with-degree relation
    is computed once; at scale, persist it (the loop reuses it k
    times) — here Spark's shuffle reuse already covers the bench SFs.
    """
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    ewd = e.join(deg, "_s")  # (src, dst, out-degree of src)
    n = deg.count()
    if n == 0:
        raise ValueError("pagerank: empty edge list")
    ranks = deg.select("_s", F.lit(1.0 / n).alias("_pr"))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contrib = ewd.join(ranks, "_s").select(
            F.col("_d"), (F.col("_pr") / F.col("_deg")).alias("_c")
        )
        ranks = (
            contrib.groupBy("_d")
            .agg((F.lit(base) + F.lit(damping) * F.sum("_c")).alias("_pr"))
            .select(F.col("_d").alias("_s"), "_pr")
        ).localCheckpoint(eager=False)
    return ranks.select(
        F.col("_s").alias("node"),
        F.round(F.col("_pr") * F.lit(float(n)), 6).alias("pr_r"),
    )
