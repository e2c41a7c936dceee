"""Record linkage / entity resolution: blocked fuzzy matching.

A curation pipeline constantly reconciles records that SHOULD be the
same entity but differ by typos, case, or formatting — user tables
from two exports, scraped author names, near-identical metadata rows.
The classical recipe (Fellegi-Sunter blocking + edit-distance
comparison, deterministic decision rule) maps cleanly onto Spark:

- BLOCK on cheap exact keys (the join key — bounds the candidate
  space and is the only shuffle);
- COMPARE candidates with `levenshtein` (JVM builtin, codegen'd —
  no Python in the loop);
- DECIDE with a per-left-record window: best (distance, id) wins.

The reference engine has no linkage surface; this is north-star
LLM-pipeline machinery (dataset joining/cleaning before training),
kept integer-exact (floor-ppm scores) so any SQL engine replays it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def link_records(
    left: DataFrame,
    right: DataFrame,
    block_cols: Sequence[str],
    left_id: str,
    right_id: str,
    left_text: str,
    right_text: str,
    max_distance: int = 2,
) -> DataFrame:
    """Best fuzzy match per left record among same-block right records.

    Returns one row per LEFT record: (left_id, matched_id, distance,
    score_ppm, n_candidates). Unmatched records (no same-block right
    row within ``max_distance`` edits) keep their row with NULL match
    columns — silent drops hide linkage failures.

    score_ppm = floor((1 - distance/max(len_l, len_r)) * 1e6) — the
    normalized edit similarity in the repo's integer-ppm convention.

    Scale: the candidate join shuffles on the block key only; cost is
    sum of |block_l|x|block_r| per block, so block choice is the
    knob that bounds work (same contract as the dedup family's
    blocking columns — pick keys that cap block size).
    """
    if not block_cols:
        raise ValueError("link_records requires at least one blocking column")
    blocks = list(block_cols)
    l = left.select(
        F.col(left_id).alias("_lid"), F.col(left_text).alias("_ltxt"), *blocks
    )
    r = right.select(
        F.col(right_id).alias("_rid"), F.col(right_text).alias("_rtxt"), *blocks
    )
    dist = F.levenshtein("_ltxt", "_rtxt")
    cand = (
        l.join(r, blocks)
        .select(
            "_lid",
            "_rid",
            dist.alias("_d"),
            F.greatest(F.length("_ltxt"), F.length("_rtxt")).alias("_mx"),
        )
        .filter(F.col("_d") <= max_distance)
    )
    w = Window.partitionBy("_lid").orderBy("_d", "_rid")
    best = (
        cand.select(
            "_lid",
            "_rid",
            "_d",
            "_mx",
            F.row_number().over(w).alias("_rk"),
            F.count(F.lit(1)).over(Window.partitionBy("_lid")).alias("_nc"),
        )
        .filter(F.col("_rk") == 1)
        .select(
            "_lid",
            F.col("_rid").alias("matched_id"),
            F.col("_d").alias("distance"),
            F.floor(
                (F.lit(1.0) - F.col("_d") / F.col("_mx")) * F.lit(1_000_000)
            )
            .cast("long")
            .alias("score_ppm"),
            F.col("_nc").alias("n_candidates"),
        )
    )
    return (
        left.select(F.col(left_id).alias("_lid"))
        .distinct()
        .join(best, "_lid", "left")
        .select(
            F.col("_lid").alias(left_id),
            "matched_id",
            "distance",
            "score_ppm",
            F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
        )
    )
