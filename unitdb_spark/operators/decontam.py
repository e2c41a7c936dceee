"""Benchmark decontamination for training corpora.

The standard LLM-pipeline pass the reference has no analogue for
(its dedup surface is idempotent msg-id writes): remove/flag training
documents that share too many word n-grams with an evaluation
benchmark, so test-set material never leaks into a training run
(the GPT-3/PaLM 13-gram-overlap protocol; n is a parameter because
the right value depends on document length).

Scale shape: the benchmark side is small (benchmarks are MBs even
when the corpus is 100 TB), so its distinct n-gram set is BROADCAST —
the corpus is scanned once, never shuffled against the benchmark; the
only exchange is the per-document hit-count aggregation, whose
map-side partials collapse each document's grams to one row before
the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from unitdb_spark.operators.dedup import raw_tokens, shingles_from_tokens


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Per-document benchmark-overlap report.

    A document counts a gram as contaminated when the gram appears
    anywhere in the benchmark; ``overlap_frac`` is the contaminated
    share of the document's distinct grams, and ``contaminated`` is
    the ``>= threshold`` flag callers anti-join on.

    Output: (id, n_grams, n_contaminated, overlap_frac, contaminated).
    """
    bcol = bench_text_col or text_col
    # distinct benchmark grams, broadcast (small side by construction)
    bench = (
        benchmark.select(raw_tokens(bcol).alias("_tk"))
        .select(F.explode(shingles_from_tokens("_tk", n)).alias("gram"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    d = docs.select(F.col(id_col).alias("id"), raw_tokens(text_col).alias("_tk"))
    d = d.select("id", shingles_from_tokens("_tk", n).alias("_g"))
    ex = d.select("id", F.size("_g").alias("n_grams"), F.explode("_g").alias("gram"))
    hit = ex.join(F.broadcast(bench), on="gram", how="left")
    per_doc = hit.groupBy("id", "n_grams").agg(
        F.count("_hit").alias("n_contaminated")
    )
    frac = F.when(F.col("n_grams") < 1, F.lit(0.0)).otherwise(
        F.col("n_contaminated").cast("double") / F.col("n_grams").cast("double")
    )
    return per_doc.select(
        "id",
        "n_grams",
        "n_contaminated",
        frac.alias("overlap_frac"),
        (frac >= F.lit(threshold)).alias("contaminated"),
    )
