"""Exact substring-duplication detection (Lee et al. '21,
"Deduplicating Training Data Makes Language Models Better").

The reference engine stores opaque payloads and has no corpus-dedup
surface (unitdb payloads are byte blobs, db_internal.go:59-60); this is
a north-star LLM-pipeline operator: find every k-token span that occurs
more than once across the corpus — the exact-substring criterion the
paper applies with a suffix array — and report, per document, how much
of it is duplicated text (the tokens a span-removal pass would delete).

Spark-first shape, no suffix array
----------------------------------
A suffix array is a single-machine construction; the distributed
equivalent of "does this k-gram occur elsewhere?" is a corpus-wide
group-by on the gram hash:

1. tokenize once, bind the array, enumerate positions 0..len-k;
2. hash each k-token window to a 60-bit integer INSIDE the
   ``transform`` lambda — only 8-byte longs are exploded, the k-token
   gram strings never leave the projection (at 100 TB the k× text
   blowup of exploding raw grams is the difference between a scan and
   an outage);
3. one shuffle on gram_hash -> (n_occ, n_docs) per gram;
4. join positions back on the same key (the exchange is reused — same
   subtree, Catalyst ReusedExchange; pinned in tests/test_plans.py) to
   keep duplicated positions;
5. per-doc interval union: duplicated spans all have length k, so with
   sorted dup positions p1 < p2 < ..., covered tokens
   = sum_i min(k, p_i - p_{i-1}) with the first term = k — one lag
   window per doc, no interval-merge loop.

Everything is integer arithmetic on the portable md5_int60 hash, so a
DuckDB oracle replays it bit for bit (ratios are exact ppm floors).

At scale: the gram relation is |tokens| rows of (long, long, int) —
linear, not quadratic; both heavy ops shuffle on gram_hash (uniform by
construction); the doc-level rollup shuffles doc_id only for positions
that survived the dup filter (typically a small fraction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from unitdb_spark.functions.portable_hash import md5_int60


def gram_hashes(tok_col: Column | str, k: int) -> Column:
    """Array of 60-bit md5 hashes, one per k-token window, hashed
    before any explode so only longs travel. Position i's hash covers
    tokens [i, i+k). Empty array when the doc has < k tokens."""
    toks = F.col(tok_col) if isinstance(tok_col, str) else tok_col
    idx = F.sequence(F.lit(0), F.size(toks) - k)
    return F.when(F.size(toks) >= k, F.transform(
        idx, lambda i: md5_int60(F.concat_ws(" ", F.slice(toks, i + 1, k)))
    )).otherwise(F.array().cast("array<bigint>"))


def _positions(docs: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, n_tokens, pos, gram_hash) — one row per k-gram position."""
    from unitdb_spark.operators.dedup import raw_tokens

    toks = docs.select(
        F.col(id_col).alias("id"), raw_tokens(text_col).alias("_tok")
    ).select("id", F.size("_tok").alias("n_tokens"),
             gram_hashes("_tok", k).alias("_gh"))
    # materialize the hash arrays through one keyed exchange before the
    # explode: Generate re-evaluates a non-attribute child per OUTPUT
    # row (O(positions) evaluations of the O(tokens)-md5 window
    # program = O(tokens²) md5 per doc), and `pos` feeds TWO consumers
    # (the gram filter and the per-doc base rollup) which would each
    # re-derive it — the shared exchange (ReuseExchange) computes the
    # window hashes exactly once per doc (r12 Generate finding, see
    # rouge_n_pairs).
    par = docs.sparkSession.sparkContext.defaultParallelism
    toks = toks.repartition(par, F.col("id"))
    return toks.select(
        "id", "n_tokens",
        F.posexplode_outer("_gh").alias("pos", "gram_hash"),
    )


def substring_dup_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_occ: int = 2,
    flag_ppm: int = 300_000,
) -> DataFrame:
    """Per-document duplicated-substring audit.

    Output (one row per doc, including docs shorter than k tokens):
      id, n_tokens, n_pos (k-gram positions), n_dup_pos (positions
      whose gram occurs >= min_occ times corpus-wide), covered_tokens
      (exact interval union of the duplicated spans), dup_ppm
      (floor(covered * 1e6 / n_tokens), integer-exact) and is_dup
      (dup_ppm >= flag_ppm — the doc is mostly duplicated text).
    """
    pos = _positions(docs, id_col, text_col, k)
    grams = pos.filter(F.col("gram_hash").isNotNull())
    stats = grams.groupBy("gram_hash").agg(F.count("*").alias("n_occ"))
    dup_pos = (
        grams.join(stats.filter(F.col("n_occ") >= min_occ), "gram_hash")
        .select("id", "pos")
    )
    w = Window.partitionBy("id").orderBy("pos")
    covered = (
        dup_pos.withColumn("prev", F.lag("pos").over(w))
        .withColumn(
            "add",
            F.when(F.col("prev").isNull(), F.lit(k)).otherwise(
                F.least(F.lit(k), F.col("pos") - F.col("prev"))
            ),
        )
        .groupBy("id")
        .agg(
            F.count("*").alias("n_dup_pos"),
            F.sum("add").alias("covered_tokens"),
        )
    )
    base = pos.groupBy("id", "n_tokens").agg(
        F.count("gram_hash").alias("n_pos")
    )
    out = (
        base.join(covered, "id", "left")
        .withColumn("n_dup_pos", F.coalesce("n_dup_pos", F.lit(0)))
        .withColumn(
            "covered_tokens", F.coalesce("covered_tokens", F.lit(0)).cast("long")
        )
        .withColumn(
            "dup_ppm",
            F.floor(
                F.col("covered_tokens") * F.lit(1_000_000)
                / F.greatest(F.col("n_tokens"), F.lit(1))
            ),
        )
        .withColumn("is_dup", (F.col("dup_ppm") >= flag_ppm).cast("int"))
    )
    return out.select(
        F.col("id").alias(id_col), "n_tokens", "n_pos", "n_dup_pos",
        "covered_tokens", "dup_ppm", "is_dup",
    )


def novelty_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Per-document n-gram novelty: of this doc's DISTINCT k-grams, how
    many appear in no earlier document (first corpus occurrence = min
    id)? A curation-time diversity signal — a doc whose grams are all
    re-treads adds little to a training set even if it is not an exact
    near-dup of any single other doc (near-dup checks are pairwise;
    novelty is against the whole corpus union).

    Same scale discipline as the dup audit: grams are hashed inside the
    projection (longs shuffle, strings don't), per-doc distinct happens
    map-side via array_distinct BEFORE the explode, and the first-doc
    attribution plus the join back share one gram_hash shuffle key.

    Output: (id, n_grams, n_novel, novelty_ppm) with
    novelty_ppm = floor(n_novel * 1e6 / n_grams) — integer-exact.
    """
    from unitdb_spark.operators.dedup import raw_tokens

    # same materialize-then-explode shape as _positions: the distinct
    # hash array is computed once per doc on the map side of one keyed
    # exchange shared by both consumers (the first-doc agg and the
    # join back), instead of being re-evaluated per exploded row and
    # inlined into an inferred Generate filter. explode_OUTER + the
    # NULL filter is exactly inner-explode semantics (hashes are never
    # NULL; the fabricated row of a <k-token doc is what inner
    # explode dropped).
    par = docs.sparkSession.sparkContext.defaultParallelism
    g = (
        docs.select(
            F.col(id_col).alias("id"), raw_tokens(text_col).alias("_tok")
        )
        .select(
            "id", F.array_distinct(gram_hashes("_tok", k)).alias("_gh")
        )
        .repartition(par, F.col("id"))
        .select("id", F.explode_outer("_gh").alias("gram_hash"))
        .filter(F.col("gram_hash").isNotNull())
    )
    first = g.groupBy("gram_hash").agg(F.min("id").alias("first_doc"))
    out = (
        g.join(first, "gram_hash")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count(F.when(F.col("first_doc") == F.col("id"), 1)).alias(
                "n_novel"
            ),
        )
        .withColumn(
            "novelty_ppm",
            F.floor(
                F.col("n_novel") * F.lit(1_000_000)
                / F.greatest(F.col("n_grams"), F.lit(1))
            ),
        )
    )
    return out.select(
        F.col("id").alias(id_col), "n_grams", "n_novel", "novelty_ppm"
    )


def longest_dup_span(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_occ: int = 2,
) -> DataFrame:
    """Per doc, the LONGEST contiguous duplicated region (in tokens):
    the dup audit's scalar coverage says how much is duplicated, this
    says how concentrated — a doc with one long verbatim block is a
    different cleanup case (cut the block) than one with scattered
    phrases (drop the doc).

    A maximal run of consecutive duplicated positions p..p+r spans
    r + k tokens. Runs are gaps-and-islands over the dup positions:
    island id = p − row_number (constant within a consecutive run),
    one window + one two-level aggregation.

    Output: (id, n_dup_pos, longest_span_tokens) — docs without any
    duplicated gram report 0.
    """
    pos = _positions(docs, id_col, text_col, k)
    grams = pos.filter(F.col("gram_hash").isNotNull())
    stats = grams.groupBy("gram_hash").agg(F.count("*").alias("n_occ"))
    dup_pos = grams.join(
        stats.filter(F.col("n_occ") >= min_occ), "gram_hash"
    ).select("id", "pos")
    w = Window.partitionBy("id").orderBy("pos")
    runs = dup_pos.withColumn(
        "_island", F.col("pos") - F.row_number().over(w)
    )
    span = (
        runs.groupBy("id", "_island")
        .agg((F.count(F.lit(1)) + F.lit(k - 1)).alias("_span"))
        .groupBy("id")
        .agg(
            F.sum(F.col("_span") - F.lit(k - 1)).alias("n_dup_pos"),
            F.max("_span").alias("longest_span_tokens"),
        )
    )
    ids = docs.select(F.col(id_col).alias("id")).distinct()
    return (
        ids.join(span, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_dup_pos", F.lit(0)).cast("long").alias("n_dup_pos"),
            F.coalesce("longest_span_tokens", F.lit(0)).cast("long").alias(
                "longest_span_tokens"
            ),
        )
    )


def duplicated_grams(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_occ: int = 2,
) -> DataFrame:
    """Corpus-wide duplicated k-gram inventory: (gram_hash, n_occ,
    n_docs, first_doc). The gram text itself is NOT carried — at scale
    the hash is the identity; callers that need the text re-derive it
    from (first_doc, first_pos) against the source."""
    pos = _positions(docs, id_col, text_col, k).filter(
        F.col("gram_hash").isNotNull()
    )
    return (
        pos.groupBy("gram_hash")
        .agg(
            F.count("*").alias("n_occ"),
            F.countDistinct("id").alias("n_docs"),
            F.min("id").alias("first_doc"),
        )
        .filter(F.col("n_occ") >= min_occ)
    )
