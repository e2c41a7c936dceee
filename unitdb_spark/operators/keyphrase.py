"""RAKE keyphrase extraction (Rose et al. 2010), per document.

Keyphrases tag corpora for mixture design, dedup triage, and topic
audits. RAKE is the classic unsupervised recipe: candidate phrases
are maximal runs of content tokens (split at stopwords/punctuation);
each word scores degree/frequency over the document's phrase
instances (degree = total length of phrases it appears in — words
that live in long phrases score high); a phrase scores the sum of
its words' scores.

Determinism contract: word scores use the repo's floor-ppm integer
convention (floor(degree·1e6 / freq)), so the phrase score is an
INTEGER sum — order-free, replayed exactly by any SQL engine (a
double sum would vary with aggregation order at the 1e-16 level and
flip round-6 ties). Ranking is (score_ppm DESC, phrase ASC).

Scale: every relation in the pipeline is keyed by doc_id (token
stream, islands, per-doc word stats, ranking window) — no corpus-
global vocabulary, so the operator partitions freely by document
and cost is linear in corpus tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from unitdb_spark.functions.text import STOPWORDS, _toks


def rake_keyphrases(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_words: int = 4,
    top_k: int = 5,
) -> DataFrame:
    """Top-k RAKE keyphrases per document.

    Output: (doc_id, phrase, n_words, score_ppm, rank), rank <= k.
    Candidate phrases are runs of tokens that are neither stopwords
    nor contain non-letter characters, capped at ``max_words``;
    repeated phrases in a document rank once (their instances all
    feed the word statistics).
    """
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    tok = df.select(
        F.col(id_col).alias("_id"), F.posexplode(_toks(text_col)).alias("_pos", "_w")
    )
    keep = ~F.array_contains(sw, F.col("_w")) & F.col("_w").rlike("^[a-z]+$")
    w_doc = Window.partitionBy("_id").orderBy("_pos")
    nb = tok.filter(keep).select(
        "_id", "_pos", "_w", (F.col("_pos") - F.row_number().over(w_doc)).alias("_isl")
    )
    # phrase per island, words re-assembled in position order
    ph = (
        nb.groupBy("_id", "_isl")
        .agg(
            F.array_sort(F.collect_list(F.struct("_pos", "_w"))).alias("_pt"),
            F.count(F.lit(1)).alias("n_words"),
        )
        .filter(F.col("n_words") <= max_words)
        .select(
            "_id",
            "_isl",
            "n_words",
            F.array_join(F.transform("_pt", lambda x: x["_w"]), " ").alias("phrase"),
        )
    )
    inst = ph.select("_id", "_isl", "n_words", F.explode(F.split("phrase", " ")).alias("_w"))
    stats = (
        inst.groupBy("_id", "_w")
        .agg(F.count(F.lit(1)).alias("_freq"), F.sum("n_words").alias("_deg"))
        .select(
            "_id",
            "_w",
            F.floor(F.col("_deg") * F.lit(1_000_000) / F.col("_freq"))
            .cast("long")
            .alias("_wscore"),
        )
    )
    scored = (
        inst.join(stats, ["_id", "_w"])
        .groupBy("_id", "_isl")
        .agg(F.sum("_wscore").alias("score_ppm"))
    )
    cand = (
        ph.join(scored, ["_id", "_isl"])
        .select("_id", "phrase", "n_words", "score_ppm")
        .distinct()
    )
    rk = Window.partitionBy("_id").orderBy(F.col("score_ppm").desc(), "phrase")
    return (
        cand.select(
            F.col("_id").alias(id_col),
            "phrase",
            "n_words",
            "score_ppm",
            F.row_number().over(rk).alias("rank"),
        )
        .filter(F.col("rank") <= top_k)
    )
