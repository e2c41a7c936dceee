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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from unitdb_spark.functions.portable_hash import md5_int60
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
        .select(F.explode_outer(shingles_from_tokens("_tk", n)).alias("gram"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    d = docs.select(F.col(id_col).alias("id"), raw_tokens(text_col).alias("_tk"))
    d = d.select("id", shingles_from_tokens("_tk", n).alias("_g"))
    # explode_outer at every gram site: shingle arrays are never empty
    # (dedup.shingles_from_tokens yields [""] even for empty docs), and
    # outer blocks the inferred Generate filter that would inline the
    # shingle expression at the scan (r12 finding, see rouge_n_pairs).
    ex = d.select("id", F.size("_g").alias("n_grams"), F.explode_outer("_g").alias("gram"))
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


# ----------------------------------------------------------- bloom variant


def _bloom_positions(col: Column, k: int, m_bits: int) -> list[Column]:
    """k salted md5 bit positions in [0, m_bits) — same portable-hash
    idiom as the count-min sketch, so any SQL engine can replay it."""
    return [
        F.pmod(md5_int60(F.concat(col, F.lit(f"~b{i}"))), F.lit(m_bits))
        for i in range(k)
    ]


def bloom_build(values: DataFrame, col: str, m_bits: int = 1 << 18, k: int = 2) -> DataFrame:
    """Fold a value set into a Bloom bitset stored as ≤ m_bits/64 rows
    of (word, bits). The build is one pass + one bounded exchange (the
    groupBy carries at most m_bits/64 rows after map-side bit_or
    partials) — cardinality of the value set never reaches the shuffle.
    """
    pos = F.explode(F.array(*_bloom_positions(F.col(col), k, m_bits))).alias("pos")
    words = values.select(pos).select(
        (F.col("pos") / 64).cast("long").alias("word"),
        F.expr("shiftleft(1L, CAST(pmod(pos, 64) AS INT))").alias("_bit"),
    )
    return words.groupBy("word").agg(F.expr("bit_or(_bit)").alias("bits"))


def bloom_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    n: int = 3,
    threshold: float = 0.5,
    m_bits: int = 1 << 18,
    k: int = 2,
) -> DataFrame:
    """`decontaminate` with a Bloom pre-filter: bit-identical output.

    Scale rationale: the exact pass broadcasts the benchmark's full
    distinct-gram string set — fine for one benchmark, but a combined
    eval suite can reach GBs of gram strings, and every corpus gram
    probes that hash map. Here the broadcast is a FIXED m_bits/8-byte
    bitset; only grams that pass the Bloom probe (true hits + an εFP
    tail, ε ≈ (1-e^(-kB/m))^k) reach the exact-confirm join, so the
    string-set join input shrinks from every-corpus-gram to
    approximately-the-contaminated-grams. No false negatives (Bloom
    guarantees), no false positives (exact confirm) — the result equals
    `decontaminate` row for row, which is what the oracle checks.
    """
    bcol = bench_text_col or text_col
    bench = (
        benchmark.select(raw_tokens(bcol).alias("_tk"))
        .select(F.explode_outer(shingles_from_tokens("_tk", n)).alias("gram"))
        .distinct()
    )
    filt = bloom_build(bench, "gram", m_bits=m_bits, k=k)

    d = docs.select(F.col(id_col).alias("id"), raw_tokens(text_col).alias("_tk"))
    d = d.select("id", shingles_from_tokens("_tk", n).alias("_g"))
    # explode_outer at every gram site: shingle arrays are never empty
    # (dedup.shingles_from_tokens yields [""] even for empty docs), and
    # outer blocks the inferred Generate filter that would inline the
    # shingle expression at the scan (r12 finding, see rouge_n_pairs).
    ex = d.select("id", F.size("_g").alias("n_grams"), F.explode_outer("_g").alias("gram"))
    # k probes as k successive broadcast joins: the gram stream is never
    # shuffled (no row-explosion groupBy) — each probe adds one boolean
    passed = ex
    pass_cols = []
    for i in range(k):
        pos = F.pmod(
            md5_int60(F.concat(F.col("gram"), F.lit(f"~b{i}"))), F.lit(m_bits)
        )
        # _pos bound as a column so the shiftleft SQL expr can see it
        probe = passed.withColumn("_pos", pos).select(
            "*", (F.col("_pos") / 64).cast("long").alias("_w"),
            F.expr("shiftleft(1L, CAST(pmod(_pos, 64) AS INT))").alias("_m"),
        )
        hit = F.coalesce(
            (F.col("bits").bitwiseAND(F.col("_m")) != 0), F.lit(False)
        ).alias(f"_hit{i}")
        passed = (
            probe.join(F.broadcast(filt), probe["_w"] == filt["word"], "left")
            .select("id", "n_grams", "gram", *pass_cols, hit)
        )
        pass_cols.append(f"_hit{i}")
    all_pass = F.lit(True)
    for c in pass_cols:
        all_pass = all_pass & F.col(c)
    # exact confirm: only Bloom-passing grams carry a non-null join key,
    # so the string join's input is the candidate set, not the corpus
    cand_key = F.when(all_pass, F.col("gram")).alias("cand_gram")
    confirm = passed.select("id", "n_grams", cand_key).join(
        F.broadcast(bench.withColumnRenamed("gram", "cand_gram").withColumn("_hit", F.lit(1))),
        on="cand_gram",
        how="left",
    )
    per_doc = confirm.groupBy("id", "n_grams").agg(
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
