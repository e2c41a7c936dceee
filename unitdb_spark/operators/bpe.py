"""Byte-pair-encoding tokenizer training (Sennrich et al. 2016).

The LLM-pipeline operator the token-counting family assumes someone
already ran: LEARN the merge table from the corpus. Word-level BPE:

1. one corpus pass builds the word-frequency vocabulary (the ONLY
   corpus-sized work — everything after runs on the vocabulary
   relation, which grows sublinearly with data);
2. every word becomes its character-symbol sequence;
3. iterate: count adjacent symbol pairs weighted by word frequency,
   take the most frequent pair ((count DESC, left, right) — a total
   order, so training is deterministic), merge it greedily
   left-to-right in every word, repeat.

Spark shape: ONE corpus pass (token explode + word-frequency groupBy)
is the only distributed work; the vocabulary collects driver-side and
all merges are learned in pure Python with incremental pair-count
updates (`_learn_merges` — merge learning is inherently sequential,
and a per-merge Spark job would serialize 30k job launches at a
production vocab). ENCODING stays relational on the vocabulary
relation so the SQL oracle can replay it: the greedy left-to-right
application matches positions (sym = left, next = right) into runs of
consecutive positions; within a run, matches at even offsets from the
run start are applied (overlaps only arise for left == right pairs,
where "aaa" must merge as (aa)(a), not a(aa)). The Python
`_apply_merge` implements the same contract.

Intra-word only, no end-of-word marker (the </w> variant changes
boundary merges, not the algorithm; documented divergence from the
paper's figure 2).

Reference parity: the reference engine has no tokenizer surface —
north-star LLM-pipeline operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from unitdb_spark.operators.dedup import raw_tokens


def _word_symbols(words: DataFrame) -> DataFrame:
    """(word, freq) -> (word, freq, pos, sym): one row per character,
    1-based positions, substr-over-index (the char_entropy convention —
    no split() semantics dependence)."""
    return words.select(
        "_w",
        "_f",
        F.posexplode(F.sequence(F.lit(1), F.length("_w"))).alias("_x", "_p"),
    ).select(
        "_w", "_f", F.col("_p").alias("_pos"),
        F.substring(F.col("_w"), F.col("_p"), 1).alias("_sym"),
    )


def _merge_once(syms: DataFrame, left: str, right: str) -> DataFrame:
    """Apply one merge rule greedily left-to-right, relationally:
    runs of consecutive match positions keep even offsets; kept
    matches become the concatenated symbol, their right neighbors
    drop, everything re-numbers."""
    w = Window.partitionBy("_w").orderBy("_pos")
    with_next = syms.select(
        "_w", "_f", "_pos", "_sym", F.lead("_sym").over(w).alias("_nxt")
    )
    flagged = with_next.withColumn(
        "_m", (F.col("_sym") == left) & (F.col("_nxt") == right)
    )
    # runs of consecutive match positions: island id = pos - rank
    wm = Window.partitionBy("_w").orderBy("_pos")
    runs = flagged.withColumn(
        "_isl",
        F.when(
            F.col("_m"),
            F.col("_pos")
            - F.row_number().over(
                Window.partitionBy("_w", "_m").orderBy("_pos")
            ),
        ),
    )
    wr = Window.partitionBy("_w", "_isl")
    sel = runs.withColumn(
        "_apply",
        F.col("_m")
        & (((F.col("_pos") - F.min("_pos").over(wr)) % 2) == 0),
    )
    # a position is DROPPED when the previous position applied
    dropped = sel.withColumn(
        "_drop", F.coalesce(F.lag("_apply").over(wm), F.lit(False))
    )
    out = (
        dropped.filter(~F.col("_drop"))
        .select(
            "_w",
            "_f",
            "_pos",
            F.when(F.col("_apply"), F.concat(F.lit(left), F.lit(right)))
            .otherwise(F.col("_sym"))
            .alias("_sym"),
        )
        .select(
            "_w", "_f",
            F.row_number().over(wm).alias("_pos"),
            "_sym",
        )
    )
    return out


def _apply_merge(seq: list[str], left: str, right: str) -> list[str]:
    """Greedy left-to-right application of one merge rule to a symbol
    sequence — the Python twin of `_merge_once` ("aaa" under (a,a)
    merges as (aa)(a))."""
    out: list[str] = []
    i, n = 0, len(seq)
    while i < n:
        if i + 1 < n and seq[i] == left and seq[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def _learn_merges(
    vocab: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Driver-side merge learning over the collected word-frequency
    vocabulary (Sennrich et al. 2016, the standard incremental-update
    implementation): pair counts live in a dict, and each merge only
    re-segments the words that CONTAIN the chosen pair (tracked by a
    pair -> words index), so cost per merge is proportional to the
    affected slice of the vocabulary, not the whole table.

    Selection order (count DESC, left ASC, right ASC) matches the
    relational formulation bit-for-bit: Python's str comparison is by
    code point, which equals Spark's UTF8String byte order (UTF-8
    preserves code-point order)."""
    from collections import Counter, defaultdict

    seqs: dict[str, list[str]] = {w: list(w) for w, _ in vocab}
    freq: dict[str, int] = dict(vocab)
    counts: Counter = Counter()
    where: defaultdict[tuple[str, str], set[str]] = defaultdict(set)
    for w, f in vocab:
        s = seqs[w]
        for a, b in zip(s, s[1:]):
            counts[(a, b)] += f
            where[(a, b)].add(w)
    rules: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        if not counts:
            break
        (left, right), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        rules.append((rank, left, right, int(n)))
        for w in list(where[(left, right)]):
            f = freq[w]
            old = seqs[w]
            new = _apply_merge(old, left, right)
            seqs[w] = new
            for a, b in zip(old, old[1:]):
                counts[(a, b)] -= f
                if counts[(a, b)] <= 0:
                    del counts[(a, b)]
                where[(a, b)].discard(w)
            for a, b in zip(new, new[1:]):
                counts[(a, b)] += f
                where[(a, b)].add(w)
    return rules


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merge rules from the corpus.

    Returns the merge table driver-side: [(rank, left, right,
    n_pairs)] with rank 1-based and n_pairs the weighted adjacent-pair
    count at selection time (overlapping occurrences counted, the
    textbook tally). Stops early if the symbol pairs exhaust.

    ONE Spark job total: the corpus pass that builds the
    word-frequency vocabulary (the only corpus-sized work). The
    vocabulary is collected driver-side — it is Zipf-sublinear in the
    corpus and merge learning is inherently sequential, so learning in
    pure Python with incremental pair-count updates (standard
    practice; `_learn_merges`) replaces the previous
    one-Spark-job-per-merge loop that serialized 30k job launches at a
    production vocab size. At 100 TB, bound the collected table with a
    frequency floor on the words relation (hapax pruning — the
    standard trainer knob) before calling.

    The rules ARE metadata (a tokenizer ships them as a file), so a
    driver-side list is the honest return type; `bpe_train_df` wraps
    them as a DataFrame for the oracle-checked query surface.
    """
    words = (
        df.select(F.explode(raw_tokens(text_col)).alias("_w"))
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_f"))
    )
    vocab = [(r["_w"], int(r["_f"])) for r in words.collect()]
    return _learn_merges(vocab, n_merges)


def bpe_train_df(
    df: DataFrame, text_col: str = "text", n_merges: int = 10
) -> DataFrame:
    """`bpe_train` as a DataFrame: (merge_rank, merge_left,
    merge_right, n_pairs) — LEFT/RIGHT are SQL keywords, so the
    column names carry the prefix."""
    spark = df.sparkSession
    rules = bpe_train(df, text_col, n_merges)
    return spark.createDataFrame(
        rules,
        "merge_rank int, merge_left string, merge_right string, n_pairs long",
    )


def bpe_subword_counts(
    df: DataFrame,
    rules: list[tuple[int, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ENCODE under a learned merge table: apply the rules in rank
    order to the corpus VOCABULARY (each application is the same
    relational greedy merge training used), then join the per-word
    subword counts back to the token instances — the "how many
    subword tokens is my corpus under this tokenizer" question that
    drives packing/budget decisions.

    Scale shape: merges run on the vocabulary relation; the only
    corpus-sized work is the token explode + the word-count join
    (vocab relation broadcasts when it fits — it is Zipf-small).

    Output: (id_col, n_words, n_subwords).
    """
    words = (
        df.select(F.explode(raw_tokens(text_col)).alias("_w"))
        .distinct()
        .select("_w", F.lit(1).alias("_f"))
    )
    syms = _word_symbols(words).localCheckpoint(eager=False)
    for _rank, left, right, _n in sorted(rules):
        syms = _merge_once(syms, left, right).localCheckpoint(eager=False)
    wc = syms.groupBy("_w").agg(F.count(F.lit(1)).alias("_nsub"))
    inst = df.select(
        F.col(id_col).alias("_id"), F.explode(raw_tokens(text_col)).alias("_w")
    )
    return (
        inst.join(wc, "_w")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("_nsub").alias("n_subwords"),
        )
        .select(F.col("_id").alias(id_col), "n_words", "n_subwords")
    )
