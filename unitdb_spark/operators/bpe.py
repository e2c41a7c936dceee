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

Spark shape — the same for BOTH directions: ONE corpus pass (token
explode + word groupBy) is the only distributed work; the vocabulary
collects driver-side (Zipf-sublinear in the corpus; bound it
explicitly with ``min_freq``) and the per-word symbol work runs in
pure Python with a pair -> words index (`_learn_merges` for training,
`_encode_vocab` for encoding — both directions are inherently
sequential in the rule order, and a per-rule Spark job would
serialize 30k job launches at a production rule table). The per-word
subword counts then join back to the token instances as a broadcast
relation.

Greedy left-to-right application per rule: overlaps only arise for
left == right pairs, where "aaa" must merge as (aa)(a), not a(aa) —
`_apply_merge` pins that contract, and the SQL oracle replays the
same semantics relationally (consecutive match positions keep even
offsets within a run).

Intra-word only, no end-of-word marker (the </w> variant changes
boundary merges, not the algorithm; documented divergence from the
paper's figure 2).

Reference parity: the reference engine has no tokenizer surface —
north-star LLM-pipeline operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from unitdb_spark.operators.dedup import raw_tokens


def _apply_merge(seq: list[str], left: str, right: str) -> list[str]:
    """Greedy left-to-right application of one merge rule to a symbol
    sequence ("aaa" under (a,a) merges as (aa)(a)). The contract the
    SQL oracle replays relationally."""
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


def _encode_vocab(
    vocab: list[str], rules: list[tuple[int, str, str, int]]
) -> dict[str, int]:
    """Driver-side encoding of a distinct-word vocabulary under a
    learned merge table: apply the rules once each, in rank order,
    greedily left-to-right per word — the `_learn_merges` machinery
    with a FIXED rule sequence instead of the argmax selection.

    The pair -> words index makes each rule cost proportional to the
    words that actually contain its pair (most of a 30k-rule
    production table touches nothing for any given vocabulary), never
    |vocab| x |rules|. Returns {word: n_subwords}."""
    from collections import defaultdict

    seqs: dict[str, list[str]] = {w: list(w) for w in vocab}
    where: defaultdict[tuple[str, str], set[str]] = defaultdict(set)
    for w, s in seqs.items():
        for a, b in zip(s, s[1:]):
            where[(a, b)].add(w)
    for _rank, left, right, *_ in sorted(rules):
        for w in list(where[(left, right)]):
            old = seqs[w]
            new = _apply_merge(old, left, right)
            if new == old:  # stale index entry (pair already consumed)
                where[(left, right)].discard(w)
                continue
            seqs[w] = new
            for a, b in zip(old, old[1:]):
                where[(a, b)].discard(w)
            for a, b in zip(new, new[1:]):
                where[(a, b)].add(w)
    return {w: len(s) for w, s in seqs.items()}


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    min_freq: int = 1,
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
    production vocab size.

    ``min_freq`` bounds the collected table BY CONSTRUCTION: words
    rarer than the floor are filtered in the distributed aggregation
    before the collect (hapax pruning — the standard trainer knob; at
    100 TB the long tail of the word distribution is mostly noise and
    typos, and a floor of even 2-10 shrinks the vocabulary by an
    order of magnitude). The default 1 keeps every word (exact
    textbook behaviour).
    """
    words = (
        df.select(F.explode(raw_tokens(text_col)).alias("_w"))
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_f"))
    )
    if min_freq > 1:
        words = words.filter(F.col("_f") >= F.lit(int(min_freq)))
    vocab = [(r["_w"], int(r["_f"])) for r in words.collect()]
    return _learn_merges(vocab, n_merges)


def bpe_train_df(
    df: DataFrame, text_col: str = "text", n_merges: int = 10,
    min_freq: int = 1,
) -> DataFrame:
    """`bpe_train` as a DataFrame: (merge_rank, merge_left,
    merge_right, n_pairs) — LEFT/RIGHT are SQL keywords, so the
    column names carry the prefix."""
    spark = df.sparkSession
    rules = bpe_train(df, text_col, n_merges, min_freq)
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
    """ENCODE under a learned merge table — the "how many subword
    tokens is my corpus under this tokenizer" question that drives
    packing/budget decisions.

    Shape mirrors `bpe_train`: ONE corpus pass builds the
    distinct-word vocabulary, the rule table applies driver-side over
    it (`_encode_vocab` — the indexed `_learn_merges` machinery with
    a fixed rule sequence; the previous relational formulation
    chained one window-function job + localCheckpoint PER RULE, which
    at a production 30k-rule table meant a 30k-stage driver-bound
    plan), and the per-word subword counts join back to the token
    instances as a broadcast relation (Zipf-small).

    Output: (id_col, n_words, n_subwords).
    """
    spark = df.sparkSession
    words = df.select(F.explode(raw_tokens(text_col)).alias("_w")).distinct()
    vocab = [r["_w"] for r in words.collect()]
    n_sub = _encode_vocab(vocab, rules)
    wc = spark.createDataFrame(
        list(n_sub.items()), "_w string, _nsub long"
    )
    inst = df.select(
        F.col(id_col).alias("_id"), F.explode(raw_tokens(text_col)).alias("_w")
    )
    return (
        inst.join(F.broadcast(wc), "_w")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("_nsub").alias("n_subwords"),
        )
        .select(F.col("_id").alias(id_col), "n_words", "n_subwords")
    )


def bpe_fertility(
    df: DataFrame,
    rules: list[tuple[int, str, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer fertility histogram under a learned merge table: for
    each subwords-per-word count, how many token INSTANCES (and word
    types) land there — the tokenizer-quality readout behind the
    corpus budget (`bpe_subword_counts` says how many tokens; this
    says WHY: n_sub = 1 is in-vocabulary mass, a heavy tail means the
    merge table fragments real words and the budget balloons).

    Same shape as the encode path: ONE distinct-word pass, the rule
    table applied driver-side over the Zipf-small vocabulary
    (`_encode_vocab`), per-word counts joined back to instances as a
    broadcast relation. inst_share_ppm is an exact integer division.

    Output: (n_sub, n_instances, n_types, inst_share_ppm).

    Scale: the histogram relation is |distinct n_sub| rows (≤ max
    word length); everything else is the bpe_subword_counts contract.
    """
    spark = df.sparkSession
    words = df.select(F.explode(raw_tokens(text_col)).alias("_w")).distinct()
    vocab = [r["_w"] for r in words.collect()]
    n_sub = _encode_vocab(vocab, rules)
    wc = spark.createDataFrame(
        list(n_sub.items()), "_w string, _nsub long"
    )
    inst = df.select(F.explode(raw_tokens(text_col)).alias("_w"))
    hist = (
        inst.join(F.broadcast(wc), "_w")
        .groupBy("_nsub")
        .agg(
            F.count(F.lit(1)).alias("n_instances"),
            F.countDistinct("_w").alias("n_types"),
        )
    )
    tot = hist.agg(F.sum("n_instances").alias("_nt"))
    return hist.join(F.broadcast(tot)).select(
        F.col("_nsub").cast("long").alias("n_sub"),
        F.col("n_instances").cast("long").alias("n_instances"),
        F.col("n_types").cast("long").alias("n_types"),
        F.expr("(n_instances * 1000000L) div _nt")
        .cast("long").alias("inst_share_ppm"),
    )
