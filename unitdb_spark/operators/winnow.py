"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
SIGMOD '03 — the MOSS algorithm).

Fingerprint selection with a DENSITY GUARANTEE: hash every word
k-gram, slide a window of w consecutive hashes over the document, and
in each window select the minimum hash (rightmost on ties); the
fingerprint set is the distinct selected (hash, position) pairs. The
guarantee (Thm. 1 of the paper): any shared substring of at least
k + w - 1 words produces at least one SHARED fingerprint, while only
~2/(w+1) of all grams are kept — the sampling is content-aligned, so
two near-identical documents sample the SAME grams no matter how the
surrounding text shifts them (the property a fixed-stride sample
lacks, and the reason this is the standard plagiarism/code-clone
primitive).

Spark shape (one window pass, one distinct — both on the doc key):

- gram hashing is the repo's md5 idiom (engine-portable: the DuckDB
  oracle replays it bit-for-bit);
- the per-window "min hash, rightmost tie" selection is ONE integer
  window-min: key = h36 · 2^24 + (2^24 − 1 − pos) makes the lexical
  (min hash, max pos) order a plain integer order, so the window
  carries a single long and stays in whole-stage codegen — no struct
  comparators, no UDF;
- selected keys repeat while one gram stays minimal across sliding
  windows; `distinct` collapses them — that IS the paper's "record
  once" rule.

Bounds (documented, not silent): h36 = 36-bit hash (fingerprint
collisions only add candidate-pair noise, confirmed downstream by the
shared-count threshold); positions cap at 2^24 grams per document —
chunk longer documents first (functions.text.chunk_documents).

At 100 TB: everything before the pair join is per-document (narrow +
one window shuffle on doc_id); the pair join meets only on equal
fingerprint hashes — the same banded-meeting discipline as MinHash-LSH
— with the same degenerate-bucket cap for boilerplate grams.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: position bits in the packed (hash, position) ordering key
_POS_BITS = 24
_POS_MAX = (1 << _POS_BITS) - 1


def _h36(col: Column) -> Column:
    """36-bit md5-derived gram hash (9 hex chars — the md5_int60 idiom
    narrowed so hash·2^24 stays inside a signed 64-bit long)."""
    return F.conv(F.substring(F.md5(col), 1, 9), 16, 10).cast("long")


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """(doc_id, fp_hash, fp_pos): the winnowing fingerprint set.

    Documents shorter than k words yield no fingerprints (no full
    gram). Output is distinct and integer-exact — row-level
    oracle-checkable.
    """
    from unitdb_spark.operators.dedup import raw_tokens

    toks = df.select(
        F.col(id_col).alias("_id"), raw_tokens(text_col).alias("_tk")
    ).filter(F.size("_tk") >= k)
    # ordered, non-distinct grams with positions (winnowing is
    # position-aware: array_distinct would break the window algebra)
    grams = toks.select(
        "_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("_tk") - k),
                lambda i: F.concat_ws(" ", F.slice(F.col("_tk"), i + 1, k)),
            )
        ).alias("pos", "_g"),
    ).filter(F.col("pos") <= _POS_MAX)
    key = _h36(F.col("_g")) * F.lit(1 << _POS_BITS) + (
        F.lit(_POS_MAX) - F.col("pos")
    )
    win = (
        Window.partitionBy("_id").orderBy("pos").rowsBetween(-(w - 1), 0)
    )
    sel = grams.select(
        "_id", F.min(key).over(win).alias("_sel")
    ).distinct()
    # decode with integer ops only: the packed key is up to 60 bits,
    # past double's 53-bit mantissa — a float division would corrupt it
    return sel.select(
        F.col("_id").alias(id_col),
        F.shiftright("_sel", _POS_BITS).alias("fp_hash"),
        (F.lit(_POS_MAX) - F.pmod("_sel", F.lit(1 << _POS_BITS))).cast("int").alias("fp_pos"),
    )


def winnow_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_bucket_size: int = 500,
) -> DataFrame:
    """Near-dup candidate pairs by shared winnowing fingerprints.

    Docs meet ONLY on equal fp_hash (banded-meeting discipline, like
    the LSH bucket join); hashes held by more than ``max_bucket_size``
    docs are boilerplate and dropped before the self-join (the
    degenerate-bucket guard). Output: (id_a, id_b, n_shared) with
    id_a < id_b and n_shared >= min_shared distinct shared hashes.
    """
    fp = winnow_fingerprints(df, text_col, id_col, k, w).select(
        F.col(id_col).alias("_id"), "fp_hash"
    ).distinct()
    bw = Window.partitionBy("fp_hash")
    fp = (
        fp.withColumn("_bn", F.count(F.lit(1)).over(bw))
        .filter(F.col("_bn") <= max_bucket_size)
        .drop("_bn")
    )
    a = fp.select(F.col("_id").alias("id_a"), "fp_hash")
    b = fp.select(F.col("_id").alias("id_b"), "fp_hash")
    return (
        a.join(b, "fp_hash")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
