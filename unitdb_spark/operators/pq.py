"""Product-Quantization ANN (Jégou et al. 2011): codes + ADC search.

Completes the similarity-search ladder (SURVEY §2.4 beyond-reference
operators): exact (`cosine_topk`) → LSH buckets → IVF cells → int8 →
PQ, the memory end of the spectrum — a 64-dim float32 vector (256 B)
compresses to m_blocks bytes of codes (4 B at the defaults), so a
100 TB embedding corpus's searchable representation fits a fraction
of cluster RAM, with the full vectors left in cold storage for
re-ranking.

Design (deterministic, SQL-replayable — same conventions as IVF):

- codebooks: one per block, K entries each = block-slices of a
  deterministic md5-ordered corpus sample (the IVF centroid trick —
  hash-threshold prefilter, superset-safe fallback, so the choice is
  bit-identical to `ORDER BY md5 LIMIT K` which oracles replay).
  k-means refinement per block is orthogonal (see operators.kmeans).
- assignment: code[m] = argmin_j L2²(subvec_m, codebook[m][j]), ties
  to the smallest code id.
- search (ADC — asymmetric distance computation): per query, a
  (block, code) → partial-dot lookup table (m_blocks × K rows, tiny);
  score(vec) ≈ Σ_m lut[m][code[m]]; top-k by (score desc, vec_id).

Scale shape: codebooks and LUTs broadcast (KBs); the corpus is
exploded ×m_blocks into block slices but the argmin partial-aggregates
map-side, so the one exchange carries m_blocks rows per vector (codes,
not vectors); search joins the int code table against the broadcast
LUT and partial-aggregates the Σ_m — the embedding column itself never
shuffles anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _sub(vec_col: str, block_col: str, sub_dim: int):
    """block-slice of a vector as double[] (1-based slice, like SQL)."""
    return F.expr(
        f"transform(slice({vec_col}, {block_col} * {sub_dim} + 1, {sub_dim}), "
        "x -> CAST(x AS DOUBLE))"
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _dist2(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_codebooks(
    corpus: DataFrame,
    dim: int,
    m_blocks: int = 4,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """(block, code, cvec): per-block codebooks from a deterministic
    md5-ordered corpus sample — engine-portable, so SQL oracles replay
    the exact codebook. Broadcast-sized (m_blocks × k_codes rows)."""
    if dim % m_blocks:
        raise ValueError(f"dim {dim} not divisible by m_blocks {m_blocks}")
    sub_dim = dim // m_blocks
    base = corpus.select(F.col(id_col).alias("_sid"), F.col(vec_col).alias("_sv"))
    h = F.md5(F.concat(F.col("_sid").cast("string"), F.lit(f":pq{seed}")))
    pref = base.filter(h < F.lit("01"))
    if pref.limit(k_codes).count() < k_codes:
        pref = base  # superset-safe fallback, identical to full ORDER BY
    samp = (
        pref.withColumn("_h", h)
        .withColumn(
            "code",
            F.row_number().over(Window.orderBy(F.col("_h"), F.col("_sid"))) - 1,
        )
        .filter(F.col("code") < k_codes)
    )
    return samp.select(
        F.explode(F.sequence(F.lit(0), F.lit(m_blocks - 1))).alias("block"),
        "code",
        F.col("_sv").alias("_cvfull"),
    ).select("block", "code", _sub("_cvfull", "block", sub_dim).alias("cvec"))


def pq_assign(
    corpus: DataFrame,
    codebooks: DataFrame,
    dim: int,
    m_blocks: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, block, code): nearest codebook entry per block.

    Explode ×m_blocks, broadcast-join the codebooks, min_by argmin
    with map-side partial agg — the exchange carries codes, not
    vectors."""
    sub_dim = dim // m_blocks
    blocks = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.explode(F.sequence(F.lit(0), F.lit(m_blocks - 1))).alias("block"),
        F.col(vec_col).alias("_v"),
    ).select("vec_id", "block", _sub("_v", "block", sub_dim).alias("_bv"))
    joined = blocks.join(F.broadcast(codebooks), "block")
    d2 = _dist2(F.col("_bv"), F.col("cvec")).alias("_d2")
    return (
        joined.select("vec_id", "block", "code", d2)
        .groupBy("vec_id", "block")
        .agg(
            F.min_by("code", F.struct(F.col("_d2"), F.col("code"))).alias("code")
        )
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    m_blocks: int = 4,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """ADC top-k: approximate dot-product search over PQ codes.

    Output: (query_id, vec_id, score_r, rank) — score rounded to 6
    decimals (the repo's cross-engine float convention), rank by
    (score desc, vec_id)."""
    sub_dim = dim // m_blocks
    cb_plan = pq_codebooks(
        corpus, dim, m_blocks, k_codes, id_col=id_col, vec_col=vec_col, seed=seed
    )
    # materialize the codebook ONCE (m_blocks × k_codes rows — KBs) and
    # re-create it as a local frame: without this, each of the two
    # broadcasts below re-executes the codebook subplan (a corpus-wide
    # md5 ordering in the fallback path) — same discipline as the
    # IVF/kmeans centroid handling
    spark = corpus.sparkSession
    cb = spark.createDataFrame(cb_plan.collect(), cb_plan.schema)
    codes = pq_assign(corpus, cb, dim, m_blocks, id_col=id_col, vec_col=vec_col)
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.sequence(F.lit(0), F.lit(m_blocks - 1))).alias("block"),
        F.col(vec_col).alias("_qv"),
    ).select("query_id", "block", _sub("_qv", "block", sub_dim).alias("_qb"))
    lut = q.join(F.broadcast(cb), "block").select(
        "query_id", "block", "code", _dot(F.col("_qb"), F.col("cvec")).alias("pdot")
    )
    scored = (
        codes.join(F.broadcast(lut), ["block", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("pdot").alias("score"))
    )
    # rank on the ROUNDED score (the repo's round-6 cross-engine
    # convention): the raw double is a sum of m_blocks partial dots
    # whose accumulation order differs between Spark's partial aggs and
    # DuckDB's SUM, so ulp-close ties could rank differently per engine
    score_r = F.round("score", 6)
    w = Window.partitionBy("query_id").orderBy(score_r.desc(), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", score_r.alias("score_r"), "rank")
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    m_blocks: int = 4,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """IVF-PQ (the FAISS-standard index shape, non-residual variant):
    IVF cells bound WHICH vectors are scored — each query probes its
    ``n_probe`` nearest cells — and PQ-ADC bounds WHAT is read to
    score them (4-byte codes, broadcast LUT). Together: at 100 TB the
    cell column is the partition key (probe = partition pruning) and
    the scored representation is the RAM-resident code table, so a
    query touches n_probe/n_cells of the code table and zero full
    vectors (follow with ``pq_rerank_topk``'s exact stage if recall
    demands it).

    Deterministic and SQL-replayable end to end: IVF centroids and PQ
    codebooks are both md5-ordered corpus samples (seeds ':{seed}' and
    ':pq{seed}'), ranking is on the round-6 score with vec_id ties.
    Output: (query_id, vec_id, score_r, rank).
    """
    from unitdb_spark.operators.similarity import cosine_expr, ivf_assign

    assigned, cents = ivf_assign(corpus, n_cells, id_col, vec_col, seed)
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    qc = q.join(F.broadcast(cents))
    wq = Window.partitionBy("query_id").orderBy(
        F.desc(cosine_expr("_qv", "_cent")), F.asc("cent_id")
    )
    probes = (
        qc.withColumn("_pr", F.row_number().over(wq))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", F.col("cent_id").alias("cell"))
    )
    cand = (
        assigned.select("vec_id", "cell")
        .join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    sub_dim = dim // m_blocks
    cb_plan = pq_codebooks(
        corpus, dim, m_blocks, k_codes, id_col=id_col, vec_col=vec_col, seed=seed
    )
    spark = corpus.sparkSession
    cb = spark.createDataFrame(cb_plan.collect(), cb_plan.schema)
    codes = pq_assign(corpus, cb, dim, m_blocks, id_col=id_col, vec_col=vec_col)
    qb = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.sequence(F.lit(0), F.lit(m_blocks - 1))).alias("block"),
        F.col(vec_col).alias("_qvv"),
    ).select("query_id", "block", _sub("_qvv", "block", sub_dim).alias("_qb"))
    lut = qb.join(F.broadcast(cb), "block").select(
        "query_id", "block", "code", _dot(F.col("_qb"), F.col("cvec")).alias("pdot")
    )
    # cand is corpus-proportional (~|queries| * corpus * n_probe /
    # n_cells), so it must NOT be forced into a broadcast — a plain
    # keyed join lets AQE broadcast when it IS small and shuffle on
    # vec_id otherwise; only the bounded frames (probes, LUT,
    # codebooks) are pinned broadcast
    scored = (
        codes.join(cand, "vec_id")
        .join(F.broadcast(lut), ["query_id", "block", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("pdot").alias("score"))
    )
    score_r = F.round("score", 6)
    w = Window.partitionBy("query_id").orderBy(score_r.desc(), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", score_r.alias("score_r"), "rank")
    )


def pq_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    shortlist: int = 50,
    m_blocks: int = 4,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Two-stage retrieval: PQ-ADC coarse top-``shortlist`` → EXACT
    dot-product re-rank → top-``k`` (the standard production ANN shape:
    search the 4 B/vector code table, touch full vectors only for the
    shortlist — at 100 TB the codes live in RAM and the float vectors
    in cold storage, and this operator is the access pattern).

    Scale shape: stage 1 is `pq_topk` (corpus never shuffles); stage 2
    BROADCASTS the (query, candidate, query-vector) shortlist —
    |queries| × shortlist rows — against ONE corpus scan, so the exact
    re-rank adds zero corpus shuffles; the final per-query window sorts
    only candidate rows. Output: (query_id, vec_id, score_r, rank) with
    the exact cosine-numerator (dot) score, round-6, ties to vec_id.
    """
    coarse = pq_topk(
        corpus, queries, dim, k=shortlist, m_blocks=m_blocks, k_codes=k_codes,
        id_col=id_col, vec_col=vec_col, query_id_col=query_id_col, seed=seed,
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("_qv"),
    )
    cand = coarse.select("query_id", "vec_id").join(q, "query_id")
    full = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("_cv"),
    )
    exact = full.join(F.broadcast(cand), "vec_id").select(
        "query_id",
        "vec_id",
        F.round(_dot(F.col("_cv"), F.col("_qv")), 6).alias("score_r"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_r"), F.asc("vec_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "score_r", "rank")
    )


def pq_distortion_report(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    m_blocks: int = 4,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Per-query ADC quantization-error report over the PQ coarse
    top-``k`` — the ERROR-based quality audit next to the RANK-based
    ones (`topk_recall` answers "did the right ids survive",
    this answers "by how much do the scores lie"): the number a
    codebook budget (m_blocks × k_codes) is tuned against, and the
    early-warning signal when a corpus drifts away from the sample
    the codebooks were trained on.

    err_micro per (query, candidate) = |adc − exact| on the shared
    round-6 score grid (floor(x·1e6 + 0.5) of each rounded score —
    exact integers, identical both engines); the report is
    (Σ err) div n and max per query.

    Output: (query_id, n_pairs, mean_err_micro, max_err_micro).

    Scale: stage 1 is `pq_topk` (codes-only, corpus never shuffles);
    the exact pass is the `pq_rerank_topk` shape — the (query,
    candidate) shortlist broadcasts against ONE corpus scan.
    """
    coarse = pq_topk(
        corpus, queries, dim, k=k, m_blocks=m_blocks, k_codes=k_codes,
        id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
        seed=seed,
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("_qv"),
    )
    cand = coarse.select(
        "query_id", "vec_id", F.col("score_r").alias("_adc")
    ).join(q, "query_id")
    full = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("_cv"),
    )
    exact = full.join(F.broadcast(cand), "vec_id").select(
        "query_id",
        F.abs(
            F.floor(F.col("_adc") * F.lit(1_000_000.0) + F.lit(0.5))
            - F.floor(
                F.round(_dot(F.col("_cv"), F.col("_qv")), 6)
                * F.lit(1_000_000.0) + F.lit(0.5)
            )
        ).cast("long").alias("_e"),
    )
    return exact.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.expr("CAST(sum(_e) div count(*) AS BIGINT)")
        .alias("mean_err_micro"),
        F.max("_e").cast("long").alias("max_err_micro"),
    )
