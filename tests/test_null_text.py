"""NULL/empty-text pins for the r12/r13 explode_outer rewrite sites.

The round-12 optimization replaced `explode` with `explode_outer` (plus
array-level filtering) in the MinHash signature build, the PassJoin
chunk-key tower, the ROUGE/decontam gram explodes, and the substring
k-gram family, relying on never-empty / never-NULL invariants of the
generated arrays. Those invariants hold for the shipped corpus (text is
NOT NULL), but the r12 verdict asked for defensive pins: one NULL-text
and one empty-text row through each rewritten site, with the outputs
pinned, so a future refactor that silently changes the NULL path fails
loudly here instead of in a downstream oracle.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def ndocs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, None),
            (3, "the quick brown fox leaps over the lazy dog"),
            (4, ""),
        ],
        "doc_id long, text string",
    )


class TestNullTextPins:
    def test_minhash_lsh_null_empty_collapse(self, spark, ndocs):
        # NULL and "" both shingle to the [""] sentinel, so they band
        # together and estimate J=1 — the pre-r12 explode+filter
        # formulation did the same (the shingle array is never empty).
        from unitdb_spark.operators.dedup import (
            minhash_lsh_pairs,
            minhash_lsh_pairs_md5,
        )

        got = sorted(
            tuple(r) for r in minhash_lsh_pairs(ndocs, num_hashes=8, bands=4).collect()
        )
        assert (2, 4, 1.0) in got
        got_md5 = sorted(
            tuple(r)
            for r in minhash_lsh_pairs_md5(ndocs, num_hashes=8, bands=4).collect()
        )
        assert got_md5 == [(1, 3, 0.5), (2, 4, 1.0)]

    def test_link_records_chunk_key_null_name(self, spark):
        # a NULL left name keeps its NULL-match row (the operator's
        # no-silent-drop contract); a NULL right name matches nothing.
        from unitdb_spark.operators.linkage import link_records

        left = spark.createDataFrame(
            [(1, "alpha beta", "x"), (2, None, "x"), (3, "gamma", "x")],
            "id long, name string, blk string",
        )
        right = spark.createDataFrame(
            [(10, "alpha beta!", "x"), (11, None, "x"), (12, "gamm", "x")],
            "rid long, rname string, blk string",
        )
        got = sorted(
            tuple(r)
            for r in link_records(
                left, right, ["blk"], "id", "rid", "name", "rname",
                max_distance=2, chunk_key=True,
            ).collect()
        )
        assert got == [
            (1, 10, 1, 909090, 1),
            (2, None, None, None, 0),
            (3, 12, 1, 800000, 1),
        ]

    def test_rouge_null_text_zero_grams(self, spark, ndocs):
        from unitdb_spark.operators.evaluation import rouge_n_pairs

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3)], "id_a long, id_b long"
        )
        got = {
            (r.id_a, r.id_b): (r.overlap, r.n_grams_a, r.n_grams_b,
                               r.rouge_p_ppm, r.rouge_r_ppm, r.rouge_f1_ppm)
            for r in rouge_n_pairs(ndocs, pairs, n=2).collect()
        }
        # NULL text contributes zero grams; ratios against it are NULL
        assert got[(1, 2)] == (0, 8, 0, 0, None, None)
        assert got[(2, 3)] == (0, 0, 8, None, 0, None)

    def test_decontaminate_null_text_sentinel_gram(self, spark, ndocs):
        # NULL and "" produce the single sentinel gram; with a NULL row
        # in the benchmark set too, they count as contaminated — pinned
        # (identical to the pre-r12 explode semantics on these inputs).
        from unitdb_spark.operators.decontam import decontaminate

        bench = spark.createDataFrame(
            [(100, "quick brown fox"), (101, None)],
            "doc_id long, text string",
        )
        got = {r["id"]: (r.n_grams, r.n_contaminated, r.contaminated)
               for r in decontaminate(ndocs, bench, n=3).collect()}
        assert got[1] == (7, 1, False)
        assert got[2] == (1, 1, True)
        assert got[4] == (1, 1, True)

    def test_substring_family_null_text(self, spark):
        from unitdb_spark.operators.substring import (
            novelty_stats,
            substring_dup_stats,
        )

        docs = spark.createDataFrame(
            [(1, "a b c a b c a b"), (2, None), (3, "x y z w v u t s"), (4, "")],
            "doc_id long, text string",
        )
        dup = {r.doc_id: (r.n_tokens, r.n_pos, r.n_dup_pos, r.dup_ppm, r.is_dup)
               for r in substring_dup_stats(docs, k=3).collect()}
        assert dup[2] == (None, 0, 0, 0, 0)   # NULL text: zero positions
        assert dup[4] == (0, 0, 0, 0, 0)      # empty text: zero positions
        assert dup[1] == (8, 6, 6, 1_000_000, 1)
        nov = {r.doc_id: (r.n_grams, r.n_novel)
               for r in novelty_stats(docs, k=3).collect()}
        # NULL/empty docs have no k-grams and no novelty row at all
        assert set(nov) == {1, 3}
        assert nov[1] == (3, 3)

    def test_char_entropy_and_repetition_null_text(self, spark):
        from unitdb_spark.functions import text as TXT

        docs = spark.createDataFrame(
            [(1, "a b c a b c a b"), (2, None), (3, "x y z w v u t s"), (4, "")],
            "doc_id long, text string",
        )
        ent = sorted(tuple(r) for r in TXT.char_entropy(docs).collect())
        assert ent == [(1, 15, 4, 550726), (3, 15, 9, 781711)]
        rep = sorted(
            tuple(r)
            for r in TXT.ngram_repetition(docs, "text", "doc_id", 3).collect()
        )
        assert rep == [
            (1, 0.3333333333333333),
            (2, 1.0),
            (3, 0.16666666666666666),
            (4, 0.0),
        ]

    def test_token_sets_prefilter_equivalence(self, spark):
        # r13: _token_sets drops the post-tokenize size(_tok) > 0
        # filter (pushdown inlined the tokenizer below the fan-out
        # repartition as a serial 38s scan task at sf1) in favor of a
        # cheap text predicate. Pins the replacement's equivalence on
        # the edge rows: word mode drops NULL/empty/whitespace-only
        # texts; shingle mode keeps every row (NULL/empty token lists
        # still shingle to [""] — the invariant the r12 explode_outer
        # rewrites also rely on).
        from unitdb_spark.operators.setjoin import _token_sets

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (2, None), (3, ""),
             (4, "   "), (5, "one")],
            "doc_id long, text string",
        )
        word = {
            r._id: r._tok
            for r in _token_sets(docs, "text", "doc_id", "word", 3).collect()
        }
        assert word == {
            1: ["alpha", "beta", "gamma", "delta"], 5: ["one"]
        }
        sh = {
            r._id: r._tok
            for r in _token_sets(docs, "text", "doc_id", "shingle", 3).collect()
        }
        assert sh == {
            1: ["alpha beta gamma", "beta gamma delta"],
            2: [""], 3: [""], 4: [""], 5: ["one"],
        }
