"""BPE tokenizer training vs an independent pure-Python model:
pair counting (overlaps tallied), (count DESC, pair) argmax, greedy
left-to-right merge application including the aaa-overlap rule."""

from __future__ import annotations

import random
from collections import Counter


def _model(text: str, n: int):
    words = Counter(text.lower().split())
    vocab = {w: list(w) for w in words}
    out = []
    for rank in range(1, n + 1):
        pc: Counter = Counter()
        for w, f in words.items():
            s = vocab[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        m = max(pc.values())
        a, b = sorted(k for k, v in pc.items() if v == m)[0]
        out.append((rank, a, b, pc[(a, b)]))
        for w in vocab:
            s, ns, i = vocab[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            vocab[w] = ns
    return out


class TestBpeTrain:
    def test_overlap_and_frequency_weighting(self, spark):
        from unitdb_spark.operators.bpe import bpe_train

        text = "low low low lower lowest aaa aaa newest newest newest"
        df = spark.createDataFrame([(1, text)], "id long, text string")
        assert bpe_train(df, n_merges=6) == _model(text, 6)

    def test_matches_model_on_random_corpora(self, spark):
        from unitdb_spark.operators.bpe import bpe_train

        rng = random.Random(42)
        syll = ["ba", "na", "to", "ken", "iz", "er", "lo", "w", "est", "s"]
        for _ in range(2):
            words = [
                "".join(rng.choice(syll) for _ in range(rng.randrange(1, 4)))
                for _ in range(30)
            ]
            text = " ".join(rng.choice(words) for _ in range(200))
            df = spark.createDataFrame(
                [(i, t) for i, t in enumerate([text[: len(text) // 2], text[len(text) // 2 :]])],
                "id long, text string",
            )
            # NOTE the model must see the SAME tokenization (split on
            # whitespace after lowercasing) — slicing mid-word changes
            # the word multiset, so compare against the sliced text
            joined = " ".join(
                [text[: len(text) // 2], text[len(text) // 2 :]]
            )
            assert bpe_train(df, n_merges=5) == _model(joined, 5)

    def test_thousand_merges_no_per_merge_jobs(self, spark):
        # production vocab sizes need ~30k merges; training must be ONE
        # corpus pass + driver-side learning, never a job per merge
        import time

        from unitdb_spark.operators.bpe import bpe_train

        rng = random.Random(7)
        words = [
            "".join(rng.choice("abcdefgh") for _ in range(rng.randrange(3, 12)))
            for _ in range(400)
        ]
        text = " ".join(rng.choice(words) for _ in range(3000))
        df = spark.createDataFrame([(1, text)], "id long, text string")
        sc = spark.sparkContext
        sc.setJobGroup("bpe1000", "bpe train")
        t0 = time.monotonic()
        try:
            rules = bpe_train(df, n_merges=1000)
        finally:
            jobs = sc.statusTracker().getJobIdsForGroup("bpe1000")
            sc.setLocalProperty("spark.jobGroup.id", None)
        elapsed = time.monotonic() - t0
        # the vocabulary collect is the only Spark work (AQE may split
        # it into a couple of jobs); 1000 sequential per-merge jobs
        # would be hundreds
        assert len(jobs) <= 4, jobs
        assert elapsed < 30.0, elapsed
        # deterministic prefix: a shorter run is a prefix of a longer one
        assert bpe_train(df, n_merges=10) == rules[:10]

    def test_stops_when_pairs_exhaust(self, spark):
        from unitdb_spark.operators.bpe import bpe_train

        df = spark.createDataFrame([(1, "ab ab cd")], "id long, text string")
        rules = bpe_train(df, n_merges=10)
        # ab (freq 2) then cd (freq 1); all words are single symbols after
        assert [(r[1], r[2]) for r in rules] == [("a", "b"), ("c", "d")]
        assert len(rules) == 2

    def test_min_freq_floor_bounds_the_collect(self, spark):
        from unitdb_spark.operators.bpe import bpe_train

        # "rare" appears once; with min_freq=2 it must not contribute
        # pairs, so the learned table equals training on the frequent
        # words alone. min_freq=1 is exact textbook (default).
        df = spark.createDataFrame(
            [(1, "low low low rare")], "id long, text string"
        )
        assert bpe_train(df, n_merges=3, min_freq=2) == _model(
            "low low low", 3
        )
        assert bpe_train(df, n_merges=3, min_freq=1) == _model(
            "low low low rare", 3
        )


class TestBpeEncode:
    def test_subword_counts_match_model(self, spark):
        from unitdb_spark.operators.bpe import bpe_subword_counts, bpe_train

        texts = {
            1: "low low lower lowest",
            2: "newest newest estimate",
            3: "aaa aaa ab",
        }
        df = spark.createDataFrame(
            list(texts.items()), "doc_id long, text string"
        )
        rules = bpe_train(df, n_merges=5)
        # python model: re-apply the learned merges greedily per word
        vocab = {w: list(w) for t in texts.values() for w in t.split()}
        for _rank, a, b, _n in sorted(rules):
            for w in vocab:
                s, ns, i = vocab[w], [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        ns.append(a + b)
                        i += 2
                    else:
                        ns.append(s[i])
                        i += 1
                vocab[w] = ns
        out = {
            r["doc_id"]: r for r in bpe_subword_counts(df, rules).collect()
        }
        for did, t in texts.items():
            ws = t.split()
            assert out[did]["n_words"] == len(ws)
            assert out[did]["n_subwords"] == sum(len(vocab[w]) for w in ws)
            # merges only ever shrink the char tokenization
            assert out[did]["n_subwords"] <= sum(len(w) for w in ws)

    def test_thousand_rules_no_per_rule_jobs(self, spark):
        # encoding under a production-sized rule table must be ONE
        # vocabulary collect + driver-side application + one count
        # join back — never a window-function job chained per rule
        import time

        from unitdb_spark.operators.bpe import bpe_subword_counts

        rng = random.Random(11)
        words = [
            "".join(rng.choice("abcdefgh") for _ in range(rng.randrange(3, 12)))
            for _ in range(300)
        ]
        text = " ".join(rng.choice(words) for _ in range(2000))
        df = spark.createDataFrame(
            [(1, text[: len(text) // 2]), (2, text[len(text) // 2 :])],
            "doc_id long, text string",
        )
        # synthetic 1000-rule table: mostly rules whose pairs never
        # occur plus one real rule — rank order must still apply
        rules = [(1, "a", "b", 1)] + [
            (r, f"x{r}", f"y{r}", 1) for r in range(2, 1001)
        ]
        sc = spark.sparkContext
        sc.setJobGroup("bpe-enc-1000", "bpe encode")
        t0 = time.monotonic()
        try:
            out = {
                r["doc_id"]: r
                for r in bpe_subword_counts(df, rules).collect()
            }
        finally:
            jobs = sc.statusTracker().getJobIdsForGroup("bpe-enc-1000")
            sc.setLocalProperty("spark.jobGroup.id", None)
        elapsed = time.monotonic() - t0
        # the vocab collect + the final count collect are the only
        # Spark work (AQE may split each into a couple of jobs); 1000
        # sequential per-rule jobs would be hundreds
        assert len(jobs) <= 6, jobs
        assert elapsed < 30.0, elapsed
        # value check against the python model with only the real rule
        # (slicing mid-word creates fragment words — model the halves)
        halves = [text[: len(text) // 2], text[len(text) // 2 :]]
        vocab = {w: list(w) for t in halves for w in t.split()}
        for w in vocab:
            s, ns, i = vocab[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == "a" and s[i + 1] == "b":
                    ns.append("ab")
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            vocab[w] = ns
        for did, t in ((1, text[: len(text) // 2]), (2, text[len(text) // 2 :])):
            ws = t.split()
            assert out[did]["n_words"] == len(ws)
            assert out[did]["n_subwords"] == sum(len(vocab[w]) for w in ws)
