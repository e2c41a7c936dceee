

class TestCompressionSignal:
    def test_band_separation_and_determinism(self, spark):
        """The signal's whole point: boilerplate << prose < noise, and
        the kernel is partitioning-invariant (same zlib, same bytes)."""
        import random

        from unitdb_spark.functions.text import compression_signal

        rng = random.Random(7)
        vocab = (
            "the quick brown fox jumps over lazy dog while river bends "
            "quietly past old mill and children laugh warm afternoon "
            "light near market square today morning evening bright "
            "garden stone bridge water wind autumn harvest letter"
        ).split()
        prose = " ".join(rng.choice(vocab) for _ in range(220))
        rows = [
            (1, "spam spam spam " * 100),
            (2, prose),
            (3, "".join(chr(rng.randrange(0x21, 0x7F)) for _ in range(1200))),
            (4, ""),
            (5, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in compression_signal(df).collect()}
        assert out[1]["ratio_ppm"] < 100_000
        assert 200_000 < out[2]["ratio_ppm"] < 700_000
        assert out[3]["ratio_ppm"] > 750_000
        assert out[1]["ratio_ppm"] < out[2]["ratio_ppm"] < out[3]["ratio_ppm"]
        assert out[4]["n_bytes"] == 0 and out[4]["ratio_ppm"] is None
        assert out[5]["zlib_bytes"] is None and out[5]["ratio_ppm"] is None
        # partitioning invariance
        again = {
            r["doc_id"]: r["ratio_ppm"]
            for r in compression_signal(df.repartition(7)).collect()
        }
        assert again == {k: v["ratio_ppm"] for k, v in out.items()}

    def test_matches_stdlib_zlib(self, spark):
        import zlib

        from unitdb_spark.functions.text import compression_signal

        texts = ["hello world", "aaaa" * 50, "päivää ✓ ünïcode"]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in compression_signal(df).collect()}
        for i, t in enumerate(texts):
            b = t.encode("utf-8")
            assert out[i]["n_bytes"] == len(b)
            assert out[i]["zlib_bytes"] == len(zlib.compress(b, 6))
            assert out[i]["ratio_ppm"] == len(zlib.compress(b, 6)) * 10**6 // len(b)


class TestCcnScrubbing:
    def test_luhn_verification_separates_decoys(self, spark):
        """Valid test numbers (any separator spelling) are counted and
        scrubbed; Luhn-invalid runs and short order-ids survive — the
        property blind digit redaction lacks."""
        from unitdb_spark.functions.text import pii_ccn_count, scrub_ccn

        rows = [
            (1, "pay with 4111 1111 1111 1111 now"),
            (2, "bad 4111111111111112 number"),
            (3, "amex 3400-0000-0000-009 here"),
            (4, "order 12345 on 2024-01-01 no card"),
            (5, "two cards 4111111111111111 and 5500 0000 0000 0004 ok"),
        ]
        df = spark.createDataFrame(rows, "id long, text string")
        out = {
            r["id"]: r
            for r in df.select(
                "id",
                pii_ccn_count("text").alias("n"),
                scrub_ccn("text").alias("s"),
            ).collect()
        }
        assert [out[i]["n"] for i in range(1, 6)] == [1, 0, 1, 0, 2]
        assert out[1]["s"] == "pay with [CCN] now"
        assert out[2]["s"] == "bad 4111111111111112 number"
        assert out[3]["s"] == "amex [CCN] here"
        assert out[5]["s"] == "two cards [CCN] and [CCN] ok"

    def test_codegen_no_python(self, spark):
        """The whole detect+verify+scrub path must stay JVM-side."""
        from unitdb_spark.functions.text import pii_ccn_count, scrub_ccn

        df = spark.createDataFrame([(1, "x")], "id long, text string")
        out = df.select(pii_ccn_count("text"), scrub_ccn("text"))
        assert "pythonUDF" not in out._jdf.queryExecution().executedPlan().toString()


class TestRleRunDensity:
    def test_hand_counts_and_edges(self, spark):
        from unitdb_spark.functions.text import rle_run_density

        df = spark.createDataFrame(
            [
                (1, "aaabbc"),   # runs: aaa|bb|c = 3
                (2, ""),         # empty: 0 runs, NULL ppm
                (3, "x"),        # single char: 1 run
                (4, "abab"),     # no repeats: 4 runs (ppm = 1e6)
                (5, "aaaaaaaa"), # one run of 8
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in rle_run_density(df).collect()}
        assert (out[1]["n_chars"], out[1]["n_runs"]) == (6, 3)
        assert out[1]["runs_ppm"] == (3 * 1_000_000) // 6
        assert (out[2]["n_runs"], out[2]["runs_ppm"]) == (0, None)
        assert (out[3]["n_runs"], out[3]["runs_ppm"]) == (1, 1_000_000)
        assert out[4]["runs_ppm"] == 1_000_000
        assert out[5]["runs_ppm"] == 125_000

    def test_partitioning_invariance(self, spark):
        from unitdb_spark.functions.text import rle_run_density

        rows = [(i, ("ab" * i) + "z" * (i % 5)) for i in range(30)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = sorted(map(tuple, rle_run_density(df).collect()))
        b = sorted(map(tuple, rle_run_density(df.repartition(7)).collect()))
        assert a == b


class TestPhonePii:
    def test_nanp_verification_and_scrub(self, spark):
        from unitdb_spark.functions.text import pii_phone_count, scrub_phone

        rows = [
            (1, "call (415) 555-2671 now"),       # valid
            (2, "call (015) 555-2671 now"),       # bad area code
            (3, "ring +1 212.555.0188 today"),    # valid, +1 dotted
            (4, "order 123 456-7890 is (155) 555-0000"),  # bad x2
            (5, "two: (415) 555-2671 and 646-555-0111 ok"),
        ]
        df = spark.createDataFrame(rows, "id long, text string")
        out = {
            r.id: r
            for r in df.select(
                "id",
                pii_phone_count("text").alias("n"),
                scrub_phone("text").alias("s"),
            ).collect()
        }
        assert out[1].n == 1 and "[PHONE]" in out[1].s
        assert out[2].n == 0 and out[2].s == rows[1][1]
        assert out[3].n == 1 and "+1 212.555.0188" not in out[3].s
        # 123...: area 1xx invalid as 10-digit; (155): exchange fine
        # but area 1xx invalid -> both survive
        assert out[4].n == 0 and out[4].s == rows[3][1]
        assert out[5].n == 2 and out[5].s.count("[PHONE]") == 2
