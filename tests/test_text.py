

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
