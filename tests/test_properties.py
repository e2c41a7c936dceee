"""Property-based tests (hypothesis) for the round-3 time-series
algebra: the Spark operators are checked against independent pandas
models on randomized inputs — beyond the reference's golden-value
style (SURVEY §5), these pin the algebra itself (frame bounds, tie
order, grid alignment) rather than one fixture.

Example counts are kept small: each example pays a Spark job; the
value is in the model comparison, not the volume.
"""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import example, given, settings, strategies as st

T0 = dt.datetime(2024, 1, 1)

# events: (minute offsets strictly increasing, 3-decimal values)
_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=500),
        st.decimals(min_value=-100, max_value=100, places=3).map(float),
    ),
    min_size=1,
    max_size=40,
).map(lambda xs: [( i, off, v) for i, (off, v) in enumerate(xs)])


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, T0 + dt.timedelta(minutes=off), "k", v) for i, off, v in rows],
        "event_id long, ts timestamp, event_type string, value double",
    )


class TestZscoreProperty:
    @settings(max_examples=12, deadline=None)
    @given(rows=_events)
    def test_matches_python_model(self, spark, rows):
        from unitdb_spark.operators.timeseries import trailing_zscore

        out = trailing_zscore(
            _df(spark, rows), ["event_type"], ["ts", "event_id"], "value",
            n=5, z=2.0,
        ).collect()
        got = {r["event_id"]: (r["trail_n"], r["is_anomaly"]) for r in out}
        # model: same ordering (ts, event_id); trailing 5 excl. current.
        # s/q mirror the operator's DECIMAL(18,6) accumulation EXACTLY
        # (Decimal sums, one float conversion at the end) — an
        # fsum-of-doubles model disagrees on exact lhs==rhs ties (e.g.
        # constant windows, where the decimal path gets rhs == 0.0
        # while double rounding leaves a residual)
        from decimal import Decimal

        ordered = sorted(rows, key=lambda r: (r[1], r[0]))
        vals = []
        for i, _, v in ordered:
            tail = vals[-5:]
            m = len(tail)
            if m >= 2:
                s = float(sum(tail))
                q = float(sum(x * x for x in tail))
                flag = (m * v - s) ** 2 > 4.0 * (m * q - s * s)
            else:
                flag = False
            assert got[i] == (m, flag), (i, got[i], (m, flag))
            vals.append(Decimal(str(round(v, 6))))


class TestOhlcProperty:
    @settings(max_examples=12, deadline=None)
    @given(rows=_events)
    def test_matches_pandas_model(self, spark, rows):
        from unitdb_spark.operators.timeseries import ohlc

        out = ohlc(_df(spark, rows), ["event_type"], bucket="1 hour").collect()
        got = {
            r["window_start"]: (r["open"], r["high"], r["low"], r["close"], r["n"])
            for r in out
        }
        buckets = {}
        for i, off, v in rows:
            b = T0 + dt.timedelta(hours=(off // 60))
            buckets.setdefault(b, []).append((i, v))
        assert set(got) == set(buckets)
        for b, members in buckets.items():
            members.sort()  # by event_id — the declared open/close order
            vals = [v for _, v in members]
            want = (members[0][1], max(vals), min(vals), members[-1][1], len(vals))
            assert got[b] == want, (b, got[b], want)


class TestGapFillProperty:
    @settings(max_examples=10, deadline=None)
    @given(rows=_events, step=st.sampled_from([15, 30, 60]))
    def test_dense_grid_and_locf(self, spark, rows, step):
        from unitdb_spark.operators.timeseries import gap_fill

        out = gap_fill(_df(spark, rows), ["event_type"], step_minutes=step).collect()
        by_bucket = {r["bucket_ts"]: r for r in out}
        offs = [off for _, off, _ in rows]
        lo = (min(offs) // step) * step
        hi = (max(offs) // step) * step
        want_grid = [
            T0 + dt.timedelta(minutes=m) for m in range(lo, hi + step, step)
        ]
        assert sorted(by_bucket) == want_grid  # dense, step-aligned
        # LOCF: every bucket at/after the first observation is filled
        assert all(r["filled_value"] is not None for r in out)
        # a bucket holding data is not a gap and its avg matches a model
        import statistics

        buckets = {}
        for _, off, v in rows:
            buckets.setdefault((off // step) * step, []).append(v)
        for m, vals in buckets.items():
            r = by_bucket[T0 + dt.timedelta(minutes=m)]
            assert not r["is_gap"]
            assert abs(r["avg_value"] - statistics.fmean(vals)) < 1e-9


# ---------------------------------------------------------- winnowing

_doc_words = st.lists(
    st.sampled_from([f"w{i}" for i in range(12)]),  # small vocab -> hash ties happen
    min_size=0,
    max_size=40,
)


def _winnow_model(words: list[str], k: int, w: int) -> set[tuple[int, int]]:
    """Pure-Python robust winnowing (Schleimer '03): per window of w
    consecutive gram hashes select (min hash, rightmost position);
    fingerprints = distinct selections. Mirrors the operator's md5/h36
    hashing exactly."""
    import hashlib

    if len(words) < k:
        return set()
    grams = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:9], 16) for g in grams]
    out = set()
    for end in range(len(hs)):
        lo = max(0, end - w + 1)
        window = hs[lo:end + 1]
        m = min(window)
        pos = max(i for i in range(lo, end + 1) if hs[i] == m)  # rightmost tie
        out.add((m, pos))
    return out


@given(_doc_words)
@settings(max_examples=12, deadline=None)
def test_winnow_matches_python_model(spark, words):
    from unitdb_spark.operators.winnow import winnow_fingerprints

    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    got = {
        (r["fp_hash"], r["fp_pos"])
        for r in winnow_fingerprints(df, k=3, w=4).collect()
    }
    assert got == _winnow_model([w.lower() for w in words], 3, 4)


# ------------------------------------------- symmetric wildcard match

_level = st.sampled_from(["a", "b", "c", "*"])
_topic = st.tuples(
    st.lists(_level, min_size=1, max_size=4),
    st.booleans(),  # trailing '...'
).map(lambda t: ".".join(t[0]) + ("..." if t[1] else ""))


@given(st.lists(_topic, min_size=1, max_size=12, unique=True), _topic)
@settings(max_examples=15, deadline=None)
def test_topic_match_expr_equals_python_matcher(spark, stored, query):
    """The Column-expression wildcard matcher (operators.topic_match,
    what every Get compiles to) must agree with the pure-Python
    semantics model (core.topic.topic_match) on random stored/query
    topic combinations — both directions of the symmetric match,
    tails, and '*' levels included."""
    from unitdb_spark.core.topic import topic_match
    from unitdb_spark.operators.topic_match import topic_match_expr
    from unitdb_spark.table import with_topic_columns

    from pyspark.sql import functions as F

    df = with_topic_columns(
        spark.createDataFrame([(t,) for t in stored], "topic string")
    )
    got = {
        r["topic"] for r in df.filter(topic_match_expr(query)).collect()
    }
    want = {t for t in stored if topic_match(t, query)}
    assert got == want, f"query={query!r}"


# ---------------------------------------------------- round-4 text ops

_line_st = st.lists(
    st.one_of(
        st.sampled_from(
            ["HOME", "Share", "ok go", "ok then.", "12345 678", "",
             "a normal sentence with several words here.",
             "SHOUTY LINE", "- bullet item", "to be continued..."]
        ),
        st.text(
            alphabet="abcdefg .!?#-",
            min_size=0,
            max_size=30,
        ),
    ),
    min_size=1,
    max_size=12,
)


class TestLineFilterProperty:
    @settings(max_examples=15, deadline=None)
    @given(lines=_line_st)
    def test_matches_python_model(self, spark, lines):
        import re

        from unitdb_spark.functions.text import LINE_NAV_WORDS, line_filter

        text = "\n".join(lines)
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        cols = line_filter("text")
        [row] = df.select(
            cols["n_lines"].alias("n"),
            cols["n_removed"].alias("r"),
            cols["clean_text"].alias("t"),
        ).collect()

        def keep(l):
            has_alpha = re.search(r"[A-Za-z]", l) is not None
            all_caps = l.upper() == l and has_alpha
            nav = l.strip().lower() in LINE_NAV_WORDS
            n_words = len([w for w in re.split(r"\s+", l.strip()) if w])
            short = n_words < 3 and re.search(r"[.!?]\s*$", l) is None
            return has_alpha and not all_caps and not nav and not short

        kept = [l for l in lines if keep(l)]
        assert row["n"] == len(lines)
        assert row["r"] == len(lines) - len(kept)
        assert row["t"] == "\n".join(kept)


class TestGopherProperty:
    @settings(max_examples=15, deadline=None)
    @given(lines=_line_st)
    def test_counts_match_python_model(self, spark, lines):
        import re

        from unitdb_spark.functions.text import (
            GOPHER_REQUIRED_WORDS,
            gopher_rules,
        )

        text = "\n".join(lines)
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        rules = gopher_rules("text", min_words=2, max_words=50)
        [row] = df.select(
            *[v.alias(k) for k, v in rules.items()]
        ).collect()

        toks = [t for t in re.split(r"\s+", text.lower()) if t]
        n = len(toks)
        sum_len = sum(len(t) for t in toks)
        n_alpha = len([t for t in toks if re.search(r"[a-z]", t)])
        n_lines = len(lines)
        n_bullet = len([l for l in lines if re.match(r"^\s*[-*•]", l)])
        n_ell_line = len([l for l in lines if re.search(r"\.\.\.\s*$", l)])
        n_hash = text.count("#")
        n_ell = (len(text) - len(text.replace("...", ""))) // 3
        n_req = sum(1 for w in GOPHER_REQUIRED_WORDS if w in toks)

        assert row["r_word_count"] == (2 <= n <= 50)
        assert row["r_mean_len"] == (3 * n <= sum_len <= 10 * n)
        assert row["r_symbols"] == (10 * n_hash <= n and 10 * n_ell <= n)
        assert row["r_bullets"] == (10 * n_bullet <= 9 * n_lines)
        assert row["r_ellipsis"] == (10 * n_ell_line <= 3 * n_lines)
        assert row["r_alpha"] == (5 * n_alpha >= 4 * n)
        assert row["r_stops"] == (n_req >= 2)


class TestHistogramQuantilesProperty:
    @settings(max_examples=12, deadline=None)
    @given(
        vals=st.lists(
            st.decimals(min_value=0, max_value=999, places=2).map(float),
            min_size=1,
            max_size=30,
        ),
        q=st.sampled_from([0.25, 0.5, 0.75, 0.9]),
    )
    def test_matches_python_interpolation(self, spark, vals, q):
        from unitdb_spark.operators.sketch import histogram_quantiles

        df = spark.createDataFrame(
            [("k", v) for v in vals], "key string, value double"
        )
        [row] = histogram_quantiles(
            df, "value", ["key"], [q], lo=0.0, hi=1000.0, n_buckets=20
        ).collect()

        import collections

        width = 50.0
        hist = collections.Counter(min(max(int(v // width), 0), 19) for v in vals)
        target = q * len(vals)
        cum = 0
        for b in sorted(hist):
            prev, cum = cum, cum + hist[b]
            if prev < target <= cum:
                est = 0.0 + b * width + (target - prev) / hist[b] * width
                break
        assert row["n"] == len(vals)
        assert row["est_r"] == round(est, 6) or abs(row["est_r"] - est) < 1e-6


class TestCusumProperty:
    @settings(max_examples=10, deadline=None)
    @given(rows=_events)
    def test_closed_form_equals_direct_recurrence(self, spark, rows):
        """C+ = S - min(0, min S) must equal the textbook sequential
        recurrence max(0, C+_{i-1} + dev_i) on random series (both
        computed over the same round-6/decimal deviations)."""
        from decimal import Decimal

        from unitdb_spark.operators.timeseries import cusum

        by_id = {
            r["event_id"]: r
            for r in cusum(_df(spark, rows), ["event_type"],
                           ["ts", "event_id"], "value", h=5.0).collect()
        }
        # replicate the operator's exact decimal deviations, iterating
        # in the SAME (ts, event_id) order the windows use
        ordered = sorted(rows, key=lambda t: (t[1], t[0]))
        vals = [Decimal(str(round(v, 6))) for _, _, v in ordered]
        mean_r = Decimal(str(round(float(sum(vals)) / len(vals), 6)))
        devs = [v - mean_r for v in vals]
        cpos = cneg = Decimal(0)
        for (ev_id, _, _), d in zip(ordered, devs):
            cpos = max(Decimal(0), cpos + d)
            cneg = max(Decimal(0), cneg - d)
            r = by_id[ev_id]
            assert Decimal(str(r["cusum_pos_r"])) == cpos
            assert Decimal(str(r["cusum_neg_r"])) == cneg


class TestMortonProperty:
    @settings(max_examples=25, deadline=None)
    @given(
        x=st.integers(min_value=0, max_value=(1 << 16) - 1),
        y=st.integers(min_value=0, max_value=(1 << 16) - 1),
    )
    def test_interleave_is_invertible(self, x, y):
        """zorder_key is a bijection on [0,2^16)² — deinterleaving the
        bits recovers exactly (x, y)."""
        from pyspark.sql import functions as F

        from unitdb_spark.operators.zorder import zorder_key

        # evaluate the Column against a literal row without a Spark job
        # per example: build once per test call (hypothesis batches)
        import pyspark.sql as pssql

        spark = pssql.SparkSession.getActiveSession()
        z = spark.range(1).select(
            zorder_key(F.lit(x), F.lit(y)).alias("z")
        ).first()["z"]
        gx = gy = 0
        for i in range(16):
            gx |= ((z >> (2 * i)) & 1) << i
            gy |= ((z >> (2 * i + 1)) & 1) << i
        assert (gx, gy) == (x, y)


class TestWeightedSampleProperty:
    @settings(max_examples=6, deadline=None)
    @given(
        weights=st.lists(st.integers(min_value=1, max_value=1000),
                         min_size=5, max_size=25),
    )
    def test_selected_row_survives_weight_increase(self, spark, weights):
        """ES monotonicity: raising a selected row's weight can only
        shrink its race key — it must stay selected."""
        from unitdb_spark.operators.sampling import weighted_sample

        rows = [(i, w) for i, w in enumerate(weights)]
        df = spark.createDataFrame(rows, "id long, w long")
        n = max(1, len(rows) // 3)
        sel = weighted_sample(df, n=n, weight_col="w", key_col="id").collect()
        boosted_id = sel[0]["id"]
        rows2 = [(i, w * 10 if i == boosted_id else w) for i, w in rows]
        df2 = spark.createDataFrame(rows2, "id long, w long")
        sel2 = {r["id"] for r in
                weighted_sample(df2, n=n, weight_col="w", key_col="id").collect()}
        assert boosted_id in sel2

    @settings(max_examples=4, deadline=None)
    @given(weights=st.lists(st.integers(min_value=1, max_value=50),
                            min_size=3, max_size=10))
    def test_full_sample_returns_everything(self, spark, weights):
        from unitdb_spark.operators.sampling import weighted_sample

        df = spark.createDataFrame(
            [(i, w) for i, w in enumerate(weights)], "id long, w long"
        )
        got = weighted_sample(df, n=len(weights) + 5, weight_col="w",
                              key_col="id").count()
        assert got == len(weights)


class TestCharEntropyProperty:
    @settings(max_examples=10, deadline=None)
    @given(text=st.text(alphabet="abcdef ", min_size=1, max_size=60))
    def test_matches_python_model(self, spark, text):
        from collections import Counter

        from unitdb_spark.functions.exactlog import ulog10_micro_py as u
        from unitdb_spark.functions.text import char_entropy

        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        got = char_entropy(docs).collect()[0]
        counts = Counter(text)
        n = len(text)
        model = sum(c * (u(n) - u(c)) for c in counts.values()) // n
        assert got["n_unique"] == len(counts)
        assert got["h_micro"] == model


class TestMannWhitneyProperty:
    @settings(max_examples=10, deadline=None)
    @given(
        vals=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=8),  # forced ties
                st.integers(min_value=0, max_value=1),
            ),
            min_size=4, max_size=30,
        ).filter(
            lambda xs: len({a for _, a in xs}) == 2
        )
    )
    def test_u_matches_midrank_model(self, spark, vals):
        from pyspark.sql import functions as F

        from unitdb_spark.operators.stats_tests import mann_whitney_u

        df = spark.createDataFrame(
            [(float(v), a) for v, a in vals], "v double, arm int"
        )
        (out,) = mann_whitney_u(df, "v", F.col("arm")).collect()

        # independent midrank model
        sv = sorted(v for v, _ in vals)
        def midrank(v):
            lo = sv.index(v)
            hi = lo + sv.count(v) - 1
            return (lo + hi) / 2 + 1
        ra = sum(midrank(v) for v, a in vals if a == 0)
        na = sum(1 for _, a in vals if a == 0)
        u_a = ra - na * (na + 1) / 2
        assert out["u_a2"] == int(round(2 * u_a))
        # U_A + U_B = n_a * n_b (fundamental identity)
        nb = len(vals) - na
        rb = sum(midrank(v) for v, a in vals if a == 1)
        u_b = rb - nb * (nb + 1) / 2
        assert int(round(2 * u_a + 2 * u_b)) == 2 * na * nb


class TestKsProperty:
    @settings(max_examples=10, deadline=None)
    @given(
        vals=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=10),
                st.integers(min_value=0, max_value=1),
            ),
            min_size=4, max_size=30,
        ).filter(
            lambda xs: {a for _, a in xs} == {0, 1}
        )
    )
    def test_d_matches_ecdf_model(self, spark, vals):
        from pyspark.sql import functions as F

        from unitdb_spark.operators.stats_tests import ks_two_sample

        df = spark.createDataFrame(
            [(float(v), a) for v, a in vals], "v double, arm int"
        )
        (out,) = ks_two_sample(df, "v", F.col("arm")).collect()

        a = sorted(v for v, x in vals if x == 0)
        b = sorted(v for v, x in vals if x == 1)
        na, nb = len(a), len(b)
        support = sorted({v for v, _ in vals})
        want = max(
            abs(sum(1 for x in a if x <= t) * nb
                - sum(1 for x in b if x <= t) * na)
            for t in support
        )
        assert out["d_scaled"] == want


class TestGiniProperty:
    @settings(max_examples=10, deadline=None)
    @given(
        vals=st.lists(
            st.integers(min_value=0, max_value=500),
            min_size=2, max_size=25,
        ).filter(lambda xs: sum(xs) > 0)
    )
    def test_gini_matches_pairwise_model(self, spark, vals):
        from unitdb_spark.operators.profile import gini_by_group

        df = spark.createDataFrame(
            [("g", v / 100.0) for v in vals], "g string, v double"
        )
        (r,) = gini_by_group(df, "g", "v").collect()
        # mean-absolute-difference formulation:
        # G = sum_ij |xi - xj| / (2 n sum(x))
        n, s = len(vals), sum(vals)
        mad = sum(abs(x - y) for x in vals for y in vals)
        want = mad * 1_000_000 // (2 * n * s)
        assert abs(r["gini_ppm"] - want) <= 1  # floor-vs-floor slack


class TestQuantileMapProperty:
    @settings(max_examples=8, deadline=None)
    @given(
        avals=st.lists(st.integers(min_value=0, max_value=50),
                       min_size=2, max_size=15),
        rvals=st.lists(st.integers(min_value=0, max_value=50),
                       min_size=2, max_size=20),
    )
    def test_mapping_is_monotone_and_in_ref_range(self, spark, avals, rvals):
        from unitdb_spark.operators.olap import quantile_map

        a = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(avals)], "id int, v double"
        )
        ref = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(rvals)], "id int, v double"
        )
        out = quantile_map(a, "id", "v", ref, "v").collect()
        assert len(out) == len(avals)
        lo, hi = min(rvals), max(rvals)
        for r in out:
            assert lo <= r["mapped"] <= hi
        # monotone: a larger input value never maps LOWER
        by_val = sorted(out, key=lambda r: (r["value"], r["mapped"]))
        for p, q in zip(by_val, by_val[1:]):
            if q["value"] > p["value"]:
                assert q["mapped"] >= p["mapped"]


class TestModularityProperty:
    @settings(max_examples=8, deadline=None)
    @given(
        edges=st.lists(
            st.tuples(st.integers(min_value=1, max_value=8),
                      st.integers(min_value=1, max_value=8)),
            min_size=1, max_size=15,
        ).map(lambda es: sorted({(min(a, b), max(a, b))
                                 for a, b in es if a != b}))
         .filter(lambda es: len(es) >= 1),
        split=st.integers(min_value=1, max_value=8),
    )
    def test_q_matches_float_model(self, spark, edges, split):
        from unitdb_spark.operators.graph import modularity

        e = spark.createDataFrame(edges, "id_a long, id_b long")
        nodes = sorted({n for ab in edges for n in ab})
        assign = spark.createDataFrame(
            [(n, 0 if n <= split else 1) for n in nodes],
            "node long, comm long",
        )
        rows = modularity(e, assign).collect()
        q_micro = rows[0]["q_micro"]

        # independent float model
        m = len(edges)
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        comm = {n: (0 if n <= split else 1) for n in nodes}
        q = 0.0
        for c in set(comm.values()):
            e_c = sum(1 for a, b in edges if comm[a] == c and comm[b] == c)
            d_c = sum(d for n, d in deg.items() if comm[n] == c)
            q += e_c / m - (d_c / (2 * m)) ** 2
        # per-community floors bias by < n_communities micro
        assert abs(q_micro - q * 1_000_000) <= len(set(comm.values())) + 1


class TestSkylineProperty:
    @given(
        pts=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=30),
                st.integers(min_value=0, max_value=10),
            ),
            min_size=1,
            max_size=25,
        ),
        width=st.sampled_from([1, 3, 1000]),
    )
    @settings(max_examples=12, deadline=None)
    def test_matches_quadratic_model(self, spark, pts, width):
        """skyline2d == the NOT EXISTS dominance model for every
        random point set and any bucket width (incl. duplicates and
        full-tie columns)."""
        from unitdb_spark.operators.skyline import skyline2d

        rows = [(k, a, b) for k, (a, b) in enumerate(pts)]
        df = spark.createDataFrame(rows, "id long, a long, b int")
        got = {r.id for r in skyline2d(df, "a", "b", bucket_width=width).collect()}
        want = {
            k
            for (k, a, b) in rows
            if not any(
                a2 <= a and b2 >= b and (a2 < a or b2 > b)
                for (_, a2, b2) in rows
            )
        }
        assert got == want


class TestMarkovProperty:
    @given(
        seqs=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),   # key
                st.sampled_from("abc"),                  # state
            ),
            min_size=1,
            max_size=30,
        )
    )
    @settings(max_examples=12, deadline=None)
    def test_counts_match_model(self, spark, seqs):
        """Transition counts == the per-key adjacent-pair model under
        the (ts, tiebreak) total order (ts = list index here)."""
        from unitdb_spark.operators.markov import transition_counts

        rows = [(k, i, s) for i, (k, s) in enumerate(seqs)]
        df = spark.createDataFrame(rows, "k long, ts long, s string")
        got = {
            (r.src, r.dst): r.n
            for r in transition_counts(df, "k", "s", "ts", "ts").collect()
        }
        want: dict = {}
        per_key: dict = {}
        for k, i, s in rows:
            per_key.setdefault(k, []).append((i, s))
        for k, evs in per_key.items():
            evs.sort()
            for (_, a), (_, b) in zip(evs, evs[1:]):
                want[(a, b)] = want.get((a, b), 0) + 1
        assert got == want


class TestTemperatureAllocationProperty:
    @given(
        counts=st.lists(
            st.integers(min_value=1, max_value=10**12),
            min_size=1,
            max_size=8,
        ),
        budget=st.integers(min_value=0, max_value=10**9),
    )
    @settings(max_examples=10, deadline=None)
    def test_allocations_sum_exactly_and_follow_isqrt(self, spark, counts, budget):
        """Largest-remainder invariants: Σalloc == budget exactly;
        every w is the true isqrt; allocation order follows weight
        order (monotone apportionment)."""
        import math

        from unitdb_spark.operators.mixture import temperature_allocation

        rows = [(f"s{i}", c) for i, c in enumerate(counts)]
        df = spark.createDataFrame(rows, "src string, tok long")
        out = {
            r.source: r
            for r in temperature_allocation(df, "src", "tok", budget).collect()
        }
        assert sum(r.alloc for r in out.values()) == budget
        for i, c in enumerate(counts):
            assert out[f"s{i}"].w == math.isqrt(c)
        # monotone: a strictly larger weight never gets a smaller alloc
        rs = sorted(out.values(), key=lambda r: r.w)
        for a, b in zip(rs, rs[1:]):
            if b.w > a.w:
                assert b.alloc >= a.alloc


# hourly count series per key: list of (hour offset, count>=1)
_count_series = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=80),
        st.integers(min_value=1, max_value=9),
    ),
    min_size=2,
    max_size=30,
).map(dict)  # dedupe hour offsets, keep last count


def _series_rows(hours: dict, key="s"):
    rows = []
    for h, n in hours.items():
        for i in range(n):
            rows.append((key, T0 + dt.timedelta(hours=h, minutes=i)))
    return rows


class TestLjungBoxProperties:
    @given(series=_count_series)
    @settings(max_examples=12, deadline=None)
    def test_matches_model_on_random_series(self, spark, series):
        from decimal import Decimal

        from unitdb_spark.operators.stats_tests import (
            LB_CRIT_MICRO,
            ljung_box,
        )

        df = spark.createDataFrame(
            _series_rows(series), "event_type string, ts timestamp"
        )
        got = ljung_box(df, "event_type").collect()

        mn, mx = min(series), max(series)
        xs = [series.get(h, 0) for h in range(mn, mx + 1)]
        n, s = len(xs), sum(xs)
        c = [n * x - s for x in xs]
        den = sum(v * v for v in c)
        if den == 0:
            assert got == []
            return
        total, dof = Decimal(0), 0
        for k in range(1, min(12, n - 1) + 1):
            num = sum(c[t] * c[t + k] for t in range(n - k))
            rho = num / den
            total += Decimal(str(round(rho * rho / (n - k), 6)))
            dof += 1
        qm = int(n * (n + 2) * total * 1_000_000)
        assert [tuple(r) for r in got] == [
            ("s", n, dof, qm, qm > LB_CRIT_MICRO[dof - 1])
        ]


class TestEwmaChartProperties:
    @given(series=_count_series)
    @settings(max_examples=12, deadline=None)
    def test_matches_model_on_random_series(self, spark, series):
        from unitdb_spark.operators.timeseries import ewma_control

        df = spark.createDataFrame(
            _series_rows(series), "event_type string, ts timestamp"
        )
        got = sorted(tuple(r) for r in ewma_control(df, "event_type").collect())

        mn, mx = min(series), max(series)
        ys = [series.get(h, 0) for h in range(mn, mx + 1)]
        n, s = len(ys), sum(ys)
        ss = sum(y * y for y in ys)
        rhs = 9 * (n * ss - s * s) * 10**12
        z, want = (s * 10**6) // n, []
        for i in range(1, n):
            z = (ys[i] * 10**6 + 7 * z) // 8
            dlt = z * n - s * 10**6
            if dlt * dlt * 15 > rhs:
                h_epoch = int(
                    (T0 + dt.timedelta(hours=mn + i))
                    .replace(tzinfo=dt.timezone.utc).timestamp()
                )
                want.append(("s", h_epoch, ys[i], z, 1 if dlt > 0 else -1))
        assert got == sorted(want)


class TestFanoProperties:
    @given(series=_count_series)
    @settings(max_examples=12, deadline=None)
    def test_matches_model_on_random_series(self, spark, series):
        from unitdb_spark.operators.timeseries import fano_factor

        df = spark.createDataFrame(
            _series_rows(series), "event_type string, ts timestamp"
        )
        (r,) = fano_factor(df, "event_type").collect()
        mn, mx = min(series), max(series)
        ys = [series.get(h, 0) for h in range(mn, mx + 1)]
        n, s = len(ys), sum(ys)
        ss = sum(y * y for y in ys)
        fano = (n * ss - s * s) / (n * s)
        zz = (fano - 1.0) * math.sqrt((n - 1) / 2.0)
        assert (r.n, r.fano_r, r.z_r) == (n, round(fano, 6), round(zz, 6))
        assert r.overdispersed == (round(zz, 6) > 1.644854)


class TestPermutationTestProperties:
    @given(
        data=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=500),
                st.integers(min_value=0, max_value=1),
            ),
            min_size=4,
            max_size=25,
        ).filter(lambda xs: len({a for _, a in xs}) == 2)
    )
    @settings(max_examples=10, deadline=None)
    def test_matches_model_on_random_units(self, spark, data):
        import hashlib

        from unitdb_spark.operators.stats_tests import permutation_test

        rows = [(f"u{i}", v, a) for i, (v, a) in enumerate(data)]
        df = spark.createDataFrame(rows, "uid string, v long, arm int")
        (r,) = permutation_test(df, "v", "arm", "uid", n_perm=29).collect()

        def h60(sx):
            return int(hashlib.md5(sx.encode()).hexdigest()[:15], 16)

        n_a = sum(1 for _, _, a in rows if a == 0)
        n_b = len(rows) - n_a
        s_a = sum(v for _, v, a in rows if a == 0)
        s_b = sum(v for _, v, a in rows if a == 1)
        obs = abs(s_a * n_b - s_b * n_a)
        used = exceed = 0
        for rr in range(1, 30):
            s1 = n1 = s2 = n2 = 0
            for u, v, _ in rows:
                if h60(f"{rr}:{u}:perm") % 2 == 0:
                    s1 += v; n1 += 1
                else:
                    s2 += v; n2 += 1
            if n1 and n2:
                used += 1
                if abs(s1 * n2 - s2 * n1) * (n_a * n_b) >= obs * (n1 * n2):
                    exceed += 1
        q = s_a * n_b - s_b * n_a
        diff = (1 if q >= 0 else -1) * (abs(q) * 1000 // (n_a * n_b))
        assert tuple(r) == (
            n_a, n_b, diff, used, exceed,
            (1 + exceed) * 1_000_000 // (used + 1),
        )


class TestWilcoxonProperty:
    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-50, max_value=50), min_size=1, max_size=40
        )
    )
    def test_rank_sums_match_midrank_model(self, spark, diffs):
        from unitdb_spark.operators.stats_tests import wilcoxon_signed_rank

        df = spark.createDataFrame([(d,) for d in diffs], "d long")
        (r,) = wilcoxon_signed_rank(df, "d").collect()
        nz = [d for d in diffs if d != 0]
        # doubled midranks of |d| over the nonzero diffs
        from collections import Counter

        cnt = Counter(abs(d) for d in nz)
        rank2, below = {}, 0
        for a in sorted(cnt):
            rank2[a] = 2 * below + cnt[a] + 1
            below += cnt[a]
        wp2 = sum(rank2[abs(d)] for d in nz if d > 0)
        wm2 = sum(rank2[abs(d)] for d in nz if d < 0)
        n = len(nz)
        assert r.n == n
        assert r.w_plus2 == wp2 and r.w_minus2 == wm2
        assert r.w_plus2 + r.w_minus2 == n * (n + 1)


class TestMutualTopProperty:
    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=9),
                st.integers(min_value=0, max_value=9),
                st.integers(min_value=1, max_value=5),
            ),
            min_size=1,
            max_size=30,
        ),
        st.integers(min_value=1, max_value=4),
    )
    def test_degree_bound_symmetry_subset(self, spark, raw, d_cap):
        from pyspark.sql import functions as F

        from unitdb_spark.operators.graph import mutual_top_neighbors

        und = {(min(a, b), max(a, b)): w for a, b, w in raw if a != b}
        if not und:
            return
        rows = [(a, b, w) for (a, b), w in und.items()]
        e = spark.createDataFrame(rows, ["src", "dst", "w"])
        sym = e.unionAll(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        )
        out = mutual_top_neighbors(sym, max_degree=d_cap).collect()
        got = {(r.src, r.dst) for r in out}
        inp = {(r.src, r.dst) for r in sym.collect()}
        # subset of the input, symmetric, degree bounded by the cap
        assert got <= inp
        assert all((b, a) in got for a, b in got)
        from collections import Counter

        deg = Counter(a for a, _ in got)
        assert all(c <= d_cap for c in deg.values())
        # model: mutual top-d_cap by (w DESC, dst ASC)
        adj = {}
        for r in sym.collect():
            adj.setdefault(r.src, []).append((-r.w, r.dst))
        keep = {
            (s, d)
            for s, lst in adj.items()
            for _, d in sorted(lst)[:d_cap]
        }
        want = {(s, d) for (s, d) in keep if (d, s) in keep}
        assert got == want


class TestKruskalProperty:
    @settings(max_examples=8, deadline=None)
    @given(
        vals=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=6),  # forced ties
                st.integers(min_value=0, max_value=2),  # 3 groups
            ),
            min_size=6, max_size=30,
        ).filter(lambda xs: len({g for _, g in xs}) >= 2)
    )
    def test_h_micro_matches_midrank_model(self, spark, vals):
        from pyspark.sql import functions as F

        from unitdb_spark.operators.stats_tests import kruskal_wallis

        df = spark.createDataFrame(
            [(float(v), str(g)) for v, g in vals], "v double, g string"
        )
        (out,) = kruskal_wallis(df, "v", F.col("g")).collect()

        sv = sorted(v for v, _ in vals)

        def midrank(v):
            lo = sv.index(v)
            hi = lo + sv.count(v) - 1
            return (lo + hi) / 2 + 1

        n = len(vals)
        h_micro = 0
        for g in sorted({g for _, g in vals}):
            grp = [v for v, gg in vals if gg == g]
            r_j2 = int(round(sum(2 * midrank(v) for v in grp)))
            h_micro += (r_j2 * r_j2 * 1_000_000) // (
                4 * len(grp) * n * (n + 1)
            )
        h_micro = 12 * h_micro - 3 * (n + 1) * 1_000_000
        assert out.h_micro == h_micro
        # tie-corrected h_r is NULL iff every value ties
        all_tied = len(set(v for v, _ in vals)) == 1
        assert (out.h_r is None) == all_tied


class TestAucProperty:
    @settings(max_examples=8, deadline=None)
    @given(
        vals=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=5),
                st.booleans(),
            ),
            min_size=4, max_size=30,
        ).filter(lambda xs: len({y for _, y in xs}) == 2)
    )
    def test_complement_identity_and_pair_model(self, spark, vals):
        """AUC(score, y) + AUC(score, not y) prices every pair once:
        u2(y) + u2(!y) = 2·n_pos·n_neg exactly."""
        from unitdb_spark.operators.evaluation import auc_from_scores

        df = spark.createDataFrame(
            [(v / 10.0, y) for v, y in vals], "score double, y boolean"
        )
        (a,) = auc_from_scores(df, "score", "y").collect()
        df2 = spark.createDataFrame(
            [(v / 10.0, not y) for v, y in vals],
            "score double, y boolean",
        )
        (b,) = auc_from_scores(df2, "score", "y").collect()
        assert a.n_pos == b.n_neg and a.n_neg == b.n_pos
        assert a.u_pos2 + b.u_pos2 == 2 * a.n_pos * a.n_neg
        # pairwise model
        pos = [v for v, y in vals if y]
        neg = [v for v, y in vals if not y]
        u2 = sum(
            2 if p > q else (1 if p == q else 0)
            for p in pos for q in neg
        )
        assert a.u_pos2 == u2


class TestKendallProperty:
    @settings(max_examples=8, deadline=None)
    @given(
        xs=st.lists(st.integers(min_value=0, max_value=5),
                    min_size=3, max_size=15),
        ys=st.lists(st.integers(min_value=0, max_value=5),
                    min_size=3, max_size=15),
    )
    def test_negation_antisymmetry(self, spark, xs, ys):
        """tau_b(x, -y) = -tau_b(x, y): negating one variable swaps
        concordant and discordant exactly, tie counts unchanged."""
        from unitdb_spark.operators.stats_tests import kendall_tau_b

        n = min(len(xs), len(ys))
        rows = [("k", t, xs[t], ys[t]) for t in range(n)]
        neg = [("k", t, xs[t], -ys[t]) for t in range(n)]
        df = spark.createDataFrame(rows, "g string, t int, x long, y long")
        dfn = spark.createDataFrame(neg, "g string, t int, x long, y long")
        (a,) = kendall_tau_b(df, "g", "x", "y", "t").collect()
        (b,) = kendall_tau_b(dfn, "g", "x", "y", "t").collect()
        assert (a.n_c, a.n_d) == (b.n_d, b.n_c)
        assert (a.tie_x, a.tie_y) == (b.tie_x, b.tie_y)
        if a.tau_r is not None:
            assert abs(a.tau_r + b.tau_r) < 1e-9
        else:
            assert b.tau_r is None


class TestRankThresholdDecilesProperty:
    """The mergeable decile contract vs a pure-Python ntile model:
    on TIE-FREE data the ranked path must equal ntile exactly for any
    (N, n_bins); with ties, every tie group must land whole in the
    bin of its last row under the exact thresholds."""

    @settings(max_examples=15, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=60),
        nb=st.sampled_from([2, 3, 5, 10]),
        seed=st.integers(min_value=0, max_value=10**6),
    )
    def test_tie_free_equals_python_ntile(self, spark, n, nb, seed):
        from unitdb_spark.operators.evaluation import cumulative_gains_ranked

        # distinct scores via an affine map; labels pseudo-random
        rows = [
            (i, 10_000 - 17 * i, (i * 7 + seed) % 3 == 0)
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "id int, sm long, y boolean")
        out = {
            r.bin: r
            for r in cumulative_gains_ranked(df, "sm", "y", n_bins=nb)
            .collect()
        }
        # python ntile model: first (n % nb) bins get ceil(n/nb) rows
        ordered = sorted(rows, key=lambda r: (-r[1], r[0]))
        q, rem = divmod(n, nb)
        sizes = [q + 1 if b < rem else q for b in range(nb)]
        pos = 0
        cum_n = cum_pos = 0
        total_pos = sum(1 for r in rows if r[2])
        for b in range(1, nb + 1):
            chunk = ordered[pos: pos + sizes[b - 1]]
            pos += sizes[b - 1]
            cum_n += len(chunk)
            cum_pos += sum(1 for r in chunk if r[2])
            assert out[b].n == len(chunk)
            assert out[b].cum_n == cum_n and out[b].cum_pos == cum_pos
            if total_pos > 0:
                assert out[b].gain_ppm == (cum_pos * 1_000_000) // total_pos

    @settings(max_examples=10, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=50),
        nb=st.sampled_from([3, 5, 10]),
        card=st.integers(min_value=1, max_value=6),
        seed=st.integers(min_value=0, max_value=10**6),
    )
    def test_ties_land_whole_at_last_row_threshold(
        self, spark, n, nb, card, seed
    ):
        from unitdb_spark.operators.evaluation import cumulative_gains_ranked

        rows = [
            (i, (i * 13 + seed) % card, (i + seed) % 2 == 0)
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "id int, sm long, y boolean")
        out = {
            r.bin: r
            for r in cumulative_gains_ranked(df, "sm", "y", n_bins=nb)
            .collect()
        }
        # python model: group by score desc, assign whole group to the
        # bin of its last row under T_b = b*q + min(b, r)
        from collections import Counter

        counts = Counter(r[1] for r in rows)
        pos_by_s = Counter(r[1] for r in rows if r[2])
        q, rem = divmod(n, nb)
        thresholds = [b * q + min(b, rem) for b in range(1, nb + 1)]
        want_n = {b: 0 for b in range(1, nb + 1)}
        want_pos = {b: 0 for b in range(1, nb + 1)}
        cum = 0
        for s in sorted(counts, reverse=True):
            cum += counts[s]
            b = next(i + 1 for i, t in enumerate(thresholds) if t >= cum)
            want_n[b] += counts[s]
            want_pos[b] += pos_by_s.get(s, 0)
        assert len(out) == nb
        for b in range(1, nb + 1):
            assert out[b].n == want_n[b]
            assert out[b].n_pos == want_pos[b]


class TestMuLawHypothesis:
    def test_random_batches_roundtrip_properties(self):
        """Hypothesis-style random batches: decode(encode(x)) stays
        within the segment half-step, and encoding is scale-monotone
        (louder in, louder-or-equal code magnitude out)."""
        import numpy as np

        from unitdb_spark.functions.media_codec import (
            pcm16_to_ulaw,
            ulaw_to_pcm16,
        )

        rng = np.random.default_rng(23)
        for _ in range(20):
            s = rng.integers(-32768, 32768, 512).astype(np.int64)
            dec = ulaw_to_pcm16(pcm16_to_ulaw(s))
            assert (np.sign(dec) == np.sign(np.where(
                np.abs(s) < 4, dec, s))).all()  # tiny values may quantize to 0
            # relative error bounded: mu-law's design constraint
            big = np.abs(s) > 1024
            if big.any():
                rel = np.abs(dec[big] - s[big]) / np.abs(s[big])
                assert rel.max() < 0.06


class TestAdam7Hypothesis:
    def test_random_dims_roundtrip(self):
        import numpy as np

        from unitdb_spark.functions.media_codec import (
            adam7_scanline_count,
            decode_png_rgb_any,
            encode_png_rgb_adam7,
        )

        rng = np.random.default_rng(29)
        for _ in range(15):
            h = int(rng.integers(1, 40))
            w = int(rng.integers(1, 40))
            arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            filters = [
                int(rng.integers(0, 5))
                for _ in range(adam7_scanline_count(w, h))
            ]
            back = decode_png_rgb_any(encode_png_rgb_adam7(arr, filters))
            assert back is not None and (back == arr).all(), (h, w)


class TestExactLogProperty:
    """Properties of the engine-proof fixed-point log10 (exactlog.py)."""

    @given(st.integers(min_value=1, max_value=10**18 - 1))
    @settings(max_examples=300, deadline=None)
    def test_tracks_true_log_within_one_micro(self, x):
        from unitdb_spark.functions.exactlog import ulog10_micro_py

        u = ulog10_micro_py(x)
        assert abs(u - math.floor(1e6 * math.log10(x))) <= 1

    @given(st.integers(min_value=1, max_value=10**18 - 1))
    @settings(max_examples=300, deadline=None)
    def test_monotone_and_exact_on_powers(self, x):
        from unitdb_spark.functions.exactlog import ulog10_micro_py

        u = ulog10_micro_py(x)
        assert ulog10_micro_py(x + 1) >= u  # monotone nondecreasing
        k = len(str(x)) - 1
        assert u // 1000000 == k  # characteristic is the digit count
        assert ulog10_micro_py(10**k) == k * 1000000  # exact on powers

    @given(
        st.lists(
            st.integers(min_value=1, max_value=10**12),
            min_size=2,
            max_size=12,
        )
    )
    @settings(max_examples=60, deadline=None)
    def test_duckdb_program_twins_python(self, xs):
        """The DuckDB layer chain returns the identical integers —
        determinism across engines is the whole point (the Spark twin
        is pinned by the doc_heaps / source_token_entropy oracles)."""
        import duckdb

        from unitdb_spark.functions.exactlog import (
            ulog10_micro_py,
            ulog10_wrap_sql,
        )

        con = duckdb.connect()
        vals = ",".join(f"({x})" for x in xs)
        sql = ulog10_wrap_sql(
            f"SELECT CAST(x AS BIGINT) AS x FROM (VALUES {vals}) v(x)",
            {"ux": "x"},
            ["x"],
        )
        for x, u in con.execute(sql).fetchall():
            assert u == ulog10_micro_py(x)

    @example(a=-2_049_870_775, b=97_612_894)  # r10 judge: INT32 edge —
    # bare DuckDB literals typed INT32 made the identity's subtraction
    # overflow-raise before floordiv_sql widened operands internally.
    @given(
        st.integers(min_value=-(10**15), max_value=10**15),
        st.integers(min_value=1, max_value=10**9),
    )
    @settings(max_examples=200, deadline=None)
    def test_floordiv_identity_matches_python(self, a, b):
        """The shared nonneg-mod floor identity == Python's //
        (which floors natively) for signed numerators."""
        import duckdb

        from unitdb_spark.functions.exactlog import floordiv_sql

        con = duckdb.connect()
        expr = floordiv_sql(str(a), str(b), "duckdb")
        (got,) = con.execute(f"SELECT {expr}").fetchone()
        assert got == a // b

    @given(
        st.integers(min_value=-(2**63) + 1, max_value=2**63 - 1),
        st.integers(min_value=1, max_value=2**62),
    )
    @settings(max_examples=200, deadline=None)
    def test_floordiv_total_over_bigint(self, a, b):
        """floordiv_sql is TOTAL over the full BIGINT domain in both
        dialects (the internal HUGEINT/DECIMAL(38,0) widening): no
        literal-typing overflow anywhere, and the Spark dialect's
        rendered program computes the same floor (checked by running
        the Spark-dialect text through DuckDB with the dialect tokens
        mapped, since the expression tree is engine-agnostic)."""
        import duckdb

        from unitdb_spark.functions.exactlog import floordiv_sql

        con = duckdb.connect()
        expr = floordiv_sql(str(a), str(b), "duckdb")
        (got,) = con.execute(f"SELECT {expr}").fetchone()
        assert got == a // b
        spark_text = floordiv_sql(str(a), str(b), "spark")
        assert "DECIMAL(38,0)" in spark_text and " div " in spark_text


class TestJpegBitReaderEquivalence:
    """The round-10 pooled `_JpegBitReader` must be observationally
    identical to the original `_BitReader` on arbitrary byte streams
    (stuffed 0xFF00, real markers, truncation) for the operations the
    JPEG decoders use — bit-exact reads, None-at-marker, p at the
    terminating 0xFF, align semantics."""

    @settings(max_examples=200, deadline=None)
    @given(
        data=st.binary(min_size=0, max_size=64),
        ops=st.lists(
            st.one_of(
                st.just(("bit",)),
                st.tuples(st.just("bits"), st.integers(0, 16)),
                st.just(("align",)),
            ),
            min_size=1,
            max_size=40,
        ),
    )
    def test_read_sequence_matches(self, data, ops):
        from unitdb_spark.functions.media_codec import (
            _BitReader,
            _JpegBitReader,
        )

        a = _BitReader(data, 0)
        b = _JpegBitReader(data, 0)
        dead = False
        for op in ops:
            if op[0] == "bit":
                ra, rb = a.read_bit(), b.read_bit()
            elif op[0] == "bits":
                ra, rb = a.read_bits(op[1]), b.read_bits(op[1])
            else:
                a.align()
                b.align()
                continue
            assert ra == rb, (data.hex(), op, ra, rb)
            if ra is None:
                dead = True
                break
        if not dead:
            # p agrees at alignment points (the only places the
            # decoders read it mid-stream)
            a.align()
            b.align()
            # original's p lags until the next fetch; fetch one bit
            ra, rb = a.read_bit(), b.read_bit()
            assert ra == rb
            if ra is not None:
                assert a.p == b.p, (data.hex(), a.p, b.p)

    @settings(max_examples=100, deadline=None)
    @given(data=st.binary(min_size=2, max_size=64))
    def test_p_rests_on_marker_after_exhaustion(self, data):
        from unitdb_spark.functions.media_codec import (
            _BitReader,
            _JpegBitReader,
        )

        a = _BitReader(data, 0)
        b = _JpegBitReader(data, 0)
        while True:
            ra, rb = a.read_bit(), b.read_bit()
            assert ra == rb
            if ra is None:
                break
        assert a.p == b.p, (data.hex(), a.p, b.p)

    @settings(max_examples=100, deadline=None)
    @given(
        counts_seed=st.integers(0, 2**31 - 1),
        nbits=st.integers(1, 64),
    )
    def test_read_huff_matches_dict_walk(self, counts_seed, nbits):
        """Canonical-range read_huff == the per-bit dict walk on the
        repo's fixed-length JPEG tables over random bit pools."""
        import random

        from unitdb_spark.functions.media_codec import (
            _JPEG_AC_SYMBOLS,
            _JPEG_DC_SYMBOLS,
            _JpegBitReader,
            _huff_decode_table,
            _huff_fixed,
        )

        rng = random.Random(counts_seed)
        data = bytes(rng.randrange(0xFE) for _ in range((nbits + 7) // 8))
        for syms, length in ((_JPEG_DC_SYMBOLS, 4), (_JPEG_AC_SYMBOLS, 8)):
            counts, symbols, _enc = _huff_fixed(syms, length)
            table = _huff_decode_table(counts, symbols)
            fast = _JpegBitReader(data, 0)
            slow = _JpegBitReader(data, 0)
            # slow path: force the defensive plain-dict walk
            plain = dict(table)
            while True:
                rf = fast.read_huff(table)
                rs = slow.read_huff(plain)
                assert rf == rs
                if rf is None:
                    break
            assert fast._i == slow._i


class TestShapleyProperty:
    """shapley_attribution vs the TEXTBOOK 2^k enumeration, exact.

    The operator never enumerates subsets (the observed-masks split);
    this property proves the split equals Shapley's definition with
    v(unobserved)=0, including the truncating final division, on
    randomized touch/conversion patterns."""

    @staticmethod
    def _brute(touched: dict, converted: set, k_channels: list):
        from itertools import combinations
        from math import factorial

        # v(S) in exact ppm ints over EXACT-set coalitions
        groups: dict = {}
        for u, chans in touched.items():
            key = frozenset(chans)
            n, c = groups.get(key, (0, 0))
            groups[key] = (n + 1, c + (1 if u in converted else 0))
        v = {s: (c * 10**6) // n for s, (n, c) in groups.items()}
        k = len(k_channels)
        out = {}
        for i in k_channels:
            others = [c for c in k_channels if c != i]
            total = 0
            for r in range(k):
                for comb in combinations(others, r):
                    s = frozenset(comb)
                    dv = v.get(s | {i}, 0) - v.get(s, 0)
                    total += factorial(r) * factorial(k - r - 1) * dv
            # the operator's truncating div (both engines truncate)
            q = abs(total) // factorial(k)
            out[i] = q if total >= 0 else -q
        return out

    @given(st.data())
    @settings(max_examples=25, deadline=None)
    def test_matches_textbook_enumeration(self, spark, data):
        import datetime as dt

        from unitdb_spark.operators.funnel import shapley_attribution

        chans = data.draw(
            st.lists(
                st.sampled_from(["A", "B", "C", "D"]),
                min_size=1,
                max_size=4,
                unique=True,
            )
        )
        n_users = data.draw(st.integers(min_value=2, max_value=12))
        T = dt.datetime(2024, 1, 1)
        rows, touched, converted = [], {}, set()
        for u in range(n_users):
            sub = data.draw(
                st.lists(st.sampled_from(chans), max_size=4, unique=True)
            )
            conv = data.draw(st.booleans())
            touched[u] = set(sub)
            for j, c in enumerate(sub):
                rows.append((u, c, T + dt.timedelta(seconds=j)))
            if conv:
                converted.add(u)
                rows.append((u, "buy", T + dt.timedelta(seconds=100)))
        # the operator needs at least one touch overall
        if not any(touched.values()):
            touched[0] = {chans[0]}
            rows.append((0, chans[0], T))
        # a user with no events at all does not exist to the operator
        # (the coalition universe is users WITH data) — drop phantoms
        # from the model too
        present = {u for u, _, _ in rows}
        touched = {u: s for u, s in touched.items() if u in present}
        converted = {u for u in converted if u in present}
        observed = sorted({c for s in touched.values() for c in s})
        ev = spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp"
        )
        got = {
            r.channel: r.shapley_ppm
            for r in shapley_attribution(ev, "buy").collect()
        }
        want = self._brute(touched, converted, observed)
        assert got == want


class TestPadWasteProperty:
    @given(
        st.lists(st.integers(min_value=0, max_value=40), min_size=1,
                 max_size=60),
        st.integers(min_value=1, max_value=7),
    )
    @settings(max_examples=20, deadline=None)
    def test_sorted_never_pads_more_and_python_model_agrees(
        self, spark, lens, bsize
    ):
        from unitdb_spark.operators.packing import pad_waste

        df = spark.createDataFrame(
            [(i, " ".join(["w"] * ln)) for i, ln in enumerate(lens)],
            "doc_id long, text string",
        )
        rows = pad_waste(df, batch_size=bsize, n_shards=1).collect()
        by = {r.policy: r for r in rows}

        def model(order):
            padded = real = 0
            for b0 in range(0, len(order), bsize):
                batch = order[b0 : b0 + bsize]
                padded += max(batch) * len(batch)
                real += sum(batch)
            return real, padded

        real_a, padded_a = model(lens)
        real_s, padded_s = model(sorted(lens))
        assert (by["arrival"].real_tokens, by["arrival"].padded_tokens) == (
            real_a, padded_a,
        )
        assert (by["sorted"].real_tokens, by["sorted"].padded_tokens) == (
            real_s, padded_s,
        )
        # length-sorted consecutive batching never pads more than
        # arrival order WHEN EVERY BATCH IS FULL (exchange argument
        # over equal-size batches; ties allowed). With a ragged tail
        # the claim is FALSE: lens=[0,0,0,1,1,0], bsize=5 — arrival
        # pads 5 (both 1s land in the full batch), sorted pads 6
        # (sorting pushes a 1 into the size-1 tail batch, whose max
        # is weighted by its own length). pad_waste reports both
        # policies; which one wins on a ragged tail is data-dependent
        # and exactly the decision number the operator exists to
        # surface.
        if len(lens) % bsize == 0:
            assert padded_s <= padded_a
        # r13 (r12 advice): the guard above fires only when hypothesis
        # draws len(lens) % bsize == 0, leaving the property near-
        # vacuous for most cases — so ALSO exercise it on the prefix
        # truncated to a multiple of bsize, where every batch is full
        # and the exchange argument applies unconditionally.
        full = lens[: len(lens) // bsize * bsize]
        if full:
            _, padded_fa = model(full)
            _, padded_fs = model(sorted(full))
            assert padded_fs <= padded_fa


class TestRougeProperty:
    @given(st.data())
    @settings(max_examples=15, deadline=None)
    def test_bounds_and_direction_swap(self, spark, data):
        from collections import Counter

        from unitdb_spark.operators.evaluation import rouge_n_pairs

        words = ["a", "b", "c", "d"]
        ta = " ".join(data.draw(st.lists(st.sampled_from(words), min_size=2, max_size=30)))
        tb = " ".join(data.draw(st.lists(st.sampled_from(words), min_size=2, max_size=30)))
        docs = spark.createDataFrame(
            [(1, ta), (2, tb)], "doc_id long, text string"
        )
        pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        (r,) = rouge_n_pairs(docs, pairs, n=2).collect()

        def grams(t):
            tk = t.split()
            return Counter(
                " ".join(tk[i : i + 2]) for i in range(len(tk) - 1)
            )
        ga, gb = grams(ta), grams(tb)
        ov = sum(min(ga[g], gb[g]) for g in ga)
        assert r.overlap == ov
        assert r.n_grams_a == sum(ga.values()) and r.n_grams_b == sum(gb.values())
        assert 0 <= r.rouge_p_ppm <= 10**6 and 0 <= r.rouge_r_ppm <= 10**6
        # direction swap: precision against a == recall against b swapped
        pairs2 = spark.createDataFrame([(2, 1)], "id_a long, id_b long")
        (r2,) = rouge_n_pairs(docs, pairs2, n=2).collect()
        assert r2.rouge_p_ppm == r.rouge_r_ppm
        assert r2.rouge_r_ppm == r.rouge_p_ppm
        assert r2.overlap == r.overlap
