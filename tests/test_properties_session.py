"""Property-based tests for the round-4c analytics operators:
randomized inputs vs independent pure-Python models."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


_names = st.lists(
    st.text(alphabet="abcdef", min_size=3, max_size=8),
    min_size=2,
    max_size=6,
    unique=True,
)


class TestLinkRecordsProperty:
    @settings(max_examples=8, deadline=None)
    @given(names=_names, drop=st.integers(0, 7))
    def test_best_match_equals_python_model(self, spark, names, drop):
        from unitdb_spark.operators.linkage import link_records

        clean = [(i, n, "B") for i, n in enumerate(names)]
        # perturb each name by dropping one character (distance <= 1)
        dirty = [
            (100 + i, n[: drop % len(n)] + n[drop % len(n) + 1 :], "B")
            for i, n in enumerate(names)
        ]
        cdf = spark.createDataFrame(clean, ["rid", "name", "blk"])
        ldf = spark.createDataFrame(dirty, ["lid", "name", "blk"])
        got = {
            r.lid: (r.matched_id, r.distance)
            for r in link_records(
                ldf, cdf, ["blk"], "lid", "rid", "name", "name", 2
            ).collect()
        }
        for lid, dname, _ in dirty:
            dists = [(_lev(dname, n), i) for i, n, _ in clean]
            best = min(d for d, _ in dists)
            if best > 2:
                assert got[lid] == (None, None)
            else:
                want_rid = min(i for d, i in dists if d == best)
                assert got[lid] == (want_rid, best)


_buckets = st.lists(
    st.tuples(
        st.integers(1, 6),      # day
        st.integers(0, 3),      # hour
        st.integers(-50, 50),   # integer value (exactness trivially holds)
    ),
    min_size=1,
    max_size=25,
).map(lambda xs: sorted({(d, h): (d, h, v) for d, h, v in xs}.values()))


class TestSeasonalNaiveProperty:
    @settings(max_examples=8, deadline=None)
    @given(cells=_buckets)
    def test_matches_python_model(self, spark, cells):
        from unitdb_spark.operators.timeseries import seasonal_naive_backtest

        rows = [
            (i, dt.datetime(2024, 1, d, h, 0), "k", float(v))
            for i, (d, h, v) in enumerate(cells)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string, value double"
        )
        out = seasonal_naive_backtest(df).collect()
        # model: bucket means are the raw values (one event per cell);
        # score strict previous-day pairs per hour series
        mu = {(d, h): v * 1_000_000 for d, h, v in cells}
        errs = [
            mu[(d, h)] - mu[(d - 1, h)]
            for (d, h, _) in cells
            if (d - 1, h) in mu
        ]
        if not errs:
            assert out == []
        else:
            r = out[0]
            assert r.n_scored == len(errs)
            assert r.sum_ae_mu == sum(abs(e) for e in errs)
            assert r.sum_err_mu == sum(errs)
