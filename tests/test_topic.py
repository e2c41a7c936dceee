"""Pure-Python topic algebra tests.

The wildcard matrix is a port of the reference's hardest correctness
table (db_test.go:296-317) plus docs/usage.md:190-197 cases.
"""

from __future__ import annotations

import pytest

from unitdb_spark.core.topic import (
    InvalidTopicError,
    TopicKind,
    parse_duration,
    parse_topic,
    topic_match,
)


class TestParseDuration:
    @pytest.mark.parametrize(
        "text,seconds",
        [
            ("1h", 3600),
            ("30m", 1800),
            ("10s", 10),
            ("1h30m", 5400),
            ("500ms", 0.5),
            ("2d", 172800),
            ("1.5h", 5400),
        ],
    )
    def test_ok(self, text, seconds):
        assert parse_duration(text) == pytest.approx(seconds)

    @pytest.mark.parametrize("text", ["", "xx", "1", "h1", "1hh", "1h x"])
    def test_bad(self, text):
        with pytest.raises(ValueError):
            parse_duration(text)


class TestParseTopic:
    def test_static(self):
        s = parse_topic("teams.alpha.ch1")
        assert s.parts == ("teams", "alpha", "ch1")
        assert s.kind == TopicKind.STATIC
        assert s.depth == 3

    def test_options(self):
        s = parse_topic("unit1.test?ttl=1h&last=30m")
        assert s.raw == "unit1.test"
        assert s.ttl_seconds == 3600
        assert s.last_seconds == 1800

    def test_last_count(self):
        s = parse_topic("a.b?last=100")
        assert s.last_count == 100 and s.last_seconds is None

    def test_star(self):
        s = parse_topic("teams.*.ch1")
        assert s.kind == TopicKind.WILDCARD
        assert s.parts == ("teams", "*", "ch1")

    def test_tail(self):
        s = parse_topic("teams.alpha...")
        assert s.kind == TopicKind.WILDCARD_TAIL
        assert s.base_parts == ("teams", "alpha")
        assert s.has_tail

    def test_bare_tail(self):
        s = parse_topic("...")
        assert s.has_tail and s.base_parts == ()

    def test_bare_star(self):
        s = parse_topic("*")
        assert s.kind == TopicKind.WILDCARD

    @pytest.mark.parametrize(
        "bad",
        [
            "",  # empty
            "a..b",  # empty level
            "teams...userA",  # '...' mid-topic (docs/utp.md:199)
            "a.b...c",  # '...' not final
            "a.b*",  # '*' not a whole part
            "a." + ".".join(["x"] * 101),  # depth > 100
        ],
    )
    def test_invalid(self, bad):
        with pytest.raises(InvalidTopicError):
            parse_topic(bad)


# Port of db_test.go:296-308 symmetric matrix + docs/usage.md:190-197.
MATRIX = [
    # (stored/written, queried, expect)
    ("...", "unit.b.b1", True),
    ("unit.b...", "unit.b.b1.b11.b111.b1111.b11111.b111111", True),
    ("unit.*.b1.b11.*.*.b11111.*", "unit.b.b1.b11.b111.b1111.b11111.b111111", True),
    ("unit.*.b1.*.*.*.b11111.*", "unit.b.b1.b11.b111.b1111.b11111.b111111", True),
    ("unit.b.b1", "unit.b.b1", True),
    ("unit.b", "unit.b.b1", False),  # depth mismatch
    # reverse direction: concrete written, wildcard queried
    ("teams.alpha.ch1", "teams.alpha.*", True),
    ("teams.alpha.ch1", "teams...", True),
    ("teams.alpha.ch1", "*", False),  # single-level '*' vs depth-3
    ("teams", "*", True),
    ("teams.alpha.ch1", "...", True),
    ("teams.alpha.ch1.u1", "teams.*.ch1.u1", True),
    ("teams.alpha.ch1.u1", "teams.*.ch2.u1", False),
    ("teams.beta.ch1", "teams.alpha...", False),
    ("unit.b.b1", "unit.b...", True),
    ("unit.b", "unit.b...", True),  # '...' matches zero tail levels
]


class TestWildcardMatrix:
    @pytest.mark.parametrize("stored,query,expect", MATRIX)
    def test_symmetric(self, stored, query, expect):
        assert topic_match(stored, query) is expect
        assert topic_match(query, stored) is expect  # symmetry
