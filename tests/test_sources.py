"""Ingestion adapters: JSON/CSV/rate-stream → messages envelope."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from unitdb_spark.sources.adapters import (
    ENVELOPE_SCHEMA,
    invalid_rows,
    messages_from_csv,
    messages_from_json,
    messages_json_stream,
    synthetic_rate_stream,
)


def _write_ndjson(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    with open(path / "part-0.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


ROWS = [
    {"seq": 1, "topic": "a.b", "ts": "2024-01-01T00:00:00", "payload": "p1"},
    {"seq": 2, "topic": "a.c", "ts": "2024-01-01T00:00:01", "payload": "p2",
     "ttl_seconds": 60, "contract": 7},
    {"seq": 3, "topic": "bad topic!", "ts": "2024-01-01T00:00:02", "payload": "x"},
    {"seq": 4, "topic": "tail...", "ts": "2024-01-01T00:00:03", "payload": "p4"},
]


class TestJsonAdapter:
    def test_normalizes_and_validates(self, spark, tmp_path):
        _write_ndjson(tmp_path / "in", ROWS)
        df = messages_from_json(spark, str(tmp_path / "in"))
        rows = {r["seq"]: r for r in df.collect()}
        assert set(rows) == {1, 2, 4}          # invalid topic dropped
        assert rows[2]["contract"] == 7
        assert rows[2]["expires_at"] is not None and rows[1]["expires_at"] is None
        assert bytes(rows[1]["payload"]) == b"p1"
        assert rows[4]["has_tail"] is True     # write-side '...' preserved

    def test_quarantine_view(self, spark, tmp_path):
        _write_ndjson(tmp_path / "in", ROWS)
        raw = spark.read.schema(ENVELOPE_SCHEMA).json(str(tmp_path / "in"))
        assert [r["seq"] for r in invalid_rows(raw).collect()] == [3]

    def test_feeds_engine_get(self, spark, tmp_path):
        from unitdb_spark.engine import Engine

        _write_ndjson(tmp_path / "in", ROWS)
        eng = Engine.open(spark, str(tmp_path / "store"))
        df = messages_from_json(spark, str(tmp_path / "in"))
        eng.put_df(df.select("seq", "msg_id", "contract", "topic", "ts", "expires_at", "payload"))
        from unitdb_spark.core.model import Query

        t0 = 1704067200.0  # 2024-01-01 00:00:00 UTC
        # master contract sees only row 1 (row 2 is contract 7)
        assert eng.get("a.*", now=t0 + 100) == [b"p1"]
        # contract 7 sees row 2 while its 60s TTL is live...
        assert eng.get(Query("a.*", contract=7), now=t0 + 30) == [b"p2"]
        # ...and nothing after expiry
        assert eng.get(Query("a.*", contract=7), now=t0 + 100) == []


class TestTopicValidationParity:
    def test_regex_is_subset_of_parse_topic(self):
        """Drift guard: the adapter gate is deliberately stricter than
        parse_topic, but must never admit a topic the engine rejects —
        and must agree on the core shapes (concrete/wildcard/tail)."""
        import re

        from unitdb_spark.core.topic import parse_topic
        from unitdb_spark.sources.adapters import _TOPIC_OK

        rx = re.compile(_TOPIC_OK)

        def core_ok(t):
            try:
                parse_topic(t)
                return True
            except Exception:
                return False

        # subset: regex-accepted => parse_topic-accepted
        accepted = ["a", "a.b", "a.b.c", "...", "a...", "a.b...", "a.*.c", "*", "*.b"]
        for t in accepted:
            assert rx.match(t), f"adapter rejects core shape {t!r}"
            assert core_ok(t), f"adapter admits engine-invalid {t!r}"
        # both reject malformed dot-paths
        for t in ["", "a..b", "a.", ".a", "a...b"]:
            assert not rx.match(t) and not core_ok(t), t
        # deliberately stricter: engine-tolerated but ingest-rejected
        for t in ["a b", "a?x=1.b", "a.#"]:
            assert not rx.match(t) and core_ok(t), t


class TestCsvAdapter:
    def test_csv_roundtrip(self, spark, tmp_path):
        (tmp_path / "csv").mkdir()
        with open(tmp_path / "csv" / "in.csv", "w") as f:
            f.write("seq,contract,topic,ts,ttl_seconds,payload\n")
            f.write("1,,x.y,2024-01-01T00:00:00,,hello\n")
            f.write("2,,nope..bad,2024-01-01T00:00:01,,drop\n")
        df = messages_from_csv(spark, str(tmp_path / "csv"))
        rows = df.collect()
        assert len(rows) == 1 and rows[0]["topic"] == "x.y"


class TestStreamingAdapters:
    def test_json_stream_is_streaming(self, spark, tmp_path):
        _write_ndjson(tmp_path / "in", ROWS[:2])
        s = messages_json_stream(spark, str(tmp_path / "in"))
        assert s.isStreaming
        assert "parts" in s.columns and "depth" in s.columns

    def test_rate_stream_shape(self, spark):
        s = synthetic_rate_stream(spark, rows_per_second=10, n_topics=3)
        assert s.isStreaming
        assert {"seq", "contract", "topic", "ts", "payload", "parts"} <= set(s.columns)


class TestOrcAdapter:
    def test_orc_roundtrip(self, spark, tmp_path):
        from unitdb_spark.sources.adapters import ENVELOPE_SCHEMA, messages_from_orc

        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        src = spark.createDataFrame(
            [(1, None, "x.y", t0, None, "hello"),
             (2, None, "bad topic", t0, None, "drop")],
            ENVELOPE_SCHEMA,
        )
        src.write.orc(str(tmp_path / "orc"))
        rows = messages_from_orc(spark, str(tmp_path / "orc")).collect()
        assert len(rows) == 1 and rows[0]["topic"] == "x.y"
        assert bytes(rows[0]["payload"]) == b"hello"
