"""Ingestion adapters: external formats → the canonical messages envelope.

The reference ingests exclusively through its uTP server (PUBLISH) and
Go API (Put/PutEntry) — its six file types are internal storage, not
interchange formats (file.go:33-40). A Spark-native engine instead
meets data where it lands: JSON/CSV/Parquet drops and streaming
directories. Each adapter normalizes to the messages envelope
(SURVEY §1.3) and validates the topic column, so everything downstream
(Get, wildcard match, TTL, pub/sub fan-out) works unchanged.

All adapters are schema-first (`spark.read.schema(...)`) — schema
inference is a full extra pass over the data at 100 TB and
non-deterministic under drift, so it is refused on the batch paths
and impossible on the streaming paths (Spark requires a schema there).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from unitdb_spark.core.model import MASTER_CONTRACT
from unitdb_spark.table import with_topic_columns

#: minimal external envelope accepted from interchange files
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), True),
        T.StructField("contract", T.LongType(), True),
        T.StructField("topic", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("ttl_seconds", T.LongType(), True),
        T.StructField("payload", T.StringType(), True),
    ]
)

#: vectorizable topic gate for bulk ingest. Deliberately STRICTER than
#: core.topic.parse_topic: inline ?options, spaces and reserved chars
#: (#, +) are rejected here even though the driver-side parser
#: tolerates them — interchange files should carry clean dot-paths,
#: TTL comes via the ttl_seconds column. Invariant (pinned by
#: tests/test_sources.py): everything this regex admits, parse_topic
#: accepts — the adapter never lets an engine-invalid topic through.
_TOPIC_OK = r"^(\.\.\.|[^.?#+ ]+(\.[^.?#+ ]+)*(\.\.\.)?)$"


def _normalize(df: DataFrame, default_contract: int) -> DataFrame:
    """Envelope → messages schema. Rows with invalid topics are dropped
    (the reference rejects them at PutEntry — db.go:351-360); callers
    wanting a quarantine keep `invalid_rows` instead."""
    # bind the effective ts first: expires_at must derive from the
    # SAME value that is stored (a row with ttl but no ts would
    # otherwise get NULL expires_at and silently never expire)
    eff = df.filter(F.col("topic").rlike(_TOPIC_OK)).withColumn(
        "_ts", F.coalesce(F.col("ts"), F.current_timestamp())
    )
    out = eff.select(
        F.coalesce(F.col("seq"), F.monotonically_increasing_id() + 1).alias("seq"),
        F.lit(None).cast("binary").alias("msg_id"),
        F.coalesce(F.col("contract"), F.lit(default_contract)).cast("long").alias("contract"),
        F.col("topic"),
        F.col("_ts").alias("ts"),
        F.when(
            F.col("ttl_seconds").isNotNull(),
            F.col("_ts") + (F.col("ttl_seconds") * F.expr("INTERVAL 1 SECOND")),
        ).alias("expires_at"),
        F.encode(F.col("payload"), "utf-8").alias("payload"),
    )
    return with_topic_columns(out)


def invalid_rows(df: DataFrame) -> DataFrame:
    """The quarantine view: rows `_normalize` would drop."""
    return df.filter(~F.col("topic").rlike(_TOPIC_OK) | F.col("topic").isNull())


def messages_from_json(
    spark: SparkSession, path: str, default_contract: int = MASTER_CONTRACT
) -> DataFrame:
    """NDJSON drop → messages. Fixed schema (no inference pass)."""
    return _normalize(
        spark.read.schema(ENVELOPE_SCHEMA).json(path), default_contract
    )


def messages_from_csv(
    spark: SparkSession, path: str, default_contract: int = MASTER_CONTRACT, header: bool = True
) -> DataFrame:
    return _normalize(
        spark.read.schema(ENVELOPE_SCHEMA).option("header", header).csv(path),
        default_contract,
    )


def messages_from_orc(
    spark: SparkSession, path: str, default_contract: int = MASTER_CONTRACT
) -> DataFrame:
    """ORC drop → messages (Spark-native columnar alternative to
    Parquet — common in Hive-lineage lakes; stats/pushdown work the
    same way)."""
    return _normalize(
        spark.read.schema(ENVELOPE_SCHEMA).orc(path), default_contract
    )


def messages_json_stream(
    spark: SparkSession, path: str, default_contract: int = MASTER_CONTRACT
) -> DataFrame:
    """Streaming variant: a landing directory of NDJSON files becomes
    the publish stream (feed to streaming.pubsub.ingest_stream)."""
    return _normalize(
        spark.readStream.schema(ENVELOPE_SCHEMA).json(path), default_contract
    )


def synthetic_rate_stream(
    spark: SparkSession,
    rows_per_second: int = 1000,
    n_topics: int = 10,
    default_contract: int = MASTER_CONTRACT,
) -> DataFrame:
    """Spark's `rate` source shaped into the messages envelope — a
    load generator for soak-testing ingest/fan-out without any input
    data (the stand-in for the reference's uTP publish firehose)."""
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_second
    ).load()
    df = rate.select(
        (F.col("value") + 1).alias("seq"),
        F.lit(None).cast("binary").alias("msg_id"),
        F.lit(default_contract).cast("long").alias("contract"),
        F.concat(
            F.lit("bench.load.t"), (F.col("value") % n_topics).cast("string")
        ).alias("topic"),
        F.col("timestamp").alias("ts"),
        F.lit(None).cast("timestamp").alias("expires_at"),
        F.encode(F.col("value").cast("string"), "utf-8").alias("payload"),
    )
    return with_topic_columns(df)
