"""Derive the canonical `messages` log from the driver's `events` table.

The correctness harness needs a messages table whose content is a pure
deterministic function of driver-generated TESTDATA, so the exact same
derivation exists twice: once as DataFrame ops (here) and once as a
DuckDB CTE (``MESSAGES_FROM_EVENTS_SQL``) used by every oracle query.

Derivation (seed-free, engine-agnostic arithmetic only):

- ``seq``      = event_id + 1                       (strictly increasing)
- ``contract`` = 1042 when user_id % 7 = 0 else MASTER_CONTRACT
                 (two tenants → contract-isolation checks)
- ``topic``    = 'events.' || event_type || '.u' || (user_id % 10)
                 (3-level dot-path; wildcard queries hit level 2/3)
- ``ts``       = event ts (event time)
- ``expires_at`` = ts + 1h when event_id % 20 = 0 else NULL
                 (relative to now = max(ts) these are long expired →
                  TTL read-filter parity with TestExpiry)
- ``payload``  = props JSON string
- ``now``      = max(ts) over events (fixed, reproducible clock)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from unitdb_spark.core.model import MASTER_CONTRACT
from unitdb_spark.table import with_topic_columns

ALT_CONTRACT = 1042


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read events.parquet, tolerating INT64(TIMESTAMP_NANOS) columns.

    Spark 4 has no nanosecond timestamp type; with
    ``legacy.parquet.nanosAsLong`` the column arrives as raw nanos and
    is truncated to microseconds here — exactly what DuckDB does
    internally (its TIMESTAMP is µs), so both engines see equal values.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif dict(df.dtypes).get("ts") == "timestamp_ntz":
        # parquet written without tz metadata reads back TIMESTAMP_NTZ;
        # event-time ops (watermarks, numeric casts) and the messages
        # schema want the session-tz TIMESTAMP. Sessions run UTC, so
        # epoch values are unchanged — DuckDB (naive = UTC) agrees.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def messages_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `messages` DataFrame (with derived topic columns) at sf_dir."""
    return messages_from_events_df(load_events(spark, sf_dir))


def messages_from_events_df(ev: DataFrame) -> DataFrame:
    """The same derivation over an already-loaded events frame — works
    on a STREAMING events frame too (pure row-wise expressions), which
    is how the streaming batch-twin queries replay the exact messages
    the batch oracles describe."""
    df = ev.select(
        (F.col("event_id") + F.lit(1)).cast("long").alias("seq"),
        F.when(F.col("user_id") % 7 == 0, F.lit(ALT_CONTRACT))
        .otherwise(F.lit(MASTER_CONTRACT))
        .cast("long")
        .alias("contract"),
        F.concat(
            F.lit("events."),
            F.col("event_type"),
            F.lit(".u"),
            (F.col("user_id") % 10).cast("string"),
        ).alias("topic"),
        F.col("ts"),
        F.when(
            F.col("event_id") % 20 == 0, F.col("ts") + F.expr("INTERVAL 1 HOUR")
        ).alias("expires_at"),
        F.col("value"),
        F.col("props").alias("payload"),
    )
    return with_topic_columns(df)


#: DuckDB CTE mirroring messages_from_events — prepend to oracle SQL.
MESSAGES_FROM_EVENTS_SQL = f"""
WITH messages AS (
  SELECT
    CAST(event_id + 1 AS BIGINT)                    AS seq,
    CAST(CASE WHEN user_id % 7 = 0 THEN {ALT_CONTRACT}
              ELSE {MASTER_CONTRACT} END AS BIGINT) AS contract,
    'events.' || event_type || '.u' ||
        CAST(user_id % 10 AS VARCHAR)               AS topic,
    ts                                              AS ts,
    CASE WHEN event_id % 20 = 0
         THEN ts + INTERVAL 1 HOUR END              AS expires_at,
    value                                           AS value,
    props                                           AS payload
  FROM events
),
clock AS (SELECT max(ts) AS now FROM events)
"""


def now_expr(spark: SparkSession, sf_dir: str):
    """The fixed test clock: max event ts (scalar, computed once)."""
    return load_events(spark, sf_dir).agg(F.max("ts")).collect()[0][0]
