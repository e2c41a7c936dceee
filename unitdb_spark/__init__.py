"""unitdb_spark — a PySpark-native engine with unit-io/unitdb's
query and data-processing capabilities, re-expressed Spark-first.

Public surface:
- :class:`unitdb_spark.engine.Engine` — Open/Put/Get/Delete/Batch
- :mod:`unitdb_spark.core.topic` — topic algebra (wildcards, ?ttl/?last)
- :mod:`unitdb_spark.operators` — topic match, top-K, dedup, similarity
- :mod:`unitdb_spark.streaming` — pub/sub on Structured Streaming
"""

from unitdb_spark.core.model import (
    DEFAULT_QUERY_LIMIT,
    MASTER_CONTRACT,
    MAX_QUERY_LIMIT,
    Entry,
    Query,
    new_contract,
    new_entry,
    new_query,
)
from unitdb_spark.core.topic import (
    InvalidTopicError,
    TopicKind,
    TopicSpec,
    parse_duration,
    parse_topic,
    topic_match,
)
from unitdb_spark.engine import Batch, Engine, EngineOptions, ImmutableError

__all__ = [
    "DEFAULT_QUERY_LIMIT",
    "MASTER_CONTRACT",
    "MAX_QUERY_LIMIT",
    "Batch",
    "Engine",
    "EngineOptions",
    "Entry",
    "ImmutableError",
    "InvalidTopicError",
    "Query",
    "TopicKind",
    "TopicSpec",
    "new_contract",
    "new_entry",
    "new_query",
    "parse_duration",
    "parse_topic",
    "topic_match",
]

__version__ = "0.1.0"
