"""The Get operator: unitdb's flagship read as one declarative plan.

Shared by Engine.get_df (live store) and the correctness harness
(derived messages DataFrame): contract filter → topic match →
?last cutoff → TTL filter → newest-first top-K (reference:
db.go:222-319, query.go:50-123).

The emitted plan is: Parquet scan with pushed filters (contract is a
partition column on the live store; ts/seq hit row-group stats) →
whole-stage-codegen filter → TakeOrderedAndProject(limit, seq DESC).
No shuffle except the final K-row merge.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from unitdb_spark.core.model import Query
from unitdb_spark.operators.topic_match import topic_match_expr
from unitdb_spark.table import ttl_live_expr


def now_column(now: float | dt.datetime | None) -> Column:
    if now is None:
        return F.current_timestamp()
    if isinstance(now, dt.datetime):
        return F.lit(now.replace(tzinfo=None))
    return F.lit(dt.datetime.fromtimestamp(now, dt.timezone.utc).replace(tzinfo=None))


def apply_get(
    df: DataFrame,
    query: Query | str,
    now: float | dt.datetime | None = None,
    symmetric: bool = True,
) -> DataFrame:
    """Apply Get semantics to a messages-schema DataFrame."""
    q = Query(topic=query) if isinstance(query, str) else query
    now_ts = now_column(now)
    out = df.filter(F.col("contract") == F.lit(q.contract))
    out = out.filter(topic_match_expr(q.spec, symmetric=symmetric))
    last = q.last_seconds()
    if last is not None:
        out = out.filter(
            F.col("ts") >= now_ts - F.expr(f"INTERVAL {int(last)} SECOND")
        )
    out = out.filter(ttl_live_expr(now_ts))
    return out.orderBy(F.desc("seq")).limit(q.effective_limit())
