"""Spark Column expressions for (symmetric) wildcard topic matching.

The reference resolves wildcard matches with an in-RAM trie traversal
(reference: trie.go:156-188, message/topic.go:231-296). In Spark the
equivalent is a *predicate expression* over the stored ``topic`` /
``parts`` / ``depth`` / ``has_tail`` columns, generated driver-side
from the (known) query pattern, so that:

- static-topic queries collapse to ``topic = 'a.b.c'`` — a plain
  equality Catalyst pushes into the Parquet scan;
- wildcard queries become conjunctions of ``element_at`` equalities and
  a ``size()`` check — still JVM-side, whole-stage-codegen friendly,
  with NO Python UDF in the hot path;
- stored-side patterns (wildcards are legal on write,
  db_test.go:296-317) are matched with the symmetric direction OR-ed
  in.

Column layout expected on the messages table (SURVEY §1.3):
``topic STRING, parts ARRAY<STRING>, depth INT, has_tail BOOLEAN``
where ``parts`` contains wildcard tokens verbatim and ``has_tail``
marks a trailing '...'. ``depth = size(parts)`` (tail token excluded).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from unitdb_spark.core.topic import (
    WILDCARD_ONE,
    TopicKind,
    TopicSpec,
    parse_topic,
)


def _query_pattern_vs_stored(spec: TopicSpec, parts: Column, depth: Column, has_tail: Column, topic: Column) -> Column:
    """Query pattern (driver-side constant) matched against stored
    concrete topics. Generated as a plain conjunction — codegen-friendly."""
    base = spec.base_parts
    if spec.kind == TopicKind.STATIC:
        # Fast path: plain string equality — partition/predicate prunable.
        return topic == F.lit(spec.raw)
    conds: list[Column] = [~has_tail]  # stored concrete only in this direction
    if spec.has_tail:
        conds.append(depth >= F.lit(len(base)))
    else:
        conds.append(depth == F.lit(len(base)))
    for i, p in enumerate(base):
        if p != WILDCARD_ONE:
            # element_at is 1-indexed
            conds.append(F.get(parts, i) == F.lit(p))
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def _stored_pattern_vs_query(spec: TopicSpec, parts: Column, depth: Column, has_tail: Column) -> Column:
    """Stored patterns (rows written to wildcard topics) matched against
    the query's concrete parts. Only sound when the query itself is
    static; for wildcard-vs-wildcard the reference's trie matches on
    hash equality of non-wild parts, which the symmetric OR still
    covers via the other direction."""
    qparts = spec.base_parts
    qd = len(qparts)
    # stored has trailing '...': base must be a (wildcard-tolerant) prefix
    tail_conds: Column = has_tail & (depth <= F.lit(qd))
    for i, qp in enumerate(qparts):
        pos_ok = (depth < F.lit(i + 1)) | (
            (F.get(parts, i) == F.lit(qp)) | (F.get(parts, i) == F.lit(WILDCARD_ONE))
        )
        tail_conds = tail_conds & pos_ok
    # stored flat pattern: same depth, each part equal or '*'
    flat_conds: Column = (~has_tail) & (depth == F.lit(qd))
    for i, qp in enumerate(qparts):
        flat_conds = flat_conds & (
            (F.get(parts, i) == F.lit(qp)) | (F.get(parts, i) == F.lit(WILDCARD_ONE))
        )
    return tail_conds | flat_conds


def topic_match_expr(
    query_topic: str | TopicSpec,
    topic: Column | str = "topic",
    parts: Column | str = "parts",
    depth: Column | str = "depth",
    has_tail: Column | str = "has_tail",
    symmetric: bool = True,
) -> Column:
    """Build the match predicate for one query topic.

    ``symmetric=True`` reproduces the reference's both-direction match
    (stored pattern OR query pattern — db_test.go:296-317). Set it
    False when the table is known to hold only concrete topics: the
    resulting predicate is then a pure conjunction that Catalyst can
    push down fully.
    """
    spec = parse_topic(query_topic) if isinstance(query_topic, str) else query_topic
    topic_c = F.col(topic) if isinstance(topic, str) else topic
    parts_c = F.col(parts) if isinstance(parts, str) else parts
    depth_c = F.col(depth) if isinstance(depth, str) else depth
    tail_c = F.col(has_tail) if isinstance(has_tail, str) else has_tail

    fwd = _query_pattern_vs_stored(spec, parts_c, depth_c, tail_c, topic_c)
    if spec.kind == TopicKind.STATIC:
        fwd = fwd & ~tail_c  # exact-equality fast path already excludes patterns lexically, keep depth sanity
        if not symmetric:
            return topic_c == F.lit(spec.raw)
        rev = _stored_pattern_vs_query(spec, parts_c, depth_c, tail_c)
        return (topic_c == F.lit(spec.raw)) | rev
    if not symmetric:
        return fwd
    rev = _stored_pattern_vs_query(spec, parts_c, depth_c, tail_c)
    return fwd | rev


def topic_regex(query_topic: str | TopicSpec) -> str:
    """Anchored regex equivalent of a query pattern vs concrete topics.

    Used by the DuckDB oracle SQL (and available as an alternative
    matcher via ``rlike``): '*' -> one level, trailing '...' -> any tail.
    """
    spec = parse_topic(query_topic) if isinstance(query_topic, str) else query_topic
    import re as _re

    out = []
    for p in spec.base_parts:
        out.append(r"[^.]+" if p == WILDCARD_ONE else _re.escape(p))
    body = r"\.".join(out)
    if spec.has_tail:
        if not spec.base_parts:
            return r"^.*$"
        return rf"^{body}(\..+)?$"
    return rf"^{body}$"
