"""Topic algebra: parsing, options, validation, wildcard matching.

Re-implements the *semantics* of the reference's topic model
(reference: message/topic.go:36-296, entry.go:80-89, query.go:72-123)
as pure Python. This is deliberately the only part of the engine that
is a close semantic translation — it is ~300 LoC of deterministic
string algebra with no storage concerns.

Semantics:

- A topic is a dot-separated hierarchical path: ``teams.alpha.ch1``.
  Max depth 100 (message/topic.go:39), max encoded size 64 KB
  (db_internal.go:56-57).
- Options are URI-style suffixes: ``topic?ttl=1h&last=30m``
  (message/topic.go:150-167).  ``ttl`` sets an expiry on write;
  ``last`` is either a trailing-duration window or a result count on
  read (query.go:72-88).
- Wildcards (message/topic.go:36-42, docs/utp.md:182-199):
  ``*`` matches exactly one level; ``...`` — valid only as the final
  part — matches any number (>=0) of trailing levels.  Wildcards are
  legal on BOTH publish and subscribe/get (db_test.go:296-317), and
  matching is symmetric: a stored pattern matches a concrete query
  topic and vice versa.
- ``...`` anywhere but the tail is invalid (docs/utp.md:199).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from enum import IntEnum

MAX_TOPIC_DEPTH = 100  # message/topic.go:39
MAX_TOPIC_BYTES = 64 * 1024  # db_internal.go:56-57
WILDCARD_ONE = "*"
WILDCARD_TAIL = "..."

# Go duration grammar subset: 300ms, 10s, 5m, 1h30m, 2h, 1d (we add 'd'
# for convenience; the reference accepts Go durations — entry.go:80-89).
_DUR_RE = re.compile(r"(\d+(?:\.\d+)?)(ms|s|m|h|d|w)")
_DUR_SECONDS = {"ms": 0.001, "s": 1.0, "m": 60.0, "h": 3600.0, "d": 86400.0, "w": 604800.0}


class TopicKind(IntEnum):
    """Classification of a parsed topic (message/topic.go TopicType)."""

    STATIC = 0  # no wildcards
    WILDCARD = 1  # contains '*'
    WILDCARD_TAIL = 2  # ends with '...' (may also contain '*')


class InvalidTopicError(ValueError):
    pass


def parse_duration(text: str) -> float:
    """Parse a Go-style duration string into seconds.

    ``"1h"`` -> 3600; ``"1h30m"`` -> 5400; ``"500ms"`` -> 0.5.
    Raises ValueError on malformed input (semantics of entry.go:80-89).
    """
    text = text.strip()
    if not text:
        raise ValueError("empty duration")
    pos = 0
    total = 0.0
    for m in _DUR_RE.finditer(text):
        if m.start() != pos:
            raise ValueError(f"invalid duration: {text!r}")
        total += float(m.group(1)) * _DUR_SECONDS[m.group(2)]
        pos = m.end()
    if pos != len(text):
        raise ValueError(f"invalid duration: {text!r}")
    return total


@dataclass(frozen=True)
class TopicSpec:
    """Parsed topic + options.

    ``parts`` keeps wildcard tokens verbatim (``'*'`` / ``'...'``) so a
    stored pattern row can be matched against later queries
    (symmetric matching, db_test.go:296-317).
    """

    raw: str  # original string minus options
    parts: tuple[str, ...]
    kind: TopicKind
    ttl_seconds: float | None = None  # ?ttl=1h  (write-side)
    last_seconds: float | None = None  # ?last=1h (read-side window)
    last_count: int | None = None  # ?last=N  (read-side count)
    options: dict[str, str] = field(default_factory=dict)

    @property
    def depth(self) -> int:
        return len(self.parts)

    @property
    def has_tail(self) -> bool:
        return self.kind == TopicKind.WILDCARD_TAIL

    @property
    def base_parts(self) -> tuple[str, ...]:
        """Parts excluding a trailing '...'."""
        return self.parts[:-1] if self.has_tail else self.parts


def parse_topic(topic: str) -> TopicSpec:
    """Parse ``"a.b.c?ttl=1h&last=10m"`` into a TopicSpec.

    Validation mirrors message/topic.go:150-296 + docs/utp.md:199:
    non-empty, <=64KB, depth <=100, '...' only as the final part,
    no empty levels.
    """
    if not topic:
        raise InvalidTopicError("empty topic")
    if len(topic.encode("utf-8")) > MAX_TOPIC_BYTES:
        raise InvalidTopicError("topic exceeds 64KB")

    raw, _, opts_str = topic.partition("?")
    options: dict[str, str] = {}
    if opts_str:
        for kv in opts_str.split("&"):
            if not kv:
                continue
            k, _, v = kv.partition("=")
            options[k] = v

    if not raw:
        raise InvalidTopicError("empty topic path")

    # '...' handling: suffix-appended multi-level wildcard — the syntax
    # is "<topic>..." with the three dots appended directly
    # ("teams...", "unit.b..." — docs/usage.md:190-197). Only valid as
    # the suffix; "teams...userA" is invalid (docs/utp.md:199).
    tail = False
    body = raw
    if raw.endswith(WILDCARD_TAIL):
        body = raw[: -len(WILDCARD_TAIL)]
        tail = True
        if body.endswith("."):
            raise InvalidTopicError(f"malformed '...' suffix: {raw!r}")
    if WILDCARD_TAIL in body:
        raise InvalidTopicError(f"'...' only allowed as the suffix: {raw!r}")

    parts: list[str] = body.split(".") if body else []
    for p in parts:
        if p == "":
            raise InvalidTopicError(f"empty topic level in {raw!r}")
        if "*" in p and p != WILDCARD_ONE:
            raise InvalidTopicError(f"'*' must be a whole part: {p!r}")
    if tail:
        parts.append(WILDCARD_TAIL)
    if len(parts) > MAX_TOPIC_DEPTH:
        raise InvalidTopicError("topic depth exceeds 100")

    if tail:
        kind = TopicKind.WILDCARD_TAIL
    elif WILDCARD_ONE in parts:
        kind = TopicKind.WILDCARD
    else:
        kind = TopicKind.STATIC

    ttl = parse_duration(options["ttl"]) if "ttl" in options else None
    last_seconds: float | None = None
    last_count: int | None = None
    if "last" in options:
        v = options["last"]
        if v.isdigit():  # ?last=N -> result count (query.go:72-88)
            last_count = int(v)
        else:
            last_seconds = parse_duration(v)

    return TopicSpec(
        raw=raw,
        parts=tuple(parts),
        kind=kind,
        ttl_seconds=ttl,
        last_seconds=last_seconds,
        last_count=last_count,
        options=options,
    )


def _pattern_matches(pattern: tuple[str, ...], concrete: tuple[str, ...]) -> bool:
    """One-directional match: wildcard pattern vs concrete parts.

    '*' consumes exactly one level; trailing '...' consumes >=0 levels
    (trie.go:163-188 traversal semantics).
    """
    if pattern and pattern[-1] == WILDCARD_TAIL:
        base = pattern[:-1]
        if len(concrete) < len(base):
            return False
        return all(b == WILDCARD_ONE or b == c for b, c in zip(base, concrete))
    if len(pattern) != len(concrete):
        return False
    return all(p == WILDCARD_ONE or p == c for p, c in zip(pattern, concrete))


def pattern_covers(grant: TopicSpec | str, request: TopicSpec | str) -> bool:
    """One-directional containment: every topic the ``request`` pattern
    can match is also matched by the ``grant`` pattern.

    This is the ACL relation (security/key.go validation) — NOT the
    symmetric ``topic_match``: a capability for 'teams.alpha' must not
    authorize a 'teams.*' or '...' request, even though those pairs
    *match* symmetrically.

    Rules: a request '...' tail needs a grant tail at the same-or-
    shallower base; a request '*' at position i needs a grant '*' (or
    tail coverage) there; literals must agree wherever the grant is
    literal.
    """
    g = parse_topic(grant) if isinstance(grant, str) else grant
    r = parse_topic(request) if isinstance(request, str) else request
    gb, rb = list(g.base_parts), list(r.base_parts)
    if r.has_tail and not g.has_tail:
        return False  # request reaches unbounded depth, grant doesn't
    if g.has_tail:
        if len(rb) < len(gb):
            return False  # request can match topics shallower than grant base
    elif r.has_tail or len(rb) != len(gb):
        return False
    for i, gp in enumerate(gb):
        if gp == WILDCARD_ONE:
            continue  # grant wildcard covers literal or '*' request here
        if i >= len(rb) or rb[i] != gp:
            return False  # request '*' or mismatch where grant is literal
    return True


def topic_match(stored: TopicSpec | str, query: TopicSpec | str) -> bool:
    """Symmetric wildcard match between a stored topic and a query topic.

    Either side may carry wildcards (db_test.go:296-317,
    docs/usage.md:190-197): the match succeeds if the stored pattern
    matches the query treated as concrete, OR the query pattern matches
    the stored treated as concrete.
    """
    s = parse_topic(stored) if isinstance(stored, str) else stored
    q = parse_topic(query) if isinstance(query, str) else query
    return _pattern_matches(s.parts, q.parts) or _pattern_matches(q.parts, s.parts)
