"""Topic security keys (SURVEY §2.2 #24).

The reference issues 8-byte ACL keys encoding permission bits plus a
hashed target topic with a wildcard bit-path, validated on
publish/subscribe (reference: security/key.go:29-237). Here the same
capability semantics — a key grants {read, write} on one topic pattern
under one contract, and validation checks the requested topic against
the granted pattern — are an HMAC-signed token: unforgeable without
the engine's secret, stateless to verify, and wildcard-aware via the
same topic algebra as the query path.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import time

from unitdb_spark.core.model import MASTER_CONTRACT
from unitdb_spark.core.topic import parse_topic, pattern_covers

ALLOW_READ = 1  # security/key.go permission bits parity
ALLOW_WRITE = 2
ALLOW_ALL = ALLOW_READ | ALLOW_WRITE


def generate_key(
    secret: bytes,
    topic: str,
    permissions: int,
    contract: int = MASTER_CONTRACT,
    ttl_seconds: int | None = None,
    now: float | None = None,
) -> str:
    """Mint a capability for one (possibly wildcard) topic pattern."""
    spec = parse_topic(topic)  # validates
    payload = {
        "t": spec.raw,
        "p": permissions,
        "c": contract,
        "e": (
            int((now if now is not None else time.time()) + ttl_seconds)
            if ttl_seconds is not None
            else 0
        ),
    }
    body = json.dumps(payload, sort_keys=True, separators=(",", ":")).encode()
    sig = hmac.new(secret, body, hashlib.sha256).digest()[:16]
    return base64.urlsafe_b64encode(body + sig).decode()


def validate_key(
    secret: bytes,
    key: str,
    topic: str,
    permission: int,
    contract: int = MASTER_CONTRACT,
    now: float | None = None,
) -> bool:
    """Check a capability grants `permission` on `topic` (key.go:124-140
    validation parity: signature, expiry, contract, permission bits,
    wildcard-aware topic coverage)."""
    try:
        raw = base64.urlsafe_b64decode(key.encode())
        body, sig = raw[:-16], raw[-16:]
        if not hmac.compare_digest(
            hmac.new(secret, body, hashlib.sha256).digest()[:16], sig
        ):
            return False
        payload = json.loads(body)
    except Exception:
        return False
    if payload.get("c") != contract:
        return False
    clock = now if now is not None else time.time()
    if payload.get("e", 0) and clock > payload["e"]:
        return False
    if (payload.get("p", 0) & permission) != permission:
        return False
    granted = payload.get("t", "")
    try:
        # one-directional containment, NOT the symmetric query match: a
        # key for 'teams.alpha' must not authorize a 'teams.*' request
        return pattern_covers(granted, topic)
    except Exception:
        return False
