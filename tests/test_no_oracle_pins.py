"""Independent value pins for the three queries DuckDB cannot replay.

`doc_minhash_lsh`, `doc_simhash`, and `doc_fingerprint` use Spark's
internal xxhash64, which has no DuckDB equivalent, so the driver's
correctness gate has carried `err: "no_oracle"` (null rows) for them
since round 1 (r12 verdict item 7). Their md5 twins ARE oracle-checked
bitwise, which validates the surrounding pipeline (shingling, banding,
bit votes, rolling chain); what the twins cannot catch is a regression
specific to the xxhash64 path. These pins close that gap: the full
sf0.01 result set of each query, canonically rendered (columns sorted
by name, rows sorted, repr) and sha256-pinned against the round-13
reference run. Any change to the xxhash64 pipeline — intentional or
not — fails here loudly.
"""

from __future__ import annotations

import hashlib

import pytest

SF_ORACLE = "/root/testdata/sf0.01"

PINS = {
    "doc_minhash_lsh": (
        25,
        "b84d62b093ae02041b19e65663c8886ff40cd14e9b53c810dac5de38e7820457",
    ),
    "doc_simhash": (
        500,
        "fb9df44a941e5b067e3a5037a01f36b307a2b7cba74f5e28abca2bf5442ec3e1",
    ),
    "doc_fingerprint": (
        500,
        "ca93c083b6bffb6f566e67ede10da7e6bfc737e57a01800a48d35e7e288c8268",
    ),
}


@pytest.mark.parametrize("name", sorted(PINS))
def test_no_oracle_query_pinned(spark, name):
    import __spark_entry__ as entry

    df = entry.queries()[name](spark, SF_ORACLE)
    cols = sorted(df.columns)
    rows = sorted(tuple(r[c] for c in cols) for r in df.collect())
    rendered = "\n".join(repr(t) for t in rows)
    n, want = PINS[name]
    assert len(rows) == n
    assert hashlib.sha256(rendered.encode()).hexdigest() == want
