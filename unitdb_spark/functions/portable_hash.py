"""The engine-portable hash primitive shared by every md5-based path.

`md5_int60(col)` = first 15 hex chars of md5 parsed as a positive
60-bit long. This exact idiom is what the DuckDB oracles replay as
`CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)`, so it lives in ONE
place: sampling (uniform variates), count-min sketch (bucket hashing),
token hashing (SimHash), and document fingerprints all call this —
changing the width or parse here is the single point that must move in
lockstep with the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 2^60 — denominator turning md5_int60 into a uniform [0,1) variate
INT60_DENOM = float(1 << 60)


def md5_int60(col: Column | str) -> Column:
    """Positive 60-bit integer from md5 (engine-portable: md5 + hex
    parse exist identically everywhere; 60 bits keeps the value inside
    a signed 64-bit integer in any engine)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
