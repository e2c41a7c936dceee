"""Engine-proof fixed-point log10 — the cross-engine transcendental
convention for DATA-DEPENDENT magnitudes.

The repo's exactness rule rounds one ``log10`` per distinct VALUE to
6 dp and DECIMAL-sums the results.  That is order-free and safe when
the log inputs are small/enumerable (Zipf ranks 1..100, bounded
ratios) because the rounded values can be audited against ulp
boundaries at build time.  It is NOT safe for corpus-scale integers
(Heaps' cumulative token/vocab counts): ``round(log10(n), 6)`` of an
arbitrary large count can land within one libm ulp of a ``.5e-6``
rounding boundary, and a different libm in the driver's environment
flips the 6th decimal (the round-8 ``doc_heaps`` driver hash-FAIL —
locally bitwise-green, remotely red).

This module removes libm from the loop entirely:

    ulog10_micro(x) = the deterministic fixed-point approximation of
                      floor(1e6 * log10(x)) for integer x >= 1

computed with EXACT integer arithmetic only:

- characteristic k = digit count - 1 (string length — exact);
- mantissa m = x scaled to [1e16, 1e17) (17 significant digits);
- six digit-extraction steps, each computing m^10 as three squarings
  plus one multiply with truncating renormalisation to [1e16, 1e17)
  after every product; the extracted digit is the base-10 exponent
  accumulated by the renormalisations (5*b1 + 2*b2 + b3 + b4).

Every operation is an exact big-integer multiply or a TRUNCATING
integer division, both of which Spark (DECIMAL(38,0) `*`, `div`) and
DuckDB (HUGEINT `*`, `//`) evaluate identically — the result is the
same integer on every engine and platform, independent of libm.  The
truncations make the result a deterministic APPROXIMATION of the true
floor (drift < ~1e-9 relative, far below the 1e-6 grid), which is
irrelevant for cross-engine matching: both engines run the identical
truncating program.

Largest intermediate: (1e18)^2 / 1e16-scale products stay <= 1e34,
inside both DECIMAL(38,0) and HUGEINT (~1.7e38).

Reference parity note: the reference keeps no analytics of this kind
(payloads are opaque bytes — db_internal.go:59-60); this primitive
serves the north-star corpus-statistics queries built on top.
"""

from __future__ import annotations

from typing import Dict, List

ULOG_SCALE = 10**16  # mantissa kept at 17 significant digits
ULOG_HI = 10**17  # renormalisation threshold: mantissa in [1e16, 1e17)


def _big(x: str, dialect: str) -> str:
    """Exact wide-integer cast: Spark DECIMAL(38,0), DuckDB HUGEINT."""
    if dialect == "spark":
        return f"CAST({x} AS DECIMAL(38,0))"
    return f"CAST({x} AS HUGEINT)"


def _idiv(a: str, b: str, dialect: str) -> str:
    """Truncating integer division — `div` and `//` BOTH truncate."""
    op = "div" if dialect == "spark" else "//"
    return f"(({a}) {op} ({b}))"


def floordiv_sql(a: str, b: str, dialect: str) -> str:
    """TRUE floor(a / b) for signed a, POSITIVE b — the shared
    nonneg-mod identity (Python `//` floors natively and matches).

    Both operands are widened (Spark DECIMAL(38,0) / DuckDB HUGEINT)
    INSIDE the helper so it is total over the full BIGINT range:
    DuckDB types bare literals INT32 and the identity's subtraction
    `a - ((a % b + b) % b)` can leave INT32 even when a and b fit it
    (found by hypothesis: a=-2,049,870,775, b=97,612,894 raises an
    out-of-range error instead of promoting). Callers that already
    pre-widen via `_big` are unaffected — the cast is idempotent.
    """
    aw, bw = _big(a, dialect), _big(b, dialect)
    return _idiv(
        f"({aw}) - ((((({aw}) % ({bw})) + ({bw})) % ({bw})))",
        bw,
        dialect,
    )


def _norm_m(t: str, dialect: str) -> str:
    return (
        f"CASE WHEN ({t}) >= {ULOG_HI} THEN "
        + _idiv(t, "10", dialect)
        + f" ELSE ({t}) END"
    )


def _norm_b(t: str) -> str:
    return f"CASE WHEN ({t}) >= {ULOG_HI} THEN 1 ELSE 0 END"


def ulog10_layers(
    mapping: Dict[str, str], dialect: str
) -> List[List[str]]:
    """Select-expression layers computing ``out = ulog10_micro(in)``
    for each ``out -> in`` pair of ``mapping``.  Each layer is a list
    of `expr AS name` strings to ADD on top of the previous relation
    (chain with ``SELECT *, ...``); the final layer emits the output
    columns.  Inputs must be positive integral columns.
    """
    if dialect not in ("spark", "duckdb"):
        raise ValueError(f"ulog10_layers: unknown dialect {dialect!r}")
    layers: List[List[str]] = []
    # layer 0: characteristic = digit count - 1
    layers.append(
        [
            f"CAST(length(CAST({src} AS STRING)) AS BIGINT) - 1"
            f" AS _ul_{out}_k"
            for out, src in mapping.items()
        ]
    )
    # layer 1: mantissa scaled to [1e16, 1e17) — string-built power of
    # ten (no double pow); truncating when the input exceeds 17 digits
    l1 = []
    for out, src in mapping.items():
        k = f"_ul_{out}_k"
        up = (
            _big(src, dialect)
            + " * "
            + _big(
                f"'1' || repeat('0', CAST(16 - {k} AS INT))", dialect
            )
        )
        down = _idiv(
            _big(src, dialect),
            _big(f"'1' || repeat('0', CAST({k} - 16 AS INT))", dialect),
            dialect,
        )
        l1.append(
            f"CAST(CASE WHEN {k} <= 16 THEN {up} ELSE {down} END"
            f" AS BIGINT) AS _ul_{out}_m0"
        )
    layers.append(l1)
    # six digit steps: m^10 = ((m^2)^2)^2 * m^2, renormalising after
    # every product; digit = 5*b1 + 2*b2 + b3 + b4
    for i in range(1, 7):
        for a, b, o in (
            (f"m{i - 1}", f"m{i - 1}", f"s2_{i}"),
            (f"s2_{i}", f"s2_{i}", f"s4_{i}"),
            (f"s4_{i}", f"s4_{i}", f"s8_{i}"),
            (f"s8_{i}", f"s2_{i}", f"m{i}"),
        ):
            layer = []
            for out in mapping:
                t = _idiv(
                    _big(f"_ul_{out}_{a}", dialect)
                    + " * "
                    + _big(f"_ul_{out}_{b}", dialect),
                    str(ULOG_SCALE),
                    dialect,
                )
                layer.append(
                    f"{_norm_m(t, dialect)} AS _ul_{out}_{o}"
                )
                layer.append(
                    f"{_norm_b(t)} AS _ul_{out}_b_{o}"
                )
            layers.append(layer)
    # final layer: assemble micro-log10 = k*1e6 + digit stream
    fin = []
    for out in mapping:
        p = f"_ul_{out}"
        digits = " + ".join(
            f"(5 * {p}_b_s2_{i} + 2 * {p}_b_s4_{i} + {p}_b_s8_{i}"
            f" + {p}_b_m{i}) * {10 ** (6 - i)}"
            for i in range(1, 7)
        )
        fin.append(
            f"CAST({p}_k * 1000000 + {digits} AS BIGINT) AS {out}"
        )
    layers.append(fin)
    return layers


def with_ulog10(df, mapping: Dict[str, str], via_distinct: bool = False):
    """Spark-side application of ``ulog10_micro``.

    Default (``via_distinct=False``): chain the layers with selectExpr
    — right for control-plane-sized relations (the heaps checkpoint is
    16 rows, entropy rollups are per-source/bucket). Note the layers
    COLLAPSE into one Project whose renormalisation CASEs inline their
    operands ~5^6 times; the tree exceeds the codegen method limits
    and evaluates INTERPRETED at ~13µs/row — irrelevant at 16-50k
    rows, fatal at corpus scale.

    ``via_distinct=True``: evaluate the program once per DISTINCT
    source value and broadcast-join the results back (null-safe, so
    NULL inputs still yield NULL exactly like the in-row path). Same
    integer function, O(distinct) monster evaluations instead of
    O(rows) — the right shape when the input relation is large and
    its values are bounded-cardinality counts (char_entropy's
    (doc, char) relation: 17s -> 4.4-5.7s at sf0.1). Costs one extra
    evaluation of df's lineage per source column for the distinct, so
    do NOT use it for tiny relations with expensive lineage (measured
    REGRESSION on dsir's vocab: 3.0 -> 5.7s)."""
    if not via_distinct:
        layers = ulog10_layers(mapping, "spark")
        out = df
        for layer in layers[:-1]:
            out = out.selectExpr("*", *layer)
        out = out.selectExpr("*", *layers[-1])
        keep = [c for c in out.columns if not c.startswith("_ul_")]
        return out.select(*keep)

    from pyspark.sql import functions as F

    out = df
    by_src: Dict[str, List[str]] = {}
    for o, s in mapping.items():
        by_src.setdefault(s, []).append(o)
    for src, outs in by_src.items():
        vname = f"_ulv_{src}"
        layers = ulog10_layers({"_ul_res": vname}, "spark")
        vals = df.select(F.col(src).alias(vname)).distinct()
        for layer in layers[:-1]:
            vals = vals.selectExpr("*", *layer)
        vals = vals.selectExpr("*", *layers[-1])
        vals = vals.select(
            vname, *[F.col("_ul_res").alias(o) for o in outs]
        )
        out = out.join(
            F.broadcast(vals), F.col(src).eqNullSafe(F.col(vname)), "left"
        ).drop(vname)
    return out.select(*df.columns, *mapping.keys())


def ulog10_wrap_sql(
    inner_sql: str, mapping: Dict[str, str], keep: List[str]
) -> str:
    """DuckDB-side application: wrap ``inner_sql`` in the identical
    layer chain; project ``keep`` + the outputs at the end."""
    layers = ulog10_layers(mapping, "duckdb")
    sql = f"({inner_sql})"
    for layer in layers[:-1]:
        sql = "SELECT *, " + ", ".join(layer) + " FROM (" + sql + ")"
        sql = f"({sql})"
    cols = ", ".join(list(keep) + layers[-1])
    return f"SELECT {cols} FROM {sql}"


def ulog10_micro_py(x: int) -> int:
    """Pure-Python twin of the SQL program (unbounded ints are exact,
    so this matches the engines bit-for-bit) — for tests and oracles
    minted driver-side."""
    if x < 1:
        raise ValueError("ulog10_micro_py: x must be >= 1")
    k = len(str(x)) - 1
    m = x * 10 ** (16 - k) if k <= 16 else x // 10 ** (k - 16)
    digits = []
    for _ in range(6):
        t = (m * m) // ULOG_SCALE
        b1 = 1 if t >= ULOG_HI else 0
        s2 = t // 10 if b1 else t
        t = (s2 * s2) // ULOG_SCALE
        b2 = 1 if t >= ULOG_HI else 0
        s4 = t // 10 if b2 else t
        t = (s4 * s4) // ULOG_SCALE
        b3 = 1 if t >= ULOG_HI else 0
        s8 = t // 10 if b3 else t
        t = (s8 * s2) // ULOG_SCALE
        b4 = 1 if t >= ULOG_HI else 0
        m = t // 10 if b4 else t
        digits.append(5 * b1 + 2 * b2 + b3 + b4)
    mant = 0
    for d in digits:
        mant = mant * 10 + d
    return k * 1000000 + mant


def lsq_ppm_exprs(dialect: str) -> List[str]:
    """Exact-integer OLS finish over micro-log points: given an
    aggregated relation with BIGINT columns (c_used, sx, sy, sxy,
    sxx) in micro units, emit (c_used, beta_ppm, logk_ppm) — slope
    and intercept as floor(1e6 * value), all integer arithmetic (the
    micro scale cancels in the slope; the intercept stays in micro).
    Degenerate spread (all x equal -> den = 0) yields NULLs.
    """
    num = "(c_used * sxy - sx * sy)"
    den = "(c_used * sxx - sx * sx)"
    beta = floordiv_sql(
        _big(num, dialect) + " * 1000000", den, dialect
    )
    logk = floordiv_sql(
        _big("sy", dialect)
        + f" * {_big(den, dialect)} - {_big(num, dialect)} * "
        + _big("sx", dialect),
        f"(c_used * {den})",
        dialect,
    )
    return [
        "c_used",
        f"CAST(CASE WHEN {den} <> 0 THEN {beta} END AS BIGINT)"
        " AS beta_ppm",
        f"CAST(CASE WHEN {den} <> 0 THEN {logk} END AS BIGINT)"
        " AS logk_ppm",
    ]
