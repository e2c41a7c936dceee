"""Whole-inventory transcendental / rendering audit (round 10).

The only correctness failure that has ever reached the driver from a
shipped tree is the round-8 `doc_heaps` class: a per-value libm
transcendental (or its signed-zero rendering at round()) diverging
between Spark/JVM and DuckDB/libstdc++ at a rounding or comparison
boundary. This script closes the class inventory-wide, mechanically:

1. **Static scan** — every oracle_sql() entry is classified:
   - `clean`          : no transcendental token, no round() on DOUBLE
                        output — all-integer/DECIMAL finishes are
                        engine-identical by construction.
   - `round-pinned`   : round()/float math but NO transcendental. The
                        repo convention pins identical expression
                        trees in both engines; IEEE +-*/ are exactly
                        rounded, so both engines round the SAME
                        double and agree (signed zero aside, which
                        the bitwise gate + the -0.0 scan cover).
   - `transcendental` : at least one of log10/log2/ln/exp/pow/power —
                        the libm-risk class; each entry must carry a
                        perturbation certificate (below).
   - `sqrt` is NOT risky: IEEE 754 requires sqrt be correctly
     rounded, so JVM and libm agree bit-for-bit; it is excluded.

2. **Perturbation certificate** (``--certify``) — for each
   `transcendental` oracle, rerun the DuckDB oracle at sf0.01 with
   EVERY transcendental call's result multiplied by (1 ± 1e-13)
   (~450x the double ulp, orders of magnitude above any plausible
   cross-libm last-place disagreement) and compare the full rendered
   output bitwise (float64 via uint64 view) against the unperturbed
   run. Invariance under both signs certifies that no pre-round /
   pre-comparison value anywhere in the query sits within 1e-13
   relative of a rounding boundary, threshold compare, sort tie, or
   CAST — i.e. the query's rendered output cannot change under any
   libm disagreement below that margin. This is strictly stronger
   than auditing individual round() sites: it covers nested rounds,
   half-up ties, >= thresholds, ORDER BY keys and LIMIT cuts in one
   end-to-end check.

3. **Signed-zero scan** (``--certify``) — for every float64 output
   column of every oracle (DuckDB side, which preserves -0.0 where
   Spark's BigDecimal round() cannot), record any negative zeros and
   the smallest |negative| value: the distance of observed data from
   the round-to-negative-zero trap interval.

Exit code 1 if any transcendental oracle is missing from the
hand-maintained classification table below, if the table carries a
stale name, or (with --certify) if any certificate fails.

Results are summarised in BASELINE.md ("Transcendental audit").
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TRANS_PAT = re.compile(r"(?<![_a-zA-Z0-9])(log10|log2|ln|exp|pow|power)\s*\(", re.I)
ROUND_PAT = re.compile(r"(?<![_a-zA-Z0-9])round\s*\(", re.I)

# Hand-maintained classification for every transcendental oracle.
# family -> justification; the --certify run is the proof, this table
# is the human-readable why. Adding a transcendental oracle without a
# row here fails CI (tests/test_transcendental_audit.py).
TRANS_CLASS: dict[str, str] = {
    # sigmoid score family: one exp per doc over the shared quality
    # feature table; score round-6'd / compared to 0.5 downstream.
    "doc_auc": "sigmoid-score; certificate proves no doc within 1e-13 of the 0.5 label threshold or a 6dp boundary",
    "doc_best_f1": "sigmoid-score (same score relation as doc_auc)",
    "doc_brier": "sigmoid-score",
    "doc_calibration": "sigmoid-score",
    "doc_classify_score": "sigmoid-score",
    "doc_cum_gains": "sigmoid-score",
    "doc_isotonic": "sigmoid-score",
    "doc_pr_auc": "sigmoid-score",
    "doc_roc_points": "sigmoid-score",
    "doc_threshold_transfer": "sigmoid-score",
    "doc_lr_train": "sigmoid on integer-quantized pre-activation (exact /1000 grid); round-6 margin certified",
    # per-TYPE log family: one transcendental per distinct token/count
    # type, round-6'd then DECIMAL-summed (order-free); bounded input
    # count, margin certified end-to-end.
    "doc_unigram_nll": "per-type round(log10(count-ratio),6) then DECIMAL sum",
    "doc_bigram_nll": "per-type round(log10,6) then DECIMAL sum",
    "doc_kn_nll": "per-type round(log10,6) then DECIMAL sum",
    "doc_bigram_pmi": "per-type round(log2(count-ratio)) on distinct bigram types",
    # doc_char_entropy: converted to exactlog (round 10) after the
    # certificate caught its round-6 log2 within 1e-13 of a boundary
    # — no transcendental remains, it now classifies as clean.
    "doc_quality_pipeline": "per-type log10 branch shared with doc_unigram_nll (char-entropy branch exactlog since r10)",
    "doc_source_js": "per-type round(log10,6) over source distributions",
    "doc_source_kl": "per-type round(log10,6) over source distributions",
    "doc_zipf_slope": "round(log10(rank),6)/round(log10(freq),6) per distinct rank/freq, integer OLS after",
    "events_markov_entropy": "per-type round(log2(transition-ratio),6) then DECIMAL sum",
    "events_hurst": "round(log2,6) per distinct (span,rs) pair, integer OLS after",
    "events_psi": "round(ln(p/q),6) per bucket pair (p,q integer ppm)",
    "orders_hill": "round(log10(v)*1e6) to BIGINT per distinct order value",
    "customer_fs_link": "round(log2(count-product),*) per distinct (nl,nr) block size — Fellegi-Sunter weights",
    # exact power-of-two: pow(2, small int) is exactly representable;
    # CAST to BIGINT restores the integer even under perturbation.
    "events_haar": "pow(2,int) exact; certificate trivially invariant",
    "streamed_haar": "pow(2,int) exact (twin of events_haar)",
    "events_ewma": "power(2,j) bit weights exact; /1e6 round-6 margin certified",
    "parts_croston": "power(2,j) bit weights exact; round-6 margin certified",
    # misc single-transcendental finishes
    "doc_source_mixture": "pow(x,0.5) per source (DuckDB pow vs JVM Math.pow; certificate covers), round-6 weight",
    "doc_weighted_sample": "-ln(md5-uniform) Efraimidis-Spirakis key, round-6 + doc_id tie-break; margin certified",
    "doc_weighted_stratified": "same -ln key as doc_weighted_sample, per-stratum",
    "events_ad_exp": "exp(-u) round-nano per distinct spacing; Anderson-Darling terms via per-type ln",
    "streamed_ad_exp": "twin of events_ad_exp",
    "events_exp_gof": "exp(-v) round-nano per distinct value",
    "streamed_exp_gof": "twin of events_exp_gof",
}

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
SF_DIR = "/root/testdata/sf0.01"
EPS = 1e-13


def load_oracles():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", Path(__file__).resolve().parent.parent / "__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m.oracle_sql()


def classify(oracles: dict[str, str]) -> dict[str, str]:
    out = {}
    for name, sql in oracles.items():
        if TRANS_PAT.search(sql):
            out[name] = "transcendental"
        elif ROUND_PAT.search(sql):
            out[name] = "round-pinned"
        else:
            out[name] = "clean"
    return out


def perturb_sql(sql: str) -> str:
    """Rename every transcendental call to its perturbing macro."""
    return TRANS_PAT.sub(lambda m: f"__p_{m.group(1).lower()}(", sql)


def duck_connect(eps: float | None):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    if eps is not None:
        s = repr(eps)
        con.execute(f"CREATE MACRO __p_log10(x) AS log10(x) * (1 + {s})")
        con.execute(f"CREATE MACRO __p_log2(x) AS log2(x) * (1 + {s})")
        con.execute(f"CREATE MACRO __p_ln(x) AS ln(x) * (1 + {s})")
        con.execute(f"CREATE MACRO __p_exp(x) AS exp(x) * (1 + {s})")
        con.execute(f"CREATE MACRO __p_pow(a, b) AS pow(a, b) * (1 + {s})")
        con.execute(f"CREATE MACRO __p_power(a, b) AS pow(a, b) * (1 + {s})")
    return con


def normalize(df):
    import numpy as np

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: bytes(v) if isinstance(v, (bytearray, memoryview)) else v
            )
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    for c in df.columns:
        if df[c].dtype == np.float64:
            v = df[c].to_numpy().copy()
            v[np.isnan(v)] = np.nan  # canonicalise NaN payloads
            df[c] = v.view(np.uint64)
    return df


def certify(names: list[str], oracles: dict[str, str]) -> dict[str, dict]:
    results = {}
    base_con = duck_connect(None)
    cons = {s: duck_connect(s * EPS) for s in (+1, -1)}
    for name in names:
        sql = oracles[name]
        psql = perturb_sql(sql)
        try:
            base = normalize(base_con.execute(sql).fetchdf())
            ok = True
            detail = []
            for s, con in cons.items():
                pert = normalize(con.execute(psql).fetchdf())
                same = base.equals(pert)
                ok &= same
                if not same:
                    detail.append(f"sign {s:+d}: output changed")
            results[name] = {"pass": ok, "detail": "; ".join(detail)}
        except Exception as e:  # pragma: no cover - surfaced in report
            results[name] = {"pass": False, "detail": f"error: {e}"}
    return results


def signed_zero_scan(oracles: dict[str, str]) -> dict[str, dict]:
    """Per float64 output column: negative zeros present, and the
    smallest |negative| (distance of observed data above the
    round-to-negative-zero trap)."""
    import numpy as np

    con = duck_connect(None)
    out = {}
    for name, sql in oracles.items():
        try:
            df = con.execute(sql).fetchdf()
        except Exception as e:  # pragma: no cover
            out[name] = {"error": str(e)[:120]}
            continue
        cols = {}
        for c in df.columns:
            if df[c].dtype == np.float64:
                v = df[c].to_numpy()
                fin = v[np.isfinite(v)]
                neg = fin[fin < 0]
                nz = bool(((fin == 0) & (np.signbit(fin))).any())
                cols[c] = {
                    "neg_zero": nz,
                    "min_neg_abs": float(np.abs(neg).min()) if neg.size else None,
                }
        if cols:
            out[name] = cols
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--certify", action="store_true", help="run perturbation + signed-zero scans at sf0.01")
    ap.add_argument("--json", type=str, default=None, help="write full results JSON here")
    args = ap.parse_args()

    oracles = load_oracles()
    classes = classify(oracles)
    trans = sorted(k for k, v in classes.items() if v == "transcendental")
    counts = {c: sum(1 for v in classes.values() if v == c) for c in ("clean", "round-pinned", "transcendental")}
    print(f"oracles: {len(oracles)}  {counts}")

    missing = [n for n in trans if n not in TRANS_CLASS]
    stale = [n for n in TRANS_CLASS if n not in oracles]
    misfiled = [n for n in TRANS_CLASS if n in oracles and classes.get(n) != "transcendental"]
    ok = not (missing or stale or misfiled)
    if missing:
        print("UNCLASSIFIED transcendental oracles:", missing)
    if stale:
        print("STALE classification rows:", stale)
    if misfiled:
        print("classified but no transcendental token:", misfiled)

    payload = {"classes": classes, "counts": counts, "trans_class": TRANS_CLASS}
    if args.certify:
        certs = certify(trans, oracles)
        fails = {k: v for k, v in certs.items() if not v["pass"]}
        print(f"perturbation certificates: {len(certs) - len(fails)}/{len(certs)} invariant at ±{EPS:g} relative")
        for k, v in fails.items():
            print(f"  CERT FAIL {k}: {v['detail']}")
        zeros = signed_zero_scan(oracles)
        negz = [(n, c) for n, cols in zeros.items() for c, s in cols.items() if isinstance(s, dict) and s.get("neg_zero")]
        print(f"signed-zero scan: {len(zeros)} oracles with float64 output; -0.0 present in {len(negz)} columns")
        for n, c in negz:
            print(f"  NEG ZERO {n}.{c}")
        payload["certificates"] = certs
        payload["signed_zero"] = zeros
        ok = ok and not fails
    if args.json:
        Path(args.json).write_text(json.dumps(payload, indent=1))
    print("AUDIT", "OK" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
