"""Compute the next round's driver-window rotation.

The external driver hash-checks only the FIRST 50 `queries()` entries
(observed r01-r04). With the inventory far past 50, declaration order
rotates per round so every query eventually gets a hard CORRECTNESS
row (COVERAGE.md "Driver-window rotation" is the authoritative log).

This script does the set arithmetic: it reads every CORRECTNESS_r*.json
beside the repo root, takes each query's LATEST driver verdict, and
prints the recommended next declaration order — never-checked queries
first (oldest declaration first), then the stalest-checked blocks.
Rotate by reordering the dict literal in `__spark_entry__.queries()`
to match, then update COVERAGE.md's rotation log (the
tests/test_docs_consistency.py guard keeps the counts honest).

Usage: python scripts/rotation_plan.py [--window 50]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    args = ap.parse_args()

    import __spark_entry__ as e

    declared = list(e.queries().keys())

    # latest round each query was driver-checked in (0 = never).
    # A row only counts as "checked" if it PASSED (hash_match true, or
    # the declared-rows-only `no_oracle` path with rows present); a
    # hash-FAIL or errored row must not deprioritize the query — its
    # latest verdict being a failure puts it in the must-re-front
    # class, ahead even of never-checked queries.
    last_round: dict[str, int] = {q: 0 for q in declared}
    failed_latest: dict[str, bool] = {q: False for q in declared}
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", f.name).group(1))
        for q, row in json.load(open(f)).items():
            if q not in last_round:
                continue
            ok = bool(row.get("hash_match")) or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if ok:
                last_round[q] = rnd
                failed_latest[q] = False
            else:
                failed_latest[q] = True

    # stable order: latest-verdict-FAILED first (must re-front), then
    # never-checked (declaration order), then by ascending staleness
    # (oldest hard signal first), declaration order within a class
    order = sorted(
        declared,
        key=lambda q: (
            0 if failed_latest[q] else 1,
            last_round[q],
            declared.index(q),
        ),
    )
    w = args.window
    print(f"# inventory: {len(declared)}; window: first {w}")
    never = [q for q in declared if last_round[q] == 0]
    nfail = sum(failed_latest.values())
    print(f"# never driver-checked: {len(never)} "
          f"(of which latest-verdict-FAILED: {nfail})")
    print(f"# next window would cover {min(w, len(order))} queries, "
          f"of which {sum(1 for q in order[:w] if last_round[q] == 0)} "
          "get their FIRST hard row")
    if not never:
        # backlog-0 regime (reached round 11): with every query
        # carrying a hard row, the window becomes a fixed stalest-
        # green re-check rotation — each round re-proves the 50
        # queries whose last hard row is oldest, so the whole
        # inventory re-certifies every ceil(inventory/window) rounds.
        # New-round additions (last_round == 0) still auto-front.
        import math

        cycle = math.ceil(len(declared) / w)
        print(
            f"# regime: backlog-0 re-check rotation — full-inventory "
            f"re-proof every {cycle} rounds; queries changed since "
            "their last hard row should be fronted manually (the "
            "COVERAGE.md honesty-note convention)"
        )
    for q in order:
        tag = (
            "FAIL!" if failed_latest[q]
            else "never" if last_round[q] == 0
            else f"r{last_round[q]:02d}"
        )
        print(f"{tag}  {q}")


if __name__ == "__main__":
    main()
