"""Pre-flight plan audit: the SCALE.md discipline as a runtime check.

`tests/test_plans.py` pins the plans of the operators this repo ships;
users composing their OWN queries get the same scrutiny from
``plan_audit(df)`` — a list of (severity, code, detail) findings over
the optimized physical plan, answering "would I want to run this at
100 TB?" BEFORE the cluster bill arrives. Purely static: nothing is
executed.

The checks mirror the repo's own conventions:
- row-at-a-time Python UDFs (BatchEvalPython) are the slow path;
- cartesian products almost never belong in a big-data plan;
- a scan with no pushed/partition filters next to a Filter node means
  pushdown was lost (expression too opaque, or a cast in the way);
- an exchange count far above the operator's shape suggests a missed
  broadcast or a re-partitioning loop;
- single-partition global windows serialize the whole input through
  one task (fine for tiny relations — the audit can't know, so it
  reports, not errors).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

from unitdb_spark.plans.explain import formatted_plan, shuffle_count


@dataclass(frozen=True)
class Finding:
    severity: str  # "warn" | "info"
    code: str
    detail: str


def plan_audit(df: DataFrame, max_shuffles: int = 4) -> list[Finding]:
    """Audit the optimized plan of ``df``; returns findings, possibly
    empty. Never raises on content — the audit is advisory."""
    plan = formatted_plan(df)
    out: list[Finding] = []

    if "BatchEvalPython" in plan:
        out.append(Finding(
            "warn", "python-udf",
            "row-at-a-time Python UDF stage (BatchEvalPython) in the "
            "plan — rewrite with built-in expressions or a pandas UDF",
        ))
    if "CartesianProduct" in plan:
        out.append(Finding(
            "warn", "cartesian",
            "CartesianProduct join — no join keys reached the planner; "
            "broadcast one side explicitly if a cross join is intended",
        ))
    # a deliberate cross join also plans as BNLJ with join type
    # "Cross" on the node line — exempt it (the cartesian check above
    # owes nothing here: Spark only chose BNLJ because a side was
    # explicitly broadcast)
    # only the tree-sketch line carries the join type; the detail
    # header "(6) BroadcastNestedLoopJoin" does not and must not count
    bnlj = [
        line for line in plan.splitlines()
        if re.search(r"BroadcastNestedLoopJoin .*\(\d+\)\s*$", line)
        and " Cross " not in line
    ]
    if bnlj:
        out.append(Finding(
            "info", "nested-loop",
            "BroadcastNestedLoopJoin — non-equi join condition; fine "
            "when one side is tiny, quadratic otherwise",
        ))

    # shuffle_count's regex counts actual shuffle Exchange NODES —
    # plan.count("Exchange") would double-count the detail sections
    # and sweep in Broadcast/ReusedExchange
    n_shuffles = shuffle_count(df)
    if n_shuffles > max_shuffles:
        out.append(Finding(
            "info", "many-shuffles",
            f"{n_shuffles} exchanges (> {max_shuffles}) — check for a "
            "missed broadcast, repeated repartitioning, or a join "
            "re-keying that bucketing would remove",
        ))

    # a Filter sitting directly above a scan whose PushedFilters is
    # empty usually means pushdown was defeated
    scans = re.findall(r"PushedFilters: \[(.*?)\]", plan)
    if scans and all(not s.strip() for s in scans) and "Filter" in plan \
            and "Scan parquet" in plan:
        out.append(Finding(
            "info", "no-pushdown",
            "parquet scan(s) with empty PushedFilters below a Filter — "
            "a cast/expression may be blocking predicate pushdown",
        ))

    # a GLOBAL window is a Window node fed (through its Sort) by an
    # Exchange whose Arguments are SinglePartition — correlate node
    # ids instead of grepping the whole plan (a keyed window plus an
    # unrelated global aggregate would otherwise false-positive)
    sketch = re.findall(r"(\w+) \((\d+)\)", plan)
    args = dict(re.findall(r"\((\d+)\) Exchange[^\n]*\n"
                           r"[^\n]*\nArguments: (\w+)", plan))
    for i, (name, nid) in enumerate(sketch):
        if name != "Window":
            continue
        for name2, nid2 in sketch[i + 1:i + 4]:
            if name2 == "Exchange" and args.get(nid2) == "SinglePartition":
                out.append(Finding(
                    "info", "global-window",
                    "single-partition global window/sort — the whole "
                    "input serializes through one task; fine only for "
                    "tiny relations",
                ))
                break
        else:
            continue
        break
    return out
