"""Dog-food `plans.audit.plan_audit` over every batch driver query.

The audit is the repo's own 100 TB pre-flight check; this test makes
CI eat it so a future operator cannot silently add a row-at-a-time
Python UDF, an unkeyed cartesian product, or a corpus-sized
single-partition window. Policy enforced here:

- severity "warn" findings (python-udf, cartesian) are NEVER allowed;
- "global-window" findings are allowed only for the queries in the
  explicit allowlist below, each justified by the tiny bounded
  relation its window runs over (levels², distinct values, per-key
  totals — never the corpus);
- the allowlist must stay exact: an entry whose query stops reporting
  global-window fails the test, so the list cannot rot;
- the other info codes (nested-loop over a broadcast tiny side,
  many-shuffles in deliberately multi-stage pipelines, no-pushdown)
  stay advisory — they are the audit's user-facing guidance, and
  test_plans pins the load-bearing plans individually.

Streamed twins are audited by a SEPARATE test (round-7 verdict ask
#6): building a twin's DataFrame runs its real checkpointed
streaming fold, after which the RETURNED DataFrame is the read-time
batch plan (fold re-read + finisher) — exactly the plan that runs on
every dashboard refresh at 100 TB, so it gets the same
no-warn/no-unexplained-global-window policy with its own exact
allowlist.
"""

from __future__ import annotations

from collections import defaultdict

from .conftest import SF_SMALL

# every entry = a sanctioned single-partition window over a PROVABLY
# tiny relation (the operator docstrings carry the full argument)
GLOBAL_WINDOW_ALLOWLIST = {
    "doc_vocab_coverage": "cumulative coverage over the ranked vocabulary relation (Zipf-small), not documents",
    "doc_source_balance": "share windows over the per-source totals relation (n_sources rows)",
    "events_chisq": "row/col/grand totals are windows over the levels-squared cells relation",
    "events_cramers_v": "rides chi_square_independence: same levels-squared cell windows",
    "events_mannwhitney": "doubled-midrank cumulative window over the DISTINCT-value relation",
    "events_kruskal": "doubled-midrank cumulative window over the DISTINCT-value relation (the mann_whitney class, k groups)",
    "events_dunn": "rides the kruskal pooled-midrank window: same DISTINCT-value relation, pairs join the k-row group relation",
    "events_cliffs_delta": "rides mann_whitney_u: same doubled-midrank window over the distinct-value relation",
    "events_wilcoxon": "doubled-midrank cumulative window over the distinct-|difference| relation (per-user diffs, not events)",
    "lineitem_spearman": "rank windows over the distinct-value relations of the two variables",
    "orders_benford": "digit-share window over the 9-row leading-digit relation",
    "doc_calibration": "ntile + reliability windows over scores then the 10-row decile relation",
    "doc_auc": "doubled-midrank cumulative window over the DISTINCT quantized-score relation (<= 1e6+1 rows by construction)",
    "doc_cum_gains": "rank-threshold deciles: cumulative window over the DISTINCT floor-micro score relation (<= 1e6+1 rows by construction, the doc_auc class) + the 10-row spine — the corpus-sized ntile is gone (r8)",
    "events_uplift": "rank-threshold deciles: cumulative window over the DISTINCT per-user pre-spend histogram (value space, not users — the mannwhitney class) + the 10-row spine — the corpus-sized ntile is gone (r8)",
    "events_survival": "at-risk cumulative window over the per-day event-time relation",
    "events_logrank": "per-arm at-risk cumulative windows over the pooled per-day relation",
    "events_ks": "CDF-gap cumulative window over the pooled distinct-value relation",
    "orders_lorenz": "cumulative-share window over the per-customer totals relation",
    "doc_source_infogain": "entropy windows over the (source x label) cells relation",
    "doc_token_budget": "water-filling rank window over the per-source totals relation",
    "doc_temperature_mix": "largest-remainder apportionment windows over the per-source totals relation",
    "doc_quantile_map": "global rank sorts documented with the 100 TB swap (pre-computed reference boundaries)",
    "media_dup_modularity": "degree/total windows over the dup-cluster edge relation (near-dup pairs, not docs)",
    "events_pettitt": "doubled-midrank and U_t windows over the series' distinct-value/day relations",
    "parts_abc": "cumulative revenue-share window over the per-part totals relation",
    "parts_skyline": "stage-2 dominance windows over the bucket-local survivor staircase (buckets x distinct sizes), not the catalog",
    "events_forecast_recon": "largest-remainder apportionment windows over the per-key FORECAST relation (keys rows — the temperature_allocation class)",
    "doc_isotonic": "prefix window over the <= 1001-row permille-bin relation (the doc_auc bounded class); the minimax lattice windows are key-partitioned over the bounded pair relation",
    "events_cox": "risk-set x/x2 descending cumulative windows over the per-day event-time relation (the events_survival class)",
    "events_dunn_holm": "rides the dunn midrank window (distinct-value relation) + rank/step windows over the k2-pair relation (control-plane)",
    "events_dunn_bh": "rides the dunn midrank window (distinct-value relation) + rank/step windows over the k2-pair relation (control-plane)",
    "events_km_ci": "at-risk descending cumulative window over the per-day event-time relation (the events_survival class)",
    "events_nelson_aalen": "at-risk + hazard cumulative windows over the per-day event-time relation (the events_survival class)",
    "events_qq_normal": "cumulative window over the DISTINCT-value relation (the MWU class); point selection joins the 19-row literal grid",
    "doc_roc_points": "descending cumulative window over the DISTINCT quantized-score relation (the doc_auc bounded class)",
    "doc_best_f1": "descending cumulative + argmax windows over the DISTINCT quantized-score relation (the doc_auc bounded class)",
    "doc_pr_auc": "descending cumulative window over the DISTINCT quantized-score relation (the doc_auc bounded class)",
    "events_mg_users": "merge rank window over the summed MG summary relation — bounded by k x days (control-plane)",
    "doc_threshold_transfer": "the best-F1 argmax windows over the pick slice's DISTINCT quantized-score relation (the doc_auc bounded class)",
}


def test_plan_audit_every_batch_query(spark):
    import __spark_entry__ as e
    from unitdb_spark.plans.audit import plan_audit

    failures: list[str] = []
    global_window_hits: set[str] = set()
    by_code: defaultdict[str, int] = defaultdict(int)

    for name, fn in e.queries().items():
        if name.startswith("streamed_"):
            continue
        df = fn(spark, SF_SMALL)
        for f in plan_audit(df):
            by_code[f.code] += 1
            if f.severity == "warn":
                failures.append(f"{name}: {f.code} — {f.detail}")
            elif f.code == "global-window":
                global_window_hits.add(name)
                if name not in GLOBAL_WINDOW_ALLOWLIST:
                    failures.append(
                        f"{name}: unexplained single-partition global "
                        "window — justify the bounded relation and "
                        "allowlist it, or re-key the window"
                    )

    stale = set(GLOBAL_WINDOW_ALLOWLIST) - global_window_hits
    assert not failures, "\n".join(failures)
    assert not stale, (
        f"allowlist entries no longer reporting global-window: "
        f"{sorted(stale)} — remove them so the list stays exact"
    )


# twins whose read-time finisher legitimately reports global-window —
# every entry shares a batch query's sanctioned bounded-relation
# window class (the finisher IS the batch operator)
STREAMED_GLOBAL_WINDOW_ALLOWLIST: dict[str, str] = {
    "streamed_tempmix": "doc_temperature_mix's finisher: largest-remainder apportionment windows over the per-source totals relation",
    "streamed_abc": "parts_abc's finisher: cumulative revenue-share window over the per-part totals relation",
    "streamed_benford": "orders_benford's finisher: digit-share window over the 9-row leading-digit relation",
    "streamed_survival": "events_survival's finisher: at-risk cumulative window over the per-day event-time relation",
    "streamed_uplift": "events_uplift's finisher: rank-threshold deciles over the distinct-spend histogram + the 10-row spine",
    "streamed_wilcoxon": "events_wilcoxon's finisher: doubled-midrank window over the distinct-|difference| relation",
}


def test_plan_audit_every_streamed_twin_batch_plan(spark):
    """Audit the read-time BATCH plan of every streamed_* twin (the
    DataFrame the query returns after its checkpointed fold runs):
    no python-udf/cartesian warns, no unexplained single-partition
    window. The fold itself executes as part of building the
    DataFrame — slow but it is the same work the correctness gate
    does, at sf0.001."""
    import __spark_entry__ as e
    from unitdb_spark.plans.audit import plan_audit

    failures: list[str] = []
    hits: set[str] = set()
    for name, fn in e.queries().items():
        if not name.startswith("streamed_"):
            continue
        df = fn(spark, SF_SMALL)
        for f in plan_audit(df):
            if f.severity == "warn":
                failures.append(f"{name}: {f.code} — {f.detail}")
            elif f.code == "global-window":
                hits.add(name)
                if name not in STREAMED_GLOBAL_WINDOW_ALLOWLIST:
                    failures.append(
                        f"{name}: unexplained single-partition global "
                        "window in the read-time fold plan — justify "
                        "the bounded relation and allowlist it"
                    )

    stale = set(STREAMED_GLOBAL_WINDOW_ALLOWLIST) - hits
    assert not failures, "\n".join(failures)
    assert not stale, (
        f"streamed allowlist entries no longer reporting "
        f"global-window: {sorted(stale)} — remove them"
    )
