#!/usr/bin/env python
"""Plan-shape ledger: capture the structural properties of every
registered query's physical plan — the facts a 100 TB scale review
asks about — into PLANS.md.

Per query: exchange count (shuffles), broadcast vs sort-merge joins,
cartesian/nested-loop occurrences, Python UDF evaluation nodes
(Arrow-batched mapInPandas vs row-at-a-time BatchEvalPython),
parquet pushed filters present, and partition-less data windows
(expected only in the documented exact window anchors whose
_scalable twins are the 100 TB path). Everything is derived from the compiled
plan only — no query executes — so the audit runs in seconds and can
be re-generated every round to diff for structural regressions.

Run: python plan_audit.py [sf_dir]  (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from calorista_spark.queries import QUERIES  # noqa: E402
from calorista_spark.session import build_session  # noqa: E402


def audit_plan(plan: str) -> dict[str, object]:
    lines = plan.splitlines()
    # Partition-less window over DATA rows, detected from the
    # windowspecdefinition arguments: partition columns print as raw
    # attribute refs BEFORE the frame, order columns carry ASC/DESC.
    # A spec whose every pre-frame argument is an ordering (or that
    # has none) is a global window. The O(P) offsets window of the
    # two-pass rank (sum over __n / per-pid totals) is global BY
    # DESIGN over O(num_partitions) rows and is excluded.
    global_windows = 0
    for ln in lines:
        if "Window [" not in ln or "sum(__n" in ln:
            continue
        is_global = False
        for m in re.finditer(
            r"windowspecdefinition\((.*?)specifiedwindowframe", ln
        ):
            args = [a.strip() for a in m.group(1).split(",") if a.strip()]
            partition_cols = [
                a for a in args if " ASC" not in a and " DESC" not in a
            ]
            if not partition_cols:
                is_global = True
        if is_global:
            global_windows += 1
    return {
        "exchanges": plan.count("Exchange "),
        "broadcast_joins": plan.count("BroadcastHashJoin")
        + plan.count("BroadcastNestedLoopJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "shuffled_hash_joins": plan.count("ShuffledHashJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "arrow_python": plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas")
        + plan.count("ArrowEvalPython")
        + plan.count("ArrowAggregatePython")
        + plan.count("MapInArrow"),
        "row_python": plan.count("BatchEvalPython"),
        "pushed_filters": "PushedFilters: [" in plan
        and "PushedFilters: []" not in plan,
        "global_windows": global_windows,
    }


# Every query allowed to compile a partition-less window must be
# enumerated here with WHY its frame is bounded (O(small), never
# data-sized). A global window in a query missing from this dict is
# reported as an INVARIANT BREACH in PLANS.md — the enumeration can
# no longer silently lag the count (r6 advice).
GLOBAL_WINDOW_AUDIT: dict[str, str] = {
    "order_price_quartiles": "documented exact anchor; oracle-identical "
    "_scalable twin is the 100 TB path",
    "moving_avg_daily_values": "window over per-DAY aggregates, O(days) rows",
    "cumulative_new_users": "window over per-DAY aggregates, O(days) rows",
    "corpus_vocab_coverage": "window over a limit(100) frame",
    "doc_bm25_search": "window over the TakeOrdered top-k",
    "customer_revenue_pareto": "cumulative share over the 10-row decile frame",
    "events_daily_anomaly_flags": "trailing stats over per-DAY aggregates, "
    "O(days) rows",
    "events_daily_ewma": "2 cumulative sums over per-DAY aggregates, "
    "O(days) rows",
    "events_daily_ewma_longhorizon": "row_number + 4-block Horner carry "
    "lags over per-DAY / per-50-day-block aggregates, O(days) rows",
    "corpus_stratified_sample": "largest-remainder quota ranking over the "
    "|sources|-row allocation frame",
}


# The plan-ledger regression gate (r9 — VERDICT r8 #7): the committed
# plans_baseline.json pins each query's structural plan metrics; the
# pytest gate (tests/test_plans.py::test_plan_ledger_no_regressions)
# fails if any metric silently worsens. Regenerate DELIBERATELY with
#   python plan_audit.py --baseline
# so a structural change shows up as a reviewable diff of the file.
LEDGER_METRICS = ("exch", "bcast", "cart", "rowPy", "globalWin")
# metrics where an INCREASE is a regression; bcast is informational
_WORSE_IF_UP = ("exch", "cart", "rowPy", "globalWin")
BASELINE_SF = "/root/testdata/sf0.001"
BASELINE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "plans_baseline.json"
)


def ledger_row(a: dict) -> dict[str, int]:
    return {
        "exch": a["exchanges"],
        "bcast": a["broadcast_joins"],
        "cart": a["cartesian"],
        "rowPy": a["row_python"],
        "globalWin": a["global_windows"],
    }


def ledger_compare(baseline: dict, current: dict) -> list[str]:
    """Regression report: queries whose gated metrics increased vs the
    committed baseline, plus queries with no baseline entry. Dropped
    queries are ignored (removal shows in the baseline diff itself)."""
    problems = []
    for name, cur in sorted(current.items()):
        base = baseline.get(name)
        if base is None:
            problems.append(
                f"{name}: no baseline entry — run "
                "`python plan_audit.py --baseline` and review the diff"
            )
            continue
        for m in _WORSE_IF_UP:
            if cur[m] > base[m]:
                problems.append(
                    f"{name}: {m} regressed {base[m]} -> {cur[m]}"
                )
    return problems


def compile_ledger(spark, sf_dir: str, names=None) -> dict[str, dict]:
    """Compile every query's plan metrics. MUST start from a clean
    cache state: Spark's CacheManager substitutes InMemoryRelations by
    LOGICAL-PLAN EQUALITY, so a frame some earlier test executed and
    left cached changes this compile's printed exchange count (7 → 9
    on the two-pass rank family — the gate's second phantom-regression
    lesson, r9). Both the baseline generator and the pytest gate go
    through here, so the two sides always compile under the same
    (empty) cache state and the same iteration order."""
    from calorista_spark.cache import release_caches

    release_caches(spark)
    out = {}
    for name in sorted(names or QUERIES):
        plan = (
            QUERIES[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        out[name] = ledger_row(audit_plan(plan))
    return out


def write_baseline() -> None:
    import json

    # MUST mirror tests/conftest.py's session exactly: several plan
    # shapes (the two-pass rank family unions per-slice offsets) scale
    # their exchange count with session parallelism, so a baseline
    # compiled under a different master/partition count than the gate's
    # session reads as a spurious regression (found by the gate itself
    # on its first cross-session run, r9).
    spark = build_session(
        app_name="calorista-plan-baseline",
        master="local[4]",
        shuffle_partitions=8,
    )
    spark.sparkContext.setLogLevel("ERROR")
    ledger = compile_ledger(spark, BASELINE_SF)
    with open(BASELINE_PATH, "w") as fh:
        json.dump(
            {"_meta": {"sf_dir": BASELINE_SF, "n_queries": len(ledger)}}
            | ledger,
            fh,
            indent=1,
            sort_keys=True,
        )
    print(f"wrote {BASELINE_PATH}: {len(ledger)} queries")
    spark.stop()


def main() -> None:
    if "--baseline" in sys.argv[1:]:
        write_baseline()
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session(app_name="calorista-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    failures = []
    for name in sorted(QUERIES):
        try:
            plan = (
                QUERIES[name](spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"{type(exc).__name__}: {exc}"[:200]))
            continue
        rows.append((name, audit_plan(plan)))

    out = [
        "# PLANS — physical-plan shape ledger (auto-generated)",
        "",
        f"Generated by `plan_audit.py` against `{sf_dir}` "
        f"({len(rows)} queries compiled, {len(failures)} failures). "
        "Compilation only — no execution. Columns: shuffle exchange "
        "count; join strategies chosen by Catalyst; cartesian products "
        "(0 expected outside documented exact baselines); "
        "Arrow-batched Python stages (mapInPandas "
        "family) vs row-at-a-time Python (0 expected everywhere); "
        "parquet pushed filters; partition-less data windows "
        "(0 expected — the O(P) rank-offset window is excluded by "
        "construction).",
        "",
        "| query | exch | bcast | smj | shj | cart | arrowPy | rowPy | pushdown | globalWin |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for name, a in rows:
        out.append(
            f"| {name} | {a['exchanges']} | {a['broadcast_joins']} | "
            f"{a['sortmerge_joins']} | {a['shuffled_hash_joins']} | "
            f"{a['cartesian']} | "
            f"{a['arrow_python']} | {a['row_python']} | "
            f"{'y' if a['pushed_filters'] else '-'} | {a['global_windows']} |"
        )
    if failures:
        out += ["", "## Failures", ""]
        out += [f"- {n}: {err}" for n, err in failures]
    totals = {
        "cartesian": sum(a["cartesian"] for _, a in rows),
        "row_python": sum(a["row_python"] for _, a in rows),
        "global_windows": sum(a["global_windows"] for _, a in rows),
    }
    gw_rows = [(n, a["global_windows"]) for n, a in rows if a["global_windows"]]
    unaudited = [n for n, _ in gw_rows if n not in GLOBAL_WINDOW_AUDIT]
    out += [
        "",
        "## Invariant totals",
        "",
        f"- row-at-a-time Python stages: **{totals['row_python']}**",
        f"- partition-less windows: **{totals['global_windows']}** across "
        f"{len(gw_rows)} queries — each enumerated below with why its "
        "frame is bounded (no window sees data-sized input):",
    ]
    out += [
        f"  - {n} ({c}): {GLOBAL_WINDOW_AUDIT[n]}"
        for n, c in gw_rows
        if n in GLOBAL_WINDOW_AUDIT
    ]
    if unaudited:
        out.append(
            "  - **INVARIANT BREACH — global windows with no audit "
            f"entry: {', '.join(unaudited)}** (add to "
            "plan_audit.GLOBAL_WINDOW_AUDIT with a boundedness argument "
            "or remove the window)"
        )
    out += [
        f"- cartesian products: **{totals['cartesian']}** "
        "(documented exact baselines only: brute-force similarity "
        "anchors and region×nation)",
    ]
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "PLANS.md"),
        "w",
    ) as fh:
        fh.write("\n".join(out) + "\n")
    print(
        f"PLANS.md written: {len(rows)} queries, "
        f"totals={totals}, failures={len(failures)}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
